"""Patch-sampling + perceptual-loss training path (use_lpips=True)."""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset

TINY = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=10,
            base_resolution=4, b=1.38)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    exp = str(tmp_path_factory.mktemp("exps"))
    return default_config().merged(fake_cfg_overrides(root, n_frames=2)).merged({
        "partnet": {p: {"embedder": {"kwargs": TINY}} for p in
                    ("body", "leg", "head", "larm", "rarm")},
        "tpose_deformer": {"embedder": {"kwargs": dict(TINY, sum=False)}},
        "network": {"occ": {"d_hidden": 32, "n_layers": 1},
                    "color": {"d_hidden": 32, "n_layers": 2}},
        "N_samples": 8, "N_rand": 128, "patch_size": 32,
        "use_lpips": True, "use_pair_reg": False, "use_reg_distortion": False,
        "ep_iter": 2, "train": {"epoch": 1}, "save_latest_ep": 1,
        "eval_ep": 100, "log_interval": 1,
        "result_dir": os.path.join(exp, "res"),
        "trained_model_dir": os.path.join(exp, "model"),
        "record_dir": os.path.join(exp, "record"),
        "geo_feature_dim": 8, "latent_code_dim": 8, "num_latent_code": 2,
    })


def test_patch_sampling_shapes(cfg):
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
    ds = TPoseDataset(cfg, "train")
    item = ds.get_item(0, rng=np.random.default_rng(0))
    n = cfg.patch_size ** 2
    assert item["ray_o"].shape == (n, 3)
    assert item["rgb"].shape == (n, 3)
    assert item["ray_mask"].shape == (n,)
    assert 0 < item["ray_mask"].sum() <= n


def test_lpips_patch_training_runs(cfg):
    """One epoch through the real loop with the perceptual patch loss."""
    from instant_nvr_tpu.train.loop import train
    state = train(cfg, resume=False)
    assert int(state.step) == 2
    import jax
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_perceptual_loss_behaviour():
    import jax.numpy as jnp
    from instant_nvr_tpu.models.lpips import lpips_distance, perceptual_loss
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    same = float(perceptual_loss(jnp.asarray(img), jnp.asarray(img)))
    assert same < 1e-5
    noisy = np.clip(img + 0.3 * rng.normal(size=img.shape), 0, 1).astype(np.float32)
    diff = float(perceptual_loss(jnp.asarray(img), jnp.asarray(noisy)))
    assert diff > same
    # lpips metric: zero on identical, positive and ordered on corruption
    d0 = float(lpips_distance(jnp.asarray(img), jnp.asarray(img)))
    d1 = float(lpips_distance(jnp.asarray(img), jnp.asarray(noisy)))
    heavy = np.clip(img + 0.8 * rng.normal(size=img.shape), 0, 1).astype(np.float32)
    d2 = float(lpips_distance(jnp.asarray(img), jnp.asarray(heavy)))
    assert d0 < 1e-6 and d0 < d1 < d2
