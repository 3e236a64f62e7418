"""Eval runner, checkpoint round-trip, and the full CLI training loop."""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset

TINY_EMBED = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=10,
                  base_resolution=4, b=1.38)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    return root


@pytest.fixture(scope="module")
def cfg(fake_root, tmp_path_factory):
    exp = str(tmp_path_factory.mktemp("exps"))
    base = default_config().merged(fake_cfg_overrides(fake_root, n_frames=2))
    return base.merged({
        "partnet": {p: {"embedder": {"kwargs": TINY_EMBED}} for p in
                    ("body", "leg", "head", "larm", "rarm")},
        "tpose_deformer": {"embedder": {"kwargs": dict(TINY_EMBED, sum=False)}},
        "network": {"occ": {"d_hidden": 32, "n_layers": 1},
                    "color": {"d_hidden": 32, "n_layers": 2}},
        "N_samples": 8, "N_rand": 128, "render_chunk": 512,
        "ep_iter": 4, "train": {"epoch": 2}, "save_latest_ep": 1,
        "eval_ep": 100, "log_interval": 2,
        "use_lpips": False, "use_pair_reg": False, "use_reg_distortion": False,
        "result_dir": os.path.join(exp, "res"),
        "trained_model_dir": os.path.join(exp, "model"),
        "record_dir": os.path.join(exp, "record"),
        "geo_feature_dim": 8, "latent_code_dim": 8, "num_latent_code": 2,
    })


def test_train_loop_and_resume(cfg):
    from instant_nvr_tpu.train.loop import train
    state = train(cfg, resume=False)
    assert int(state.step) == 8  # 2 epochs x 4 iters
    assert os.path.isdir(os.path.join(cfg.trained_model_dir, "latest"))
    # config snapshot dumped at train start (reference train_net.py:80-82)
    snap = os.path.join(cfg.result_dir, "config.yaml")
    assert os.path.exists(snap)
    import yaml
    loaded = yaml.safe_load(open(snap))
    assert loaded["ep_iter"] == 4 and loaded["N_rand"] == 128
    # resume: epochs already done -> returns immediately with restored state
    state2 = train(cfg, resume=True)
    assert int(state2.step) == 8


def test_train_profile_window(cfg, tmp_path):
    """profile_window=(1, 3) traces only that step window into record_dir."""
    from instant_nvr_tpu.train.loop import train
    pcfg = cfg.merged({"record_dir": str(tmp_path / "record"),
                       "trained_model_dir": str(tmp_path / "model"),
                       "result_dir": str(tmp_path / "res"),
                       "train": {"epoch": 1}})
    train(pcfg, resume=False, profile_window=(1, 3))
    pdir = os.path.join(pcfg.record_dir, "profile")
    assert os.path.isdir(pdir)
    traced = [f for _, _, fs in os.walk(pdir) for f in fs]
    assert traced, "no trace files captured"


def test_evaluate_dataset(cfg):
    import jax
    from instant_nvr_tpu.eval.runner import evaluate_dataset
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.renderer.inb_renderer import make_render_spec

    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(0), mspec)
    ret = evaluate_dataset(cfg.replace(eval=True), mspec,
                           make_render_spec(cfg), params, split="test",
                           max_items=1, save_images=False)
    assert np.isfinite(ret["psnr"])
    assert 0.0 <= ret["ssim"] <= 1.0
    # metrics.npy written with the reference layout
    m = np.load(os.path.join(cfg.result_dir, "metrics.npy"),
                allow_pickle=True).item()
    assert set(m) == {"mse", "psnr", "ssim", "lpips"}


def test_checkpoint_roundtrip(cfg, tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.train.checkpoint import (load_checkpoint,
                                                  load_weights,
                                                  save_checkpoint)
    from instant_nvr_tpu.train.state import TrainState

    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(7), mspec)
    opt = optax.adam(1e-3)
    state = TrainState(jnp.asarray(42, jnp.int32), params, opt.init(params))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, epoch=3, state=state, recorder_state={"step": 42, "epoch": 3})

    template = TrainState(jnp.zeros((), jnp.int32),
                          inb.init_params(jax.random.key(0), mspec),
                          opt.init(params))
    restored, meta = load_checkpoint(d, template)
    assert int(restored.step) == 42
    assert meta["epoch"] == 3
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    w = load_weights(d, template.params)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(w)[0]),
                                  np.asarray(a[0]))


def test_mesh_extraction(cfg):
    import jax
    from instant_nvr_tpu.eval.mesh import extract_mesh, marching_tetrahedra
    from instant_nvr_tpu.models import inb

    # marching tetrahedra on an analytic sphere: correct radius & closed-ish
    g = 24
    ax = np.linspace(-1, 1, g)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 1.0 - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)  # inside>0 at r<1
    verts, faces = marching_tetrahedra(field, 0.5)  # iso at r=0.5
    assert len(verts) > 100
    r = np.linalg.norm((verts / (g - 1) * 2 - 1), axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.05)

    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(0), mspec)
    out = os.path.join(cfg.result_dir, "tmesh")
    extract_mesh(cfg, mspec, params, out, deformed=False, res=24)
    assert os.path.exists(os.path.join(out, "latest.npy"))
