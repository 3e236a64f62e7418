"""Data layer: fake on-disk ZJU dataset -> loader -> trainable batch."""
import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.datasets.samplers import (FrameSampler,
                                               IterationBasedSampler,
                                               shard_indices)
from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset, erode_edge_mask, schp_palette


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    return root


@pytest.fixture(scope="module")
def cfg(fake_root):
    return default_config().merged(fake_cfg_overrides(fake_root, n_frames=2))


def test_train_item_contract(cfg):
    ds = TPoseDataset(cfg, "train")
    assert len(ds) == 2  # 2 frames x 1 training view
    rng = np.random.default_rng(0)
    item = ds.get_item(0, rng=rng)
    N = cfg.N_rand
    assert item["ray_o"].shape == (N, 3)
    assert item["rgb"].shape == (N, 3)
    assert item["near"].shape == (N,)
    assert (item["far"] > item["near"]).all()
    assert item["A"].shape == (24, 4, 4)
    assert item["pbw"].shape[-1] == 25
    assert item["part_pts"].shape[0] == 5
    assert item["part_bounds"].shape == (5, 2, 3)
    assert item["tuv"].ndim == 4
    # occupancy is binary and correlates with the sphere mask
    assert set(np.unique(item["occupancy"])) <= {0.0, 1.0}
    assert item["occupancy"].mean() > 0.1  # body-weighted sampling hits the sphere


def test_test_item_full_rays(cfg):
    ds = TPoseDataset(cfg, "test")
    item = ds.get_item(0)
    # eval: all rays within the box, mask_at_box consistent
    assert item["ray_o"].shape[0] == item["mask_at_box"].sum()
    assert item["coord"].shape[0] == item["ray_o"].shape[0]


def test_item_feeds_model(cfg):
    """A real loader batch must run through the fused train step."""
    import jax
    import jax.numpy as jnp
    import optax

    from instant_nvr_tpu.renderer.inb_renderer import RenderSpec
    from instant_nvr_tpu.train.state import TrainState
    from instant_nvr_tpu.train.step import LossWeights, make_train_step
    from instant_nvr_tpu.models import inb
    from test_model import tiny_spec

    ds = TPoseDataset(cfg, "train")
    item = ds.get_item(0, rng=np.random.default_rng(0))
    # shrink the ray count for test speed
    for k in ("ray_o", "ray_d", "near", "far", "rgb", "occupancy", "ray_mask"):
        item[k] = item[k][:128]
    drop = ("coord", "mask_at_box", "sem_mask", "H", "W", "frame_index", "cam_ind")
    batch = {k: jnp.asarray(v) for k, v in item.items() if k not in drop}
    batch["reg_dist_weight"] = jnp.float32(0.1)

    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    opt = optax.adam(1e-3, eps=1e-15)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
    step = jax.jit(make_train_step(
        spec, RenderSpec(n_samples=8, pair_budget=128),
        LossWeights(), opt))
    state, stats = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(stats["loss"]))


def test_frame_sampler():
    s = FrameSampler(n_items=60, num_cams=3, interval=5)
    inds = list(s)
    assert inds[:3] == [0, 1, 2]
    assert inds[3:6] == [15, 16, 17]


def test_iteration_sampler_deterministic():
    s = IterationBasedSampler(n_items=7, num_iters=20, seed=3)
    a = s.epoch(0)
    b = s.epoch(0)
    assert a == b and len(a) == 20
    assert s.epoch(1) != a


def test_shard_indices():
    inds = list(range(10))
    shards = [shard_indices(inds, r, 4) for r in range(4)]
    assert all(len(s) == 3 for s in shards)
    covered = set(sum(shards, []))
    assert covered == set(inds)


def test_erode_edge_labels():
    msk = np.zeros((32, 32), np.uint8)
    msk[8:24, 8:24] = 1
    out = erode_edge_mask(msk, border=5)
    assert (out == 100).sum() > 0
    assert (out[14:18, 14:18] == 1).all()  # interior intact


def test_schp_palette_shape():
    pal = schp_palette(20)
    assert pal.shape == (20, 3)
    assert (pal[0] == 0).all()


def test_novel_pose_split(cfg):
    """test_novel_pose evaluates unseen frames with the last trained latent
    (reference tpose_dataset.py:60-66,495-496)."""
    ncfg = cfg.merged({"test_novel_pose": True, "num_train_frame": 1,
                       "num_eval_frame": 1})
    ds_train = TPoseDataset(cfg.merged({"num_train_frame": 1}), "test")
    ds_novel = TPoseDataset(ncfg, "test")
    # the novel split starts after the training frames
    assert ds_novel._frame_id(0) == ds_train._frame_id(0) + 1
    item = ds_novel.get_item(0)
    assert int(item["latent_index"]) == 0  # clamped to last trained code


def test_img_cache_lru_eviction(cfg):
    """Byte-budgeted LRU: stale-ratio entries age out instead of pinning
    the cache (the old insert-only cap left stage-0 ratio entries resident
    forever — round-4 rehearsal data waits).  Ratios chosen to resize to
    the same H,W so every entry has the same byte size."""
    ds = TPoseDataset(cfg, "train")
    rng = np.random.default_rng(0)
    ds.get_item(0, ratio=0.5, rng=rng)
    one = ds._img_cache_bytes
    assert one > 0
    # budget for ~2 same-size entries
    ds.cache_bytes = int(2.5 * one)
    ds.get_item(1, ratio=0.5, rng=rng)
    ds.get_item(0, ratio=0.51, rng=rng)     # 3rd entry -> evicts oldest
    keys = list(ds._img_cache.keys())
    assert (0, 0.5) not in keys             # LRU victim
    assert (1, 0.5) in keys and (0, 0.51) in keys
    assert ds._img_cache_bytes <= ds.cache_bytes
    # hits refresh recency: touch (1, 0.5) then insert -> (0, 0.51) evicted
    ds.get_item(1, ratio=0.5, rng=rng)
    ds.get_item(1, ratio=0.52, rng=rng)
    keys = list(ds._img_cache.keys())
    assert (1, 0.5) in keys and (0, 0.51) not in keys
    # an entry bigger than the whole budget is skipped, not inserted
    ds.get_item(0, ratio=1.0, rng=rng)
    assert (0, 1.0) not in ds._img_cache
    assert ds._img_cache_bytes <= ds.cache_bytes
    # cached item replays identically to a cold decode
    rng_a, rng_b = np.random.default_rng(7), np.random.default_rng(7)
    a = ds.get_item(1, ratio=0.5, rng=rng_a)
    ds._img_cache.clear(); ds._img_cache_bytes = 0
    b = ds.get_item(1, ratio=0.5, rng=rng_b)
    np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-7)
