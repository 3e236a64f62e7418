"""Geometry-pruned ray sampling (cfg.prune_using_geo).

The reference restricts training rays once a geometry extraction exists
(reference tpose_dataset.py:444,512-527 + per-epoch trainer.tmesh refresh,
train_net.py:160-162).  Here: `run.py --type prune` / the train loop write
``result_dir/latest.npy``; the dataset projects the occupied canonical
voxels into each camera and intersects that splat into the sampling pools.
"""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.datasets.sampling import _apply_restrict
from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    return root


@pytest.fixture()
def cfg(fake_root, tmp_path):
    base = default_config().merged(fake_cfg_overrides(fake_root, n_frames=2))
    return base.merged({"prune_using_geo": True,
                        "result_dir": str(tmp_path / "result")})


def _write_cube(cfg, ds, occupied_fn, res=48):
    """latest.npy whose density is 1 where occupied_fn(canonical pts)."""
    tb = ds.tbounds
    axes = [np.linspace(tb[0, d], tb[1, d], res, dtype=np.float32)
            for d in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1)
    cube = occupied_fn(pts).astype(np.float32)
    os.makedirs(cfg.result_dir, exist_ok=True)
    np.save(os.path.join(cfg.result_dir, "latest.npy"), cube)


def test_prune_mask_projects_geometry(cfg):
    ds = TPoseDataset(cfg, "train")
    # occupy only the top half (canonical +y): the projected mask must be
    # a strict, non-empty subset of the full-body projection
    _write_cube(cfg, ds, lambda p: p[..., 1] > ds.tpose[:, 1].mean())
    i = ds._frame_id(0)
    _, _, A, big_A, _, R, Th = ds.prepare_input(i)
    K = np.array(ds.cams["K"][0], np.float64)
    Rc = np.array(ds.cams["R"][0])
    Tc = np.array(ds.cams["T"][0]) / 1000.0
    top = ds._prune_mask(i, A, big_A, R, Th, K, Rc, Tc, 96, 96)
    assert top is not None and top.sum() > 0

    _write_cube(cfg, ds, lambda p: np.ones(p.shape[:-1], bool))
    ds._prune_cache = None  # force reload despite equal mtime resolution
    full = ds._prune_mask(i, A, big_A, R, Th, K, Rc, Tc, 96, 96)
    assert full.sum() > top.sum()
    # the half-body splat stays inside the full-body splat (mod dilation)
    assert (top & ~full).sum() < 0.05 * top.sum()


def test_pruned_sampling_restricts_coords(cfg):
    ds = TPoseDataset(cfg, "train")
    rng = np.random.default_rng(0)
    item_free = ds.get_item(0, rng=np.random.default_rng(0))

    _write_cube(cfg, ds, lambda p: p[..., 1] > ds.tpose[:, 1].mean())
    item_pruned = ds.get_item(0, rng=np.random.default_rng(0))

    assert not np.array_equal(item_free["coord"], item_pruned["coord"])
    # every pruned coord lies inside the dataset's own projected mask
    i = ds._frame_id(0)
    _, _, A, big_A, _, R, Th = ds.prepare_input(i)
    K = np.array(ds.cams["K"][0], np.float64) * cfg.ratio
    K[2, 2] = 1.0
    Rc = np.array(ds.cams["R"][0])
    Tc = np.array(ds.cams["T"][0]) / 1000.0
    H = W = int(96 * cfg.ratio)
    mask = ds._prune_mask(i, A, big_A, R, Th, K, Rc, Tc, H, W)
    c = item_pruned["coord"]
    live = item_pruned["ray_mask"] > 0
    frac = mask[c[live, 0], c[live, 1]].mean()
    assert frac > 0.95, f"only {frac:.2f} of sampled rays inside geometry"


def test_degenerate_restrict_mask_ignored():
    msk = np.zeros((32, 32), np.uint8)
    msk[8:24, 8:24] = 1
    bound = np.zeros((32, 32), np.uint8)
    bound[4:28, 4:28] = 1
    empty = np.zeros((32, 32), np.uint8)  # < 64 px overlap -> ignored
    m2, b2 = _apply_restrict(msk, bound, empty)
    assert (m2 == msk).all() and (b2 == bound).all()

    half = np.zeros((32, 32), np.uint8)
    half[:, :16] = 1
    m3, b3 = _apply_restrict(msk, bound, half)
    assert b3[:, 16:].sum() == 0 and b3[:, :16].sum() > 0
    assert (m3[:, 16:] == 0).all()
