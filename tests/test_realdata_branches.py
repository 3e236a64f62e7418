"""Real-data code paths that only fire on actual ZJU / MonoCap captures.

These branches (reference ``lib/datasets/h36m/tpose_dataset.py``) were
previously exercised by no fixture — exactly the code that runs first on
real data:
  - CoreView_313/315 filename parsing (frame id = token 4 of the basename,
    1-based; reference :353-355),
  - the ``mask_cihp`` grayscale-mask fallback and the deepcap thresholding
    (reference get_mask :180-209),
  - ``train_with_coord`` precomputed-coordinate sampling (reference
    :398-405, if_nerf_data_utils.py:346-410).
"""
import os
import shutil

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset

N_FRAMES, N_VIEWS, H, W = 2, 2, 64, 64


def _make_root(tmp_path, name="zju"):
    root = str(tmp_path / name)
    write_fake_dataset(root, n_frames=N_FRAMES, n_views=N_VIEWS, H=H, W=W,
                       n_verts=800)
    return root


def _cfg(root, **extra):
    over = fake_cfg_overrides(root, n_frames=N_FRAMES)
    over.update(extra)
    return default_config().merged(over)


def _rename_coreview(root):
    """Rewrite image/schp filenames to the CoreView_313 convention:
    ``CoreView_313_Camera_B<v>_<frame+1 padded>_<timestamp>.png`` — the
    frame id is 1-BASED token 4 of the '_'-split basename."""
    annots_path = os.path.join(root, "annots.npy")
    annots = np.load(annots_path, allow_pickle=True).item()
    for f, d in enumerate(annots["ims"]):
        new_ims = []
        for v, rel in enumerate(d["ims"]):
            base = f"CoreView_313_Camera_B{v}_{f + 1:04d}_2019-08-23.png"
            new_rel = os.path.join(os.path.dirname(rel), base)
            for sub in ("", None):  # images + schp twin
                old = rel if sub == "" else rel.replace("images", "schp")
                new = new_rel if sub == "" else new_rel.replace("images", "schp")
                os.rename(os.path.join(root, old), os.path.join(root, new))
            new_ims.append(new_rel)
        d["ims"] = new_ims
    np.save(annots_path, annots)


def test_coreview_313_filename_parsing(tmp_path):
    root = _make_root(tmp_path)
    _rename_coreview(root)
    cfg = _cfg(root)
    cfg = cfg.merged({"train_dataset": {"human": "CoreView_313"}})
    ds = TPoseDataset(cfg, "train")
    # token 4, 1-based -> frame ids 0..N_FRAMES-1 (which name the
    # smpl_vertices/<i>.npy files the rest of the item loads)
    assert [ds._frame_id(i) for i in range(len(ds))] == list(range(N_FRAMES))
    rng = np.random.default_rng(0)
    item = ds.get_item(0, rng=rng)
    assert int(item["frame_index"]) == 0
    assert item["ray_o"].shape == (cfg.N_rand, 3)
    assert item["occupancy"].mean() > 0.05  # mask decoded from renamed schp


def _schp_to_mask_cihp(root, deepcap_value=None):
    """Replace the schp palette masks with mask_cihp grayscale masks."""
    import cv2
    schp = os.path.join(root, "schp")
    for dirpath, _, files in os.walk(schp):
        for fn in files:
            src = os.path.join(dirpath, fn)
            sem_rgb = cv2.imread(src)[..., ::-1]
            body = (sem_rgb.sum(-1) > 0).astype(np.uint8)
            gray = body * (deepcap_value if deepcap_value else 5)
            rel = os.path.relpath(src, schp)
            dst = os.path.join(root, "mask_cihp", "images", rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            cv2.imwrite(dst, gray)
    shutil.rmtree(schp)


def test_mask_cihp_fallback(tmp_path):
    root = _make_root(tmp_path)
    _schp_to_mask_cihp(root)
    ds = TPoseDataset(_cfg(root), "train")
    msk, orig_msk, sem_masks = ds.get_mask(0)
    assert orig_msk.sum() > 50                 # body decoded from grayscale
    assert set(np.unique(orig_msk)) <= {0, 1}
    assert sem_masks["body"].sum() == orig_msk.sum()   # label 5 == body
    # full item still trains from the fallback masks
    item = ds.get_item(0, rng=np.random.default_rng(0))
    assert item["occupancy"].mean() > 0.05


def test_mask_cihp_deepcap_threshold(tmp_path):
    # 'deepcap' in data_root: labels >125 are body (MonoCap convention)
    root = _make_root(tmp_path, name="deepcap_lan")
    _schp_to_mask_cihp(root, deepcap_value=200)
    low = _make_root(tmp_path, name="deepcap_low")
    _schp_to_mask_cihp(low, deepcap_value=100)  # below threshold: no body
    ds = TPoseDataset(_cfg(root), "train")
    _, orig_msk, _ = ds.get_mask(0)
    assert orig_msk.sum() > 50
    ds_low = TPoseDataset(_cfg(low), "train")
    _, orig_low, _ = ds_low.get_mask(0)
    assert orig_low.sum() == 0


def test_train_with_coord(tmp_path):
    root = _make_root(tmp_path)
    cfg = _cfg(root, train_with_coord=True, N_rand=64)
    ds = TPoseDataset(cfg, "train")

    # precompute per-(frame, view) coordinate sets from the body mask
    coord_dir = os.path.join(root, "train_coord")
    os.makedirs(coord_dir, exist_ok=True)
    ratio = cfg.ratio
    for idx in range(len(ds)):
        f = ds._frame_id(idx)
        v = int(ds.cam_inds[idx])
        msk, _, _ = ds.get_mask(idx)
        import cv2
        h, w = int(msk.shape[0] * ratio), int(msk.shape[1] * ratio)
        msk_r = cv2.resize(msk, (w, h), interpolation=cv2.INTER_NEAREST)
        coord = np.argwhere(msk_r == 1).astype(np.int64)
        np.save(os.path.join(coord_dir, f"frame_{f:04d}_view_{v:04d}.npy"),
                {"coord": coord,
                 "near": np.full(len(coord), 1.0, np.float32),
                 "far": np.full(len(coord), 2.0, np.float32)})

    item = ds.get_item(0, rng=np.random.default_rng(0))
    n = cfg.N_rand
    assert item["ray_o"].shape == (n, 3)
    assert item["near"].shape == (n,)
    # sampled coords are drawn from the precomputed set
    z = np.load(os.path.join(coord_dir, "frame_0000_view_0000.npy"),
                allow_pickle=True).item()
    provided = {tuple(c) for c in z["coord"]}
    got = {tuple(c) for c in item["coord"]}
    assert got <= provided
    # near/far come from the file, not from box intersection
    assert np.allclose(item["near"], 1.0) and np.allclose(item["far"], 2.0)
    # coords sit on the body; occupancy < 1 only because the border-10
    # erode_edge pass marks the rim band of this small 64px subject
    assert item["occupancy"].mean() > 0.2
