"""Write a miniature ZJU-MoCap-format dataset to disk (for tests/smoke runs).

Fabricates the exact on-disk contract the loader consumes (annots.npy,
images + schp masks, per-frame SMPL vertices/params, lbs/ tree, smpl-meta)
from the analytic sphere scene — so the full data pipeline and training loop
can be exercised end-to-end without the real dataset.
"""
from __future__ import annotations

import os

import numpy as np

from .synthetic import _fibonacci_sphere, _sphere_color, _textured_color
from .tpose_dataset import schp_palette

NUM_BONES = 24


def write_fake_dataset(root: str, n_frames: int = 2, n_views: int = 2,
                       n_verts: int = 2000, H: int = 128, W: int = 128,
                       radius: float = 0.3, seed: int = 0,
                       supersample: int = 4, texture: bool = True,
                       grid: int = 16) -> dict:
    """Fabricate a miniature ZJU-layout dataset around an analytic sphere.

    n_verts must keep the vertex spacing well under ``smpl_thresh`` (0.05):
    the model's per-part point flag is a VERTEX distance while the cull is
    a smooth surface-distance volume, so a cloud coarser than the threshold
    (the old 300-vert default: 0.058 spacing) leaves ring-shaped bands of
    surviving samples that no part claims — black seams in every render.
    Real SMPL is 6,890 verts (~7 mm spacing); 2,000 on a 0.3 m sphere gives
    0.024 m spacing, comfortably under threshold.

    ``supersample``: GT is rendered at supersample^2 rays/pixel and box-
    filtered — the round-2 held-out ceiling was the 1-sample hard silhouette
    (every view disagreed about the rim by up to a full pixel of color; a
    volume renderer can never match inconsistent rims).  Masks threshold
    the supersampled coverage at 0.5.  ``texture``: paint the body with
    mid-frequency procedural texture instead of the flat normal-color.
    """
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    smpl_meta = os.path.join(root, "smpl-meta")
    lbs = os.path.join(root, "smpl_lbs")
    for d in ("images", "schp", "smpl_vertices", "smpl_params",
              os.path.join("smpl_lbs", "bweights")):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    os.makedirs(smpl_meta, exist_ok=True)

    verts0 = _fibonacci_sphere(n_verts, radius)

    # SMPL meta: weights, parents, faces, joints
    t = (verts0[:, 1] / radius + 1) / 2
    weights = np.zeros((n_verts, NUM_BONES), np.float32)
    bone = np.clip((t * 6).astype(int), 0, 5)
    weights[np.arange(n_verts), bone] = 0.7
    weights[np.arange(n_verts), (bone + 1) % NUM_BONES] = 0.3
    np.save(os.path.join(smpl_meta, "weights.npy"), weights)
    parents = np.concatenate([[0], np.arange(NUM_BONES - 1)]).astype(np.int64)
    np.save(os.path.join(smpl_meta, "parents.npy"), parents)
    np.save(os.path.join(smpl_meta, "faces.npy"),
            rng.integers(0, n_verts, (2 * n_verts, 3)).astype(np.int64))
    joints = rng.normal(size=(NUM_BONES, 3)).astype(np.float32) * 0.1
    np.save(os.path.join(lbs, "joints.npy"), joints)
    np.save(os.path.join(lbs, "parents.npy"), parents)

    # canonical (bigpose) data over tbounds: bigpose_bw is a VOLUME with the
    # 24 bone weights + distance-to-surface channel (real-dataset contract)
    np.save(os.path.join(lbs, "bigpose_vertices.npy"), verts0)
    # ``grid``: bw/uv volume resolution per axis — raise toward real-SMPL
    # volume sizes to stress the pbw device LRU at reference scale
    g = int(grid)
    bounds = np.stack([verts0.min(0) - 0.05, verts0.max(0) + 0.05])
    axes0 = [np.linspace(bounds[0, d], bounds[1, d], g) for d in range(3)]
    g0 = np.meshgrid(*axes0, indexing="ij")
    gpts0 = np.stack(g0, -1).reshape(-1, 3)
    tvol = np.zeros((g, g, g, NUM_BONES + 1), np.float32)
    tvol[..., 0] = 1.0
    tvol[..., -1] = np.abs(np.linalg.norm(gpts0, axis=-1) - radius) \
        .reshape(g, g, g)
    np.save(os.path.join(lbs, "bigpose_bw.npy"), tvol)
    uvvol = rng.uniform(0, 1, (g, g, g, 2)).astype(np.float32)
    np.save(os.path.join(root, "bigpose_uv.npy"), uvvol)

    # cameras: ring around the sphere
    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(n_views):
        ang = 2 * np.pi * v / n_views
        Rc, _ = cv2.Rodrigues(np.array([0.0, ang, 0.0]))
        # camera center at distance 1.5 looking at origin
        C = Rc.T @ np.array([0, 0, -1.5])
        T = -Rc @ C
        cams["K"].append(np.array([[2 * W, 0, W / 2], [0, 2 * H, H / 2], [0, 0, 1]], np.float64))
        cams["D"].append(np.zeros((5, 1)))
        cams["R"].append(Rc)
        cams["T"].append(T.reshape(3, 1) * 1000.0)  # annots store mm

    pal = schp_palette(20)
    ims = []
    for f in range(n_frames):
        # the "person" rotates per frame (like a turning human): canonical
        # (pose-space) geometry/colors stay fixed while world rotates —
        # this is what makes single/few-camera training well-posed, exactly
        # as in real ZJU captures, and exercises the world->pose transform.
        # Translation is a BOUNDED orbit (a linear drift walked the body out
        # of every camera's frustum beyond ~35 frames — real captures keep
        # the subject in view for all ~100 frames)
        Th = np.array([0.15 * np.sin(0.4 * f),
                       0.05 * np.sin(0.23 * f),
                       0.15 * np.cos(0.4 * f) - 0.15],
                      np.float32).reshape(1, 3)
        Rh = np.array([[0.0, 0.9 * f, 0.0]], np.float32)
        Rw, _ = cv2.Rodrigues(Rh.astype(np.float64))
        wxyz = (verts0 @ Rw.T.astype(np.float32)) + Th
        np.save(os.path.join(root, "smpl_vertices", f"{f}.npy"), wxyz)
        np.save(os.path.join(root, "smpl_params", f"{f}.npy"),
                {"Rh": Rh.ravel(), "Th": Th.astype(np.float32),
                 "poses": np.zeros((1, NUM_BONES * 3), np.float32)})

        # per-frame bw volume with distance channel
        pb = np.stack([wxyz.min(0) - Th[0] - 0.05, wxyz.max(0) - Th[0] + 0.05])
        axes = [np.linspace(pb[0, d], pb[1, d], g) for d in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        gpts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        dist = np.abs(np.linalg.norm(gpts, axis=-1) - radius)
        vol = np.zeros((g, g, g, NUM_BONES + 1), np.float32)
        vol[..., 0] = 1.0
        vol[..., -1] = dist.reshape(g, g, g)
        np.save(os.path.join(lbs, "bweights", f"{f}.npy"), vol)

        frame_ims = []
        for v in range(n_views):
            K, Rc, Tc = cams["K"][v], cams["R"][v], cams["T"][v] / 1000.0
            from ..ops.ray import get_rays_np
            ss = max(1, int(supersample))
            Khi = K.copy()
            Khi[:2] *= ss            # fx, fy, cx, cy scale with resolution
            # integer-pixel ray convention (get_rays_np: arange, no +0.5):
            # low-res pixel J box-filters high-res pixels ss*J..ss*J+ss-1,
            # whose mean coordinate is ss*J + (ss-1)/2 — shift the high-res
            # principal point so that mean lands exactly on ray J (otherwise
            # every view's GT is warped 0.5*(ss-1)/ss px off its rays)
            Khi[:2, 2] += (ss - 1) / 2.0
            ro, rd = get_rays_np(H * ss, W * ss, Khi, Rc, Tc)
            ro = ro.reshape(-1, 3) - Th  # sphere centered at Th in world
            rd = rd.reshape(-1, 3)
            b = np.sum(ro * rd, -1)
            c = np.sum(ro * ro, -1) - radius * radius
            disc = b * b - c
            hit = disc > 0
            t_hit = -b - np.sqrt(np.maximum(disc, 0))
            pts = ro + rd * t_hit[:, None]
            img = np.zeros((H * ss * W * ss, 3), np.float32)
            # color is painted on the BODY: canonical (pose-space) position
            color_fn = _textured_color if texture else _sphere_color
            img[hit] = color_fn(pts[hit] @ Rw.astype(np.float32))
            # box-filter down: anti-aliased rim (partial coverage composites
            # over the black background exactly like the volume renderer)
            img = img.reshape(H, ss, W, ss, 3).mean((1, 3))
            cover = hit.reshape(H, ss, W, ss).mean((1, 3))
            img = (img * 255).round().astype(np.uint8)

            # lossless: JPEG ringing at the synthetic hard silhouette gave
            # every view mutually-inconsistent rim supervision
            rel = f"images/Cam{v}/{f:04d}.png"
            os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
            cv2.imwrite(os.path.join(root, rel), img[..., ::-1])
            # schp mask: body label (5) where pixel coverage exceeds half
            sem = np.zeros((H, W), np.uint8)
            sem[cover > 0.5] = 5
            sem_rgb = pal[sem]
            mrel = rel.replace("images", "schp")[:-4] + ".png"
            os.makedirs(os.path.dirname(os.path.join(root, mrel)), exist_ok=True)
            cv2.imwrite(os.path.join(root, mrel), sem_rgb[..., ::-1])
            frame_ims.append(rel)
        ims.append({"ims": frame_ims})

    np.save(os.path.join(root, "annots.npy"), {"cams": cams, "ims": ims})
    return {"root": root, "n_frames": n_frames, "n_views": n_views}


def fake_cfg_overrides(root: str, n_frames: int = 2) -> dict:
    return {
        "train_dataset": {"data_root": root, "human": "fake",
                          "ann_file": os.path.join(root, "annots.npy"),
                          "split": "train"},
        "test_dataset": {"data_root": root, "human": "fake",
                         "ann_file": os.path.join(root, "annots.npy"),
                         "split": "test"},
        "val_dataset": {"data_root": root, "human": "fake",
                        "ann_file": os.path.join(root, "annots.npy"),
                        "split": "val"},
        "smpl_meta": os.path.join(root, "smpl-meta"),
        "num_train_frame": n_frames,
        "frame_interval": 1,
        "training_view": [0],
        "test_view": [1],
        "ratio": 0.5,
        "eval_ratio": 0.5,
    }
