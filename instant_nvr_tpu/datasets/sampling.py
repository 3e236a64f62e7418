"""Host-side ray sampling strategies (numpy).

Rebuilds the four strategies of the reference data layer with fixed output
shapes (the TPU contract):

  - :func:`sample_rays_train` — body/face-weighted sampling
    (``if_nerf_data_utils.sample_ray_h36m:228-310``), bounded-round
    resampling + truncation instead of an unbounded while loop.
  - :func:`sample_rays_mse` — error-map-guided
    (``sample_ray_h36m_mse:146-225``).
  - :func:`sample_patch` — fixed patch crop for the LPIPS/SSIM/etc. losses
    (``crop_image_msk`` + ``random_crop_image``, 611-686).
  - :func:`sample_rays_full` — every pixel whose ray hits the world bbox
    (eval path, ``sample_ray_h36m`` else-branch).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..ops.ray import get_near_far_np, get_rays_np
from ..utils import native


def _bound_2d_mask(bounds, K, R, T, H, W) -> np.ndarray:
    """Projected-bbox pixel mask (if_nerf_data_utils.get_bound_2d_mask:78-89)."""
    import cv2
    lo, hi = bounds
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    cam = corners @ R.T + T.ravel()
    uv = cam @ K.T
    uv = np.round(uv[:, :2] / uv[:, 2:]).astype(int)
    mask = np.zeros((H, W), np.uint8)
    # corner order: index bit pattern (x,y,z); faces of the box
    faces = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]
    for f in faces:
        cv2.fillPoly(mask, [uv[list(f)]], 1)
    return mask


def _weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng):
    """numpy weighted pixel draw (also the fallback for native.sample_pixels)."""
    picks = []
    body = np.argwhere(msk == 1)
    if n_body and len(body):
        picks.append(body[rng.integers(0, len(body), n_body)])
    face = np.argwhere(msk == 13)
    if n_face and len(face):
        picks.append(face[rng.integers(0, len(face), n_face)])
    box = np.argwhere(bound_mask == 1)
    n_rand = n_rand + (n_face if not len(face) else 0) + (n_body if not len(body) else 0)
    if n_rand and len(box):
        picks.append(box[rng.integers(0, len(box), n_rand)])
    return np.concatenate(picks, axis=0)


def weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng):
    """Weighted pixel draw; native (GIL-free C++) when available.

    Streams differ from the numpy path (mt19937 vs PCG64) but the
    distribution is identical — the parity contract for sampling
    (SURVEY.md §7.3 randomness parity).
    """
    if native.available():
        seed = int(rng.integers(0, 2 ** 63 - 1))
        return native.sample_pixels(msk, bound_mask, n_body, n_face, n_rand,
                                    seed)
    return _weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng)


def _finalize(img, K, R, T, coords, bounds, nrays, rng, bound_mask):
    """Resample until nrays box-hitting rays are collected, then truncate.

    Rays are generated only for the sampled coords (native ``ray_dirs`` /
    O(n) numpy) — never as a full H x W grid.
    """
    out_o, out_d, out_rgb, out_near, out_far, out_coord = [], [], [], [], [], []
    total = 0
    for _round in range(8):
        o, d = native.ray_dirs(K, R, T, coords)
        rgb = img[coords[:, 0], coords[:, 1]]
        near, far, hit = native.near_far(bounds, o, d)
        out_o.append(o[hit]); out_d.append(d[hit]); out_rgb.append(rgb[hit])
        out_near.append(near); out_far.append(far); out_coord.append(coords[hit])
        total += hit.sum()
        if total >= nrays:
            break
        box = np.argwhere(bound_mask == 1)
        coords = box[rng.integers(0, len(box), nrays - total)]
    cat = lambda xs: np.concatenate(xs, axis=0)[:nrays]
    o, d, rgb = cat(out_o), cat(out_d), cat(out_rgb)
    near, far, coord = cat(out_near), cat(out_far), cat(out_coord)
    n = len(o)
    if n < nrays:  # degenerate masks: pad by repetition, mask the pads out
        reps = np.resize(np.arange(n), nrays - n)
        pad = lambda x: np.concatenate([x, x[reps]], axis=0)
        mask = np.concatenate([np.ones(n, np.float32), np.zeros(nrays - n, np.float32)])
        o, d, rgb, near, far, coord = map(pad, (o, d, rgb, near, far, coord))
    else:
        mask = np.ones(nrays, np.float32)
    return {"ray_o": o.astype(np.float32), "ray_d": d.astype(np.float32),
            "rgb": rgb.astype(np.float32), "near": near.astype(np.float32),
            "far": far.astype(np.float32), "coord": coord,
            "mask_at_box": np.ones(nrays, bool), "ray_mask": mask}


def _apply_restrict(msk, bound_mask, restrict_mask):
    """Intersect a geometry-pruning pixel mask into the sampling pools.

    Implements the consumption side of ``cfg.prune_using_geo``
    (reference tpose_dataset.py:444,512-527): rays are only drawn where the
    previously-extracted geometry projects.  A degenerate restrict mask
    (< 64 px overlap with the bbox pool) is ignored — better to sample the
    full bbox than to starve the batch.
    """
    if restrict_mask is None:
        return msk, bound_mask
    inside = (bound_mask == 1) & (restrict_mask > 0)
    if inside.sum() < 64:
        return msk, bound_mask
    bound_mask = np.where(inside, bound_mask, 0)
    msk = np.where(restrict_mask > 0, msk, 0)
    return msk, bound_mask


def sample_rays_train(img, msk, K, R, T, bounds, nrays, body_ratio, face_ratio,
                      rng, restrict_mask=None) -> Dict[str, np.ndarray]:
    H, W = img.shape[:2]
    bound_mask = _bound_2d_mask(bounds, K, R, T, H, W)
    img = img.copy()
    img[bound_mask != 1] = 0
    msk = msk * bound_mask
    bound_mask = bound_mask.copy()
    bound_mask[msk == 100] = 0
    msk, bound_mask = _apply_restrict(msk, bound_mask, restrict_mask)

    n_body = int(nrays * body_ratio)
    n_face = int(nrays * face_ratio)
    n_rand = nrays - n_body - n_face
    coords = weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng)
    return _finalize(img, K, R, T, coords, bounds, nrays, rng, bound_mask)


def sample_rays_mse(img, msk, error_map, K, R, T, bounds, nrays, mse_portion,
                    body_ratio, face_ratio, rng,
                    restrict_mask=None) -> Dict[str, np.ndarray]:
    """Error-guided: top-20% error pixels get mse_portion of the rays."""
    H, W = img.shape[:2]
    bound_mask = _bound_2d_mask(bounds, K, R, T, H, W)
    img = img.copy()
    img[bound_mask != 1] = 0
    msk = msk * bound_mask
    bound_mask = bound_mask.copy()
    bound_mask[msk == 100] = 0
    msk, bound_mask = _apply_restrict(msk, bound_mask, restrict_mask)

    nz = error_map[(error_map > 0) & (msk == 1)]
    if len(nz):
        k = max(int(len(nz) * 0.2), 1)
        thresh = np.partition(nz, -k)[-k]
        err_msk = (error_map >= thresh) & (msk == 1)
    else:
        err_msk = np.zeros_like(msk, bool)

    n_err = int(nrays * mse_portion)
    n_body = int(nrays * (1 - mse_portion) * body_ratio)
    n_face = int(nrays * (1 - mse_portion) * face_ratio)
    n_rand = nrays - n_err - n_body - n_face
    picks = []
    err_coords = np.argwhere(err_msk)
    if n_err and len(err_coords):
        picks.append(err_coords[rng.integers(0, len(err_coords), n_err)])
    else:
        n_rand += n_err
    picks.append(weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng))
    coords = np.concatenate(picks, axis=0)
    return _finalize(img, K, R, T, coords, bounds, nrays, rng, bound_mask)


def sample_coord(img, msk, train_coord, K, R, T, bounds, nrays,
                 rng) -> Dict[str, np.ndarray]:
    """Sample from a precomputed per-(frame, view) coordinate set.

    ``train_coord`` = {'coord': (M, 2), 'near': (M,), 'far': (M,)}
    (reference ``sample_coord``, if_nerf_data_utils.py:346-410): draw until
    nrays coords survive the erosion-label filter, truncate to nrays.
    """
    H, W = img.shape[:2]
    bound_mask = _bound_2d_mask(bounds, K, R, T, H, W)
    img = img.copy()
    img[bound_mask != 1] = 0
    msk = msk * bound_mask

    M = len(train_coord["coord"])
    picks, nears, fars = [], [], []
    total = 0
    for _ in range(8):
        want = nrays - total
        if want <= 0:
            break
        inds = rng.integers(0, M, want)
        coord = train_coord["coord"][inds]
        keep = msk[coord[:, 0], coord[:, 1]] != 100
        picks.append(coord[keep])
        nears.append(train_coord["near"][inds][keep])
        fars.append(train_coord["far"][inds][keep])
        total += keep.sum()
    coord = np.concatenate(picks)[:nrays]
    near = np.concatenate(nears)[:nrays].astype(np.float32)
    far = np.concatenate(fars)[:nrays].astype(np.float32)
    n = len(coord)
    mask = np.ones(nrays, np.float32)
    if n < nrays:
        reps = np.resize(np.arange(max(n, 1)), nrays - n)
        coord = np.concatenate([coord, coord[reps]])
        near = np.concatenate([near, near[reps]])
        far = np.concatenate([far, far[reps]])
        mask[n:] = 0.0
    o, d = native.ray_dirs(K, R, T, coord)
    return {"ray_o": o, "ray_d": d,
            "rgb": img[coord[:, 0], coord[:, 1]].astype(np.float32),
            "near": near, "far": far, "coord": coord,
            "mask_at_box": np.ones(nrays, bool), "ray_mask": mask}


def sample_rays_full(img, K, R, T, bounds) -> Dict[str, np.ndarray]:
    """All pixels whose ray hits the bbox (eval; variable count, caller pads).

    Stays on the vectorized numpy near/far: at H*W (~1M) rays the SIMD
    batch beats the native library's scalar loop; the native path wins on
    the small per-step training draws (see _finalize).
    """
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3).astype(np.float32)
    ray_d = ray_d.reshape(-1, 3).astype(np.float32)
    near, far, hit = get_near_far_np(bounds, ray_o, ray_d)
    coord = np.argwhere(hit.reshape(H, W))
    return {"ray_o": ray_o[hit], "ray_d": ray_d[hit],
            "rgb": img.reshape(-1, 3)[hit].astype(np.float32),
            "near": near.astype(np.float32), "far": far.astype(np.float32),
            "coord": coord, "mask_at_box": hit,
            "ray_mask": np.ones(hit.sum(), np.float32)}


def sample_patch(img, msk, K, R, T, bounds, patch_size: int,
                 focus_msk: Optional[np.ndarray], rng) -> Dict[str, np.ndarray]:
    """Fixed patch_size crop centered on a random body/focus pixel.

    Produces exactly patch_size^2 ray slots (rays outside the bbox are
    masked via ray_mask) plus 'patch_hw' for image-space losses.
    """
    import cv2
    H, W = img.shape[:2]
    ref = focus_msk if focus_msk is not None and focus_msk.sum() > 0 else (msk == 1)
    coords = np.argwhere(ref)
    cy, cx = coords[rng.integers(0, len(coords))]
    y0 = int(np.clip(cy - patch_size // 2, 0, max(H - patch_size, 0)))
    x0 = int(np.clip(cx - patch_size // 2, 0, max(W - patch_size, 0)))
    crop = img[y0:y0 + patch_size, x0:x0 + patch_size]
    crop_msk = msk[y0:y0 + patch_size, x0:x0 + patch_size]
    ph, pw = crop.shape[:2]
    if ph < patch_size or pw < patch_size:  # image smaller than the patch
        crop = np.pad(crop, ((0, patch_size - ph), (0, patch_size - pw), (0, 0)))
        crop_msk = np.pad(crop_msk, ((0, patch_size - ph), (0, patch_size - pw)))

    Kc = K.copy()
    Kc[0, 2] -= x0
    Kc[1, 2] -= y0
    ray_o, ray_d = get_rays_np(patch_size, patch_size, Kc, R, T)
    ray_o = ray_o.reshape(-1, 3).astype(np.float32)
    ray_d = ray_d.reshape(-1, 3).astype(np.float32)
    near, far, hit = native.near_far(bounds, ray_o, ray_d)

    n = patch_size * patch_size
    # masked-out rays get a DEGENERATE [0, 0] interval: their 64 samples all
    # land at the camera center, far from the body, so the SMPL-distance cull
    # rejects them instead of spending budget slots on garbage-depth points
    # along rays that miss the bbox (a [0, 1] default wasted most of the
    # budget on sparse patches)
    near_full = np.zeros(n, np.float32)
    far_full = np.zeros(n, np.float32)
    near_full[hit] = near
    far_full[hit] = far
    ys, xs = np.meshgrid(np.arange(patch_size), np.arange(patch_size), indexing="ij")
    coord = np.stack([ys, xs], -1).reshape(-1, 2)
    return {"ray_o": ray_o, "ray_d": ray_d,
            "rgb": crop.reshape(-1, 3).astype(np.float32),
            "near": near_full, "far": far_full,
            "coord": coord, "mask_at_box": hit,
            "ray_mask": hit.astype(np.float32),
            "patch_hw": np.array([patch_size, patch_size], np.int32)}
