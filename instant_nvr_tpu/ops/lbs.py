"""Blend-skinning space transforms (JAX).

TPU-native rebuild of reference ``lib/utils/blend_utils.py:366-487``.  All
functions are pure, batched over a leading batch axis, and composed of matmuls
/ elementwise ops that XLA fuses; the 24-bone weighted transform is a single
(N, 24) x (24, 16) matmul that maps straight onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import inverse_3x3

NUM_BONES = 24

# 5-part scheme (reference blend_utils.py:9-38): SMPL joint -> part id
PARTNAMES = ["body", "leg", "head", "larm", "rarm"]
NUM_PARTS = len(PARTNAMES)
# joint -> part map, from the reference's part_bw_map (blend_utils.py:20-38)
PART_BW_MAP = {
    "body": [14, 13, 9, 6, 3, 0],
    "leg": [1, 2, 4, 5, 7, 8, 10, 11],
    "head": [12, 15],
    "larm": [16, 18, 20, 22],
    "rarm": [17, 19, 21, 23],
}


# NOTE: all matmuls here use HIGHEST precision — the TPU MXU truncates f32
# operands to bf16 by default (~0.4% relative error = mm-level position
# errors that corrupt SMPL-distance culling and canonical coordinates).
# These contractions are 3- or 24-wide, so exactness is essentially free.
_EXACT = jax.lax.Precision.HIGHEST


def world_points_to_pose_points(wpts: jnp.ndarray, Rh: jnp.ndarray,
                                Th: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3), Rh (B, 3, 3), Th (B, 1, 3) -> pose-space points.

    Reference blend_utils.py:366-373: ``(wpts - Th) @ Rh``.
    """
    return jnp.matmul(wpts - Th, Rh, precision=_EXACT)


def world_dirs_to_pose_dirs(wdirs: jnp.ndarray, Rh: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(wdirs, Rh, precision=_EXACT)


def pose_points_to_world_points(ppts: jnp.ndarray, Rh: jnp.ndarray,
                                Th: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(ppts, jnp.swapaxes(Rh, -1, -2), precision=_EXACT) + Th


def blend_transforms(bw: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Blend per-bone transforms with weights.

    bw: (B, N, 24) blend weights; A: (B, 24, 4, 4) bone transforms.
    Returns (B, N, 4, 4).  This is the reference's ``get_blend_params``
    (blend_utils.py:395-405) with the (24, N) transpose dropped — we keep
    points-major layout so the contraction is one MXU matmul.
    """
    B, K = A.shape[0], A.shape[1]
    A_flat = A.reshape(B, K, 16)
    A_bw = jnp.matmul(bw, A_flat, precision=_EXACT)  # (B, N, 16)
    return A_bw.reshape(B, -1, 4, 4)


def inverse_blend_params(bw: jnp.ndarray, A: jnp.ndarray):
    """(A_bw, R_inv) for the pose->tpose inverse LBS.

    Reference ``get_inverse_blend_params`` (blend_utils.py:408-419).
    """
    A_bw = blend_transforms(bw, A)
    R_inv = inverse_3x3(A_bw[..., :3, :3])
    return A_bw, R_inv


def pose_points_to_tpose_points(ppts: jnp.ndarray, A_bw: jnp.ndarray,
                                R_inv: jnp.ndarray) -> jnp.ndarray:
    """Inverse-LBS points (blend_utils.py:422-437): R_inv @ (p - t)."""
    pts = ppts - A_bw[..., :3, 3]
    return jnp.sum(R_inv * pts[..., None, :], axis=-1)


def pose_dirs_to_tpose_dirs(pdirs: jnp.ndarray, R_inv: jnp.ndarray) -> jnp.ndarray:
    """Inverse-rotate directions (blend_utils.py:440-454)."""
    return jnp.sum(R_inv * pdirs[..., None, :], axis=-1)


def tpose_points_to_pose_points(pts: jnp.ndarray, A_bw: jnp.ndarray) -> jnp.ndarray:
    """Forward-LBS points (blend_utils.py:457-471): R @ p + t."""
    R = A_bw[..., :3, :3]
    out = jnp.sum(R * pts[..., None, :], axis=-1)
    return out + A_bw[..., :3, 3]


def tpose_dirs_to_pose_dirs(ddirs: jnp.ndarray, A_bw: jnp.ndarray) -> jnp.ndarray:
    """Forward-rotate directions (blend_utils.py:474-487)."""
    R = A_bw[..., :3, :3]
    return jnp.sum(R * ddirs[..., None, :], axis=-1)
