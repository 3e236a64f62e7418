"""Core batched geometry math (JAX).

TPU-native equivalents of the reference's numpy/torch helpers:
  - ``batch_rodrigues`` / ``rigid_transform_chain``: SMPL kinematics
    (reference ``lib/utils/if_nerf/if_nerf_data_utils.py:523-577``), here as a
    jit-friendly ``lax.scan``-free formulation (the 24-joint chain is tiny, we
    unroll over the static parent array).
  - ``inverse_3x3``: cofactor-based batched 3x3 inverse (reference
    ``lib/utils/blend_utils.py:293-317``) — avoids ``jnp.linalg.inv``'s
    general LU path, keeps everything on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batch_rodrigues(poses: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    Matches reference semantics including the ``+eps`` inside the norm
    (if_nerf_data_utils.py:527 adds 1e-8 to poses before the norm).
    """
    angle = jnp.linalg.norm(poses + eps, axis=-1, keepdims=True)  # (N, 1)
    rot_dir = poses / angle
    cos = jnp.cos(angle)[..., None]  # (N, 1, 1)
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry,
                   rz, zeros, -rx,
                   -ry, rx, zeros], axis=-1).reshape(*poses.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=poses.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rigid_transform_chain(poses: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray) -> jnp.ndarray:
    """Per-joint world transforms relative to the rest pose.

    poses: (J, 3) axis-angle, joints: (J, 3), parents: static numpy (J,).
    Returns (J, 4, 4).  Mirrors ``get_rigid_transformation``
    (if_nerf_data_utils.py:545-577): compose down the kinematic chain, then
    subtract the transformed rest joints so the result maps rest-pose points.
    """
    J = joints.shape[0]
    joints = jnp.asarray(joints)
    rot = batch_rodrigues(poses)  # (J, 3, 3)
    parents = np.asarray(parents)
    rel_joints = joints.at[1:].add(-joints[parents[1:]])
    # local transform matrices
    T_local = jnp.zeros((J, 4, 4), dtype=poses.dtype)
    T_local = T_local.at[:, :3, :3].set(rot)
    T_local = T_local.at[:, :3, 3].set(rel_joints)
    T_local = T_local.at[:, 3, 3].set(1.0)

    # compose down the chain; parents is static so this unrolls to 23 matmuls
    chain = [T_local[0]]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ T_local[i])
    transforms = jnp.stack(chain, axis=0)  # (J, 4, 4)

    # remove rest-joint offset: T[:, :3, 3] -= (T @ [joints, 0])
    joints_h = jnp.concatenate([joints, jnp.zeros((J, 1), dtype=joints.dtype)], axis=1)
    posed_joints = jnp.einsum("jab,jb->ja", transforms, joints_h)  # (J, 4)
    transforms = transforms.at[:, :, 3].add(-posed_joints)
    return transforms


def inverse_3x3(m: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Batched 3x3 inverse via the adjugate (reference blend_utils.py:293-363).

    m: (..., 3, 3).  Adds eps to the determinant like the reference.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d

    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1),
    ], axis=-2)
    return adj / (det[..., None, None] + eps)


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm with a well-defined gradient at 0.

    ``jnp.linalg.norm`` backpropagates NaN at exactly-zero vectors (x/|x|);
    masked-out residuals are exactly zero, so every loss that norms them must
    use this instead.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def get_bounds(xyz: jnp.ndarray, padding: float = 0.05) -> jnp.ndarray:
    """Axis-aligned bounds of a point set with padding -> (2, 3).

    Reference ``if_nerf_data_utils.get_bounds`` (689-696).
    """
    min_xyz = jnp.min(xyz, axis=0) - padding
    max_xyz = jnp.max(xyz, axis=0) + padding
    return jnp.stack([min_xyz, max_xyz], axis=0)
