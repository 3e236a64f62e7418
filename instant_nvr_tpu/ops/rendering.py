"""Volume-rendering compositing and regularizers (JAX).

Reference: ``lib/utils/net_utils.py:12-44`` (render_weights /
volume_rendering) and ``lib/networks/renderer/inb_renderer.py:96-103``
(distortion regularizer).  Everything is shape-static and fuses into the
render step; the cumulative product is ``jnp.cumprod`` which XLA lowers to a
log-depth scan on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def render_weights(alpha: jnp.ndarray, epsilon: float = 1e-10) -> jnp.ndarray:
    """alpha (..., R, S) -> compositing weights (..., R, S).

    w_i = a_i * prod_{j<i} (1 - a_j + eps)   (net_utils.py:12-15)
    """
    trans = jnp.cumprod(1.0 - alpha + epsilon, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return alpha * trans


def volume_rendering(rgb: jnp.ndarray, alpha: jnp.ndarray,
                     epsilon: float = 1e-8, bg_brightness=None):
    """Composite rgb (..., R, S, 3) with alpha (..., R, S).

    Returns (weights, rgb_map, acc_map).  Reference net_utils.py:18-44.
    """
    weights = render_weights(alpha, epsilon)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc_map = jnp.sum(weights, axis=-1)
    if bg_brightness is not None:
        rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bg_brightness
    return weights, rgb_map, acc_map


def distortion_loss(weights: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF-360-style distortion regularizer per ray.

    Reference inb_renderer.py:96-103: sum_ij w_i w_j |mid_i - mid_j| using
    midpoints of (z_i, z_{i+1}).  weights/z_vals: (R, S) -> (R,).

    The O(S^2) pairwise form matches the reference exactly; S=64 so the
    (R, S, S) intermediate is small and XLA keeps it in registers/VMEM.
    """
    next_z = jnp.concatenate([z_vals[..., 1:], z_vals[..., -1:]], axis=-1)
    mid = 0.5 * (z_vals + next_z)
    w_ij = weights[..., :, None] * weights[..., None, :]
    d_ij = jnp.abs(mid[..., :, None] - mid[..., None, :])
    return jnp.sum(w_ij * d_ij, axis=(-1, -2))
