"""Ray generation and sampling.

Host-side pinhole ray generation stays in NumPy (it feeds the data pipeline,
reference ``lib/utils/if_nerf/if_nerf_data_utils.py:24-107``); the per-step
stratified depth sampling is JAX (reference
``lib/networks/renderer/inb_renderer.py:15-31``) and runs inside the fused
render step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# host-side (numpy): used by the dataset workers
# --------------------------------------------------------------------------

def get_rays_np(H: int, W: int, K: np.ndarray, R: np.ndarray, T: np.ndarray):
    """Pinhole rays for every pixel -> (H, W, 3) origins + unit directions.

    Reference ``get_rays`` (if_nerf_data_utils.py:24-38).
    """
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    rays_d = rays_d / np.linalg.norm(rays_d, axis=2, keepdims=True)
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def rays_for_coords_np(K: np.ndarray, R: np.ndarray, T: np.ndarray,
                       coords: np.ndarray):
    """Rays only for an (n, 2) list of (row, col) pixels — O(n), not O(H·W).

    Same math as :func:`get_rays_np` restricted to the sampled pixels; the
    training samplers draw ~1k rays per item, so building the full image
    grid (1M+ pixels at ZJU resolution) per item is pure waste.  The native
    path (csrc/nvrhost.cpp ``ray_dirs``) runs this without the GIL.
    """
    rays_o = -np.dot(R.T, T).ravel()
    xy1 = np.stack([coords[:, 1], coords[:, 0], np.ones(len(coords))],
                   axis=1).astype(np.float64)
    pixel_world = np.dot(np.dot(xy1, np.linalg.inv(K).T) - T.ravel(), R)
    d = pixel_world - rays_o[None]
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(rays_o, d.shape)
    return o.astype(np.float32), d.astype(np.float32)


def get_near_far_np(bounds: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray):
    """AABB slab test -> (near, far, mask_at_box).

    Reference ``get_near_far`` (if_nerf_data_utils.py:92-107), including its
    epsilon clamping of near-zero direction components.  near/far are
    returned only for rays that hit the box.
    """
    norm_d = np.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdir = ray_d / norm_d
    viewdir = viewdir.copy()
    viewdir[(viewdir < 1e-5) & (viewdir > -1e-10)] = 1e-5
    viewdir[(viewdir > -1e-5) & (viewdir < 1e-10)] = -1e-5
    # NOTE: the reference divides against ray_o[:1] only (all rays share a
    # pinhole origin); we use per-ray origins — identical for pinhole rays,
    # correct also for ray sets with mixed origins.
    tmin = (bounds[:1] - ray_o) / viewdir
    tmax = (bounds[1:2] - ray_o) / viewdir
    t1 = np.minimum(tmin, tmax)
    t2 = np.maximum(tmin, tmax)
    near = np.max(t1, axis=-1)
    far = np.min(t2, axis=-1)
    mask_at_box = near < far
    near = near[mask_at_box] / norm_d[mask_at_box, 0]
    far = far[mask_at_box] / norm_d[mask_at_box, 0]
    return near, far, mask_at_box


# --------------------------------------------------------------------------
# device-side (jnp): inside the fused render step
# --------------------------------------------------------------------------

def stratified_z_vals(key: jax.Array, near: jnp.ndarray, far: jnp.ndarray,
                      n_samples: int, perturb: bool) -> jnp.ndarray:
    """Stratified depth samples per ray (inb_renderer.py:15-31).

    near/far: (..., R).  Returns (..., R, S).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near[..., None] * (1.0 - t_vals) + far[..., None] * t_vals
    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def z_to_points(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                z_vals: jnp.ndarray) -> jnp.ndarray:
    """(..., R, 3) x (..., R, S) -> (..., R, S, 3)."""
    return ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]


def z_to_dists(z_vals: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample spacing, last duplicated (inb_renderer.py:44-47)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    return jnp.concatenate([dists, dists[..., -1:]], axis=-1)
