"""Batched searchsorted + hierarchical importance sampling (JAX).

TPU-native equivalent of the reference's vendored CUDA extension
``lib/csrc/torchsearchsorted`` (binary-search kernel,
``searchsorted_cuda_kernel.cu:41-107``) and its only consumer ``sample_pdf``
(``lib/networks/renderer/nerf_net_utils.py:93-128``).  The inb training path
never calls sample_pdf (N_importance is dead config), but we ship it for
feature parity; ``jnp.searchsorted`` is vectorized and batched via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted(a: jnp.ndarray, v: jnp.ndarray, side: str = "right") -> jnp.ndarray:
    """Row-wise searchsorted: a (B, A), v (B, V) -> indices (B, V).

    Matches the vendored kernel's contract (each row of ``v`` searched in the
    corresponding row of ``a``; a and v may have different inner sizes).
    """
    return jax.vmap(lambda ar, vr: jnp.searchsorted(ar, vr, side=side))(a, v)


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` new depths per ray.

    bins: (R, S-1) midpoints, weights: (R, S-2).  Reference
    ``nerf_net_utils.sample_pdf`` (93-128) semantics: weights + 1e-5,
    normalized pdf, CDF with a leading zero, uniform (or deterministic
    linspace) samples inverted through the CDF.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, S-1)

    R = cdf.shape[0]
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (R, n_samples))
    else:
        u = jax.random.uniform(key, (R, n_samples), dtype=cdf.dtype)

    inds = searchsorted(cdf, u, side="right")
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
