"""Embedders: NeRF frequency encoding + part hash-grid wrapper.

Frequency encoding mirrors ``lib/networks/embedders/freq_embedder.py``:
out_dim = D + multires*2*D with layout [input, (sin(f_i * x_d)), (cos(...))]
interleaved level-major, matching the reference's (multires, [sin,cos], D)
flattening.  The hash-grid wrapper just pairs a spec with init (see
``ops/hashgrid.py`` for the encoder itself).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init, make_hashgrid_spec  # noqa: F401


def freq_out_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims + multires * 2 * input_dims


def freq_encode(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """x (..., D) -> (..., D + multires*2*D)."""
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # (M,)
    xb = x[..., None, None, :] * freqs[:, None, None]   # (..., M, 1, D)
    feat = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., M, 2, D)
    feat = feat.reshape(*x.shape[:-1], multires * 2 * x.shape[-1])
    return jnp.concatenate([x, feat], axis=-1)
