"""UV-indexed residual deformation field (tpose refinement).

Rebuild of ``lib/networks/deformers/uv_deformer.py``: sample (u, v) for each
canonical-pose point from the precomputed bigpose UV volume, append the
normalized frame time t, hash-embed the uvt coordinate, and regress a
``0.05 * tanh`` residual through a small softplus MLP.

TPU delta: the reference gathers flagged points with ``nonzero`` (a
host sync, uv_deformer.py:29); we evaluate densely on the fixed-budget point
set and mask the output — the field is a function of position only, so
masked-dense is numerically identical on flagged points.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import pts_sample_volume
from ..ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init, make_hashgrid_spec
from .nn import mlp_apply, mlp_init

_UVT_BOUNDS = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)


class DeformerSpec(NamedTuple):
    embed: HashGridSpec
    d_hidden: int = 32
    n_layers: int = 2
    scale: float = 0.05


def make_deformer_spec(embed_kwargs: dict, primes,
                       scalar_ok: bool = True,
                       exact_grads: bool = False) -> DeformerSpec:
    # scalar_ok: whether the scalar-grid reparameterization is exact for
    # the optimizer config (see build_model_spec) — the deformer grid must
    # honor the same gate as the part grids.
    return DeformerSpec(embed=make_hashgrid_spec(
        primes=primes, scalar_tables=scalar_ok, exact_grads=exact_grads,
        **embed_kwargs))


def deformer_init(key: jax.Array, spec: DeformerSpec) -> dict:
    ke, km = jax.random.split(key)
    return {
        "embed": hashgrid_init(ke, spec.embed),
        "mlp": mlp_init(km, spec.embed.out_dim, 3, spec.d_hidden, spec.n_layers),
    }


def deformer_apply(spec: DeformerSpec, params: dict, pts: jnp.ndarray,
                   tuv: jnp.ndarray, tbounds: jnp.ndarray,
                   frame_t: jnp.ndarray, flag: jnp.ndarray | None = None,
                   tuv_sizes: jnp.ndarray | None = None,
                   compute_dtype=None) -> jnp.ndarray:
    """pts (N, 3) canonical points -> residual (N, 3).

    tuv: (X, Y, Z, 2) UV volume over tbounds (2, 3); frame_t: scalar in
    [0, 1]; flag: optional (N,) bool mask zeroing the residual.
    """
    uv = pts_sample_volume(pts, tuv, tbounds, sizes=tuv_sizes)  # (N, 2)
    t = jnp.broadcast_to(jnp.asarray(frame_t, uv.dtype), (uv.shape[0], 1))
    uvt = jnp.concatenate([uv, t], axis=-1)  # (N, 3)
    feat = hashgrid_encode(spec.embed, params["embed"], uvt,
                           _UVT_BOUNDS.astype(uv.dtype))
    resd = spec.scale * jnp.tanh(mlp_apply(params["mlp"], feat, compute_dtype))
    resd = resd.astype(pts.dtype)
    if flag is not None:
        resd = jnp.where(flag[:, None], resd, 0.0)
    return resd
