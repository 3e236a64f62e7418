"""Pallas TPU kernel: fused brute-force KNN (distance + streaming top-4).

The XLA formulation of the per-part KNN materializes a (P, C, M) distance
matrix in HBM and re-reads it K times for the argmin passes (~5x HBM traffic
of the matrix).  This kernel streams vertex tiles through VMEM instead: per
(part, query-tile) grid cell it computes the (TQ, TV) distance tile on the
MXU and folds it into running best-K registers — the distance matrix never
touches HBM.

Outputs (P, C, K) squared distances + indices (unsorted slots; callers
reduce or sort the K axis — it is tiny).  The gaussian-weighted blend-weight
aggregation stays in jnp (ops/knn.py drives both paths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9


def _knn_kernel(length_ref, q_ref, verts_ref, out_d_ref, out_i_ref, *,
                K: int, TV: int, M: int):
    """Grid cell: one (part, query-tile).

    length_ref: (P,) SMEM (scalar prefetch); q_ref: (TQ, 3) VMEM;
    verts_ref: (1, M, 3) VMEM (this part's padded verts); outs (1, TQ, K).
    """
    TQ = q_ref.shape[0]
    part = pl.program_id(0)
    q = q_ref[:]                               # (TQ, 3)
    length = length_ref[part]

    # dynamic trip count: only tiles that hold real verts.  Parts are
    # padded to a common M (real subjects: body ~4.6k verts, hands/face a
    # few hundred, absent parts 0) — the static M//TV bound scanned 3.3x
    # more tiles than exist on the round-4 reference-scale fixture, and
    # KNN was 35% of eval render time.  Empty parts run 0 tiles; their
    # outputs stay at the FAR init, which callers already treat as
    # "no neighbor" (part_dist >= smpl_thresh).
    n_tiles = jnp.minimum((length + TV - 1) // TV, M // TV)

    def body(t, carry):
        best_d, best_i = carry                 # (TQ, K), (TQ, K)
        v = verts_ref[0, pl.ds(t * TV, TV), :]  # (TV, 3)
        # exact f32 distances on the VPU: the MXU truncates f32 operands to
        # bf16 (measured d^2 errors ~1e-2 that flip neighbor selection);
        # the contraction is only 3-wide so elementwise is cheap
        d2 = jnp.zeros((TQ, TV), jnp.float32)
        for dim in range(3):
            diff = q[:, dim][:, None] - v[:, dim][None, :]
            d2 = d2 + diff * diff
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TV), 1) + t * TV
        d2 = jnp.where(col < length, d2, _FAR)

        # fold the tile into the running best-K (K argmin passes in VMEM)
        for _ in range(K):
            m = jnp.min(d2, axis=-1, keepdims=True)            # (TQ, 1)
            am = jnp.argmin(d2, axis=-1)                       # (TQ,)
            gi = am[:, None] + t * TV                          # global index
            worst = jnp.max(best_d, axis=-1, keepdims=True)    # (TQ, 1)
            wslot = jnp.argmax(best_d, axis=-1)                # (TQ,)
            take = m < worst                                   # (TQ, 1)
            slot = jax.lax.broadcasted_iota(jnp.int32, (TQ, K), 1) \
                == wslot[:, None]
            best_d = jnp.where(slot & take, m, best_d)
            best_i = jnp.where(slot & take, gi, best_i)
            d2 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (TQ, TV), 1)
                           == am[:, None], _FAR * 2.0, d2)
        return best_d, best_i

    init = (jnp.full((TQ, K), _FAR * 1.5, jnp.float32),
            jnp.zeros((TQ, K), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    out_d_ref[0] = best_d
    out_i_ref[0] = best_i


@functools.partial(jax.jit, static_argnames=("K", "TQ", "TV", "interpret"))
def knn_topk_pallas(query: jnp.ndarray, part_pts: jnp.ndarray,
                    lengths: jnp.ndarray, K: int = 4, TQ: int = 256,
                    TV: int = 512, interpret: bool = False):
    """query (C, 3), part_pts (P, M, 3), lengths (P,) -> d2/idx (P, C, K)."""
    C = query.shape[0]
    P, M = part_pts.shape[:2]
    padC = (-C) % TQ
    padM = (-M) % TV
    q = jnp.pad(query, ((0, padC), (0, 0)))
    verts = jnp.pad(part_pts, ((0, 0), (0, padM), (0, 0)))
    Cp, Mp = C + padC, M + padM

    grid = (P, Cp // TQ)
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, K=K, TV=TV, M=Mp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TQ, 3), lambda p, i, L: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Mp, 3), lambda p, i, L: (p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, TQ, K), lambda p, i, L: (p, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TQ, K), lambda p, i, L: (p, i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, Cp, K), jnp.float32),
            jax.ShapeDtypeStruct((P, Cp, K), jnp.int32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, verts)
    return out_d[:, :C], out_i[:, :C]
