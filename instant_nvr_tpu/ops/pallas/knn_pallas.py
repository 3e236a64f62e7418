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

``knn_blend_pallas`` additionally folds the pbw blend (reference
``sample_blend_closest_points``, blend_utils.py:741-763) into the kernel: a
second vertex-tile pass streams the (M, 24) blend-weight table through VMEM
and contracts a gaussian-weighted one-hot selection matrix against it on
the MXU, removing the HBM round-trip of the (P, C, K) neighbor gather +
reduce the jnp aggregation pays.  The MXU truncates f32 operands to bf16,
so both matmul operands are split hi+lo (each bf16) and recombined with
three f32-accumulating matmuls — ~1e-5 relative error, well inside the
1e-3 pallas-vs-XLA selfcheck gate (tools/tpu_selfcheck.py).
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

    best_d, best_i = _best_k_for_tile_loop(q, verts_ref, length, K, TV,
                                           n_tiles)
    out_d_ref[0] = best_d
    out_i_ref[0] = best_i


def _best_k_for_tile_loop(q, verts_ref, length, K, TV, n_tiles):
    """Shared pass-1 body: streaming best-K over vertex tiles.

    q (TQ, 3) f32; verts_ref (1, Mp, 3) VMEM ref; returns best_d (TQ, K)
    squared distances (FAR-init for missing neighbors) + best_i (TQ, K)
    global vertex indices.
    """
    TQ = q.shape[0]

    def body(t, carry):
        best_d, best_i = carry                 # (TQ, K), (TQ, K)
        v = verts_ref[0, pl.ds(t * TV, TV), :]  # (TV, 3)
        # exact f32 distances on the VPU (MXU would truncate to bf16 and
        # flip neighbor selection — see module docstring / CLAUDE.md)
        d2 = jnp.zeros((TQ, TV), jnp.float32)
        for dim in range(3):
            diff = q[:, dim][:, None] - v[:, dim][None, :]
            d2 = d2 + diff * diff
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TV), 1) + t * TV
        d2 = jnp.where(col < length, d2, _FAR)

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
    return jax.lax.fori_loop(0, n_tiles, body, init)


def _split_hi_lo(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _knn_blend_kernel(length_ref, q_ref, verts_ref, pbw_ref, out_ref, *,
                      K: int, TV: int, M: int, radius: float, eps: float):
    """Grid cell: one (part, query-tile), KNN + fused gaussian pbw blend.

    length_ref: (P,) SMEM; q_ref: (TQ, 3); verts_ref: (1, M, 3);
    pbw_ref: (1, M, D); out_ref: (1, TQ, D+1) — D blended bone weights +
    the aggregated distance channel the model thresholds (knn.py:_aggregate).
    """
    TQ = q_ref.shape[0]
    D = pbw_ref.shape[-1]
    part = pl.program_id(0)
    q = q_ref[:]
    length = length_ref[part]
    n_tiles = jnp.minimum((length + TV - 1) // TV, M // TV)

    best_d, best_i = _best_k_for_tile_loop(q, verts_ref, length, K, TV,
                                           n_tiles)

    # gaussian weights — identical elementwise math to ops/knn._aggregate.
    # FAR-init slots give exp(-~1e11) == exactly 0.0 in f32, so missing
    # neighbors (and empty parts) contribute nothing to the blend.
    d = jnp.sqrt(jnp.maximum(best_d, 0.0))                    # (TQ, K)
    d_safe = jnp.minimum(d, 1e10)
    w = jnp.exp(-(d_safe * d_safe) / (2.0 * radius * radius))
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    agg_dist = jnp.sum(d_safe * w, axis=-1)                   # (TQ,)
    agg_dist = jnp.where(jnp.min(d_safe, axis=-1) <= 8.0 * radius,
                         agg_dist, 1e6)

    # pass 2: stream pbw tiles; contract the K-sparse selection matrix
    # against each tile on the MXU.  Selection/select math stays f32
    # (8,128 tiling); bf16 only at the matmul operands (CLAUDE.md rule).
    def blend_body(t, acc):
        vals = pbw_ref[0, pl.ds(t * TV, TV), :]               # (TV, D) f32
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TV), 1) + t * TV
        sel = jnp.zeros((TQ, TV), jnp.float32)
        for k in range(K):
            sel = sel + jnp.where(col == best_i[:, k][:, None],
                                  w[:, k][:, None], 0.0)
        s_hi, s_lo = _split_hi_lo(sel)
        v_hi, v_lo = _split_hi_lo(vals)
        f32 = jnp.float32
        acc = acc + jnp.dot(s_hi, v_hi, preferred_element_type=f32)
        acc = acc + jnp.dot(s_hi, v_lo, preferred_element_type=f32)
        acc = acc + jnp.dot(s_lo, v_hi, preferred_element_type=f32)
        return acc

    blended = jax.lax.fori_loop(0, n_tiles, blend_body,
                                jnp.zeros((TQ, D), jnp.float32))
    out_ref[0] = jnp.concatenate([blended, agg_dist[:, None]], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("K", "radius", "eps", "TQ", "TV",
                                    "interpret"))
def knn_blend_pallas(query: jnp.ndarray, part_pts: jnp.ndarray,
                     part_pbw: jnp.ndarray, lengths: jnp.ndarray,
                     K: int = 4, radius: float = 0.075, eps: float = 1e-8,
                     TQ: int = 256, TV: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """query (C, 3), part_pts (P, M, 3), part_pbw (P, M, D), lengths (P,)
    -> (P, C, D+1): gaussian-blended bone weights + aggregated distance."""
    C = query.shape[0]
    P, M = part_pts.shape[:2]
    D = part_pbw.shape[-1]
    padC = (-C) % TQ
    padM = (-M) % TV
    q = jnp.pad(query, ((0, padC), (0, 0)))
    verts = jnp.pad(part_pts, ((0, 0), (0, padM), (0, 0)))
    pbw = jnp.pad(part_pbw.astype(jnp.float32), ((0, 0), (0, padM), (0, 0)))
    Cp, Mp = C + padC, M + padM

    grid = (P, Cp // TQ)
    out = pl.pallas_call(
        functools.partial(_knn_blend_kernel, K=K, TV=TV, M=Mp,
                          radius=radius, eps=eps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TQ, 3), lambda p, i, L: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Mp, 3), lambda p, i, L: (p, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Mp, D), lambda p, i, L: (p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TQ, D + 1), lambda p, i, L: (p, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((P, Cp, D + 1), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, verts, pbw)
    return out[:, :C]


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
