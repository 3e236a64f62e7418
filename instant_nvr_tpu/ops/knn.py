"""K-nearest-neighbor blend-weight sampling, TPU-native.

Replaces pytorch3d's CUDA ``knn_points`` — the reference's one runtime-critical
native op (``lib/utils/blend_utils.py:732-825``) — with a brute-force distance
computation structured as a batched matmul (``|q - v|^2 = |q|^2 + |v|^2 -
2 q.v``) so the inner product rides the MXU, followed by ``lax.top_k``.

SMPL has only 6890 vertices split over 5 parts, so brute force over the
padded per-part vertex sets is cheap; ragged part lengths are handled by
masking padded slots to +inf before the top-k (the reference passes
``lengths2`` to pytorch3d for the same purpose).

Queries are processed in chunks via ``lax.map`` to bound the (chunk, M)
distance matrix in memory; chunk size is a config knob (``knn_chunk``).
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

from .lbs import NUM_BONES


_FAR = 1e9  # finite sentinel for masked slots


def _iter_min_k(d2: jnp.ndarray, K: int):
    """Exact K smallest per row by repeated argmin.  d2 (C, M) -> (C, K) x2."""
    C = d2.shape[0]
    rows = jnp.arange(C)
    vals, idxs = [], []
    for _ in range(K):
        i = jnp.argmin(d2, axis=-1)            # (C,)
        v = jnp.take_along_axis(d2, i[:, None], axis=-1)[:, 0]
        vals.append(v)
        idxs.append(i)
        d2 = d2.at[rows, i].set(_FAR * 2.0)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _knn_one_chunk(q: jnp.ndarray, verts: jnp.ndarray, values: jnp.ndarray,
                   length: jnp.ndarray, K: int, radius: float, eps: float,
                   exact: bool = True):  # kept for API stability; always exact
    """q (C, 3), verts (M, 3), values (M, D), length scalar -> (C, D), (C,)."""
    # squared distances via MXU-friendly matmul
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)               # (C, 1)
    v2 = jnp.sum(verts * verts, axis=-1)[None, :]             # (1, M)
    # HIGHEST precision: the contraction is only 3-wide (cheap) and nearest-
    # neighbor selection is sensitive to cancellation in |q|^2+|v|^2-2qv
    qv = jnp.dot(q, verts.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (C, M)
    d2 = q2 + v2 - 2.0 * qv                                   # (C, M)
    M = verts.shape[0]
    valid = jnp.arange(M, dtype=jnp.int32)[None, :] < length  # (1, M)
    d2 = jnp.where(valid, d2, _FAR)

    # exact k-smallest via K argmin passes: K=4 passes over (C, M) beat the
    # full bitonic sort lax.top_k lowers to, and compile fast (approx_min_k
    # compiles pathologically slowly on some TPU toolchains)
    min_d2, idx = _iter_min_k(d2, K)
    d = jnp.sqrt(jnp.maximum(min_d2, 0.0))                    # (C, K) euclidean

    # gaussian-weighted aggregation (blend_utils.py:741-763)
    d_safe = jnp.minimum(d, 1e10)
    w = jnp.exp(-(d_safe * d_safe) / (2.0 * radius * radius))
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    agg_dist = jnp.sum(d_safe * w, axis=-1)                   # (C,)
    # "far" rule: nearest neighbor beyond 8*radius (w < 1e-14, far outside
    # any thresholding) -> report a large distance.  NOTE deviation from the
    # reference, which lets the gaussian underflow to 0/0 and reports
    # distance *0* for far points, accidentally flagging them into the part
    # (blend_utils.py:747-749).
    agg_dist = jnp.where(d_safe[..., 0] <= 8.0 * radius, agg_dist, 1e6)
    flat_i = jnp.clip(idx.reshape(-1), 0, values.shape[0] - 1)
    sampled = values[flat_i].reshape(*idx.shape, values.shape[-1])  # (C, K, D)
    agg_val = jnp.sum(sampled * w[..., None], axis=-2)        # (C, D)
    return agg_val, agg_dist


def _aggregate(d: jnp.ndarray, idx: jnp.ndarray, part_pbw: jnp.ndarray,
               radius: float, eps: float) -> jnp.ndarray:
    """(P, C, K) dists/indices + (P, M, D) values -> (C, P, 25)."""
    d_safe = jnp.minimum(d, 1e10)
    w = jnp.exp(-(d_safe * d_safe) / (2.0 * radius * radius))
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    agg_dist = jnp.sum(d_safe * w, axis=-1)                   # (P, C)
    agg_dist = jnp.where(jnp.min(d_safe, axis=-1) <= 8.0 * radius,
                         agg_dist, 1e6)
    M = part_pbw.shape[1]
    # flat 1-D gather indices (multi-dim index arrays hit a slow TPU path)
    sampled = jax.vmap(
        lambda vals, i: vals[jnp.clip(i.reshape(-1), 0, M - 1)]
        .reshape(*i.shape, vals.shape[-1]))(part_pbw, idx)    # (P, C, K, D)
    agg_val = jnp.sum(sampled * w[..., None], axis=-2)        # (P, C, D)
    out = jnp.concatenate([agg_val, agg_dist[..., None]], axis=-1)
    return jnp.swapaxes(out, 0, 1)                            # (C, P, 25)


def knn_blend_weights_multiassign_pallas(query, part_pts, part_pbw, lengths,
                                         K: int = 4, radius: float = 0.075,
                                         eps: float = 1e-8,
                                         interpret: bool = False,
                                         fused: bool = True) -> jnp.ndarray:
    """Pallas-fused variant (see ops/pallas/knn_pallas.py).

    ``fused=True`` (default) runs the single kernel that also performs the
    gaussian pbw blend via hi+lo-split MXU matmuls over vertex tiles —
    no (P, C, K) neighbor index round-trip through HBM.  ``fused=False``
    keeps the top-k kernel + jnp ``_aggregate`` path (exact f32 gather),
    retained as the comparison oracle for tools/tpu_selfcheck.py.
    """
    if fused:
        from .pallas.knn_pallas import knn_blend_pallas
        out = knn_blend_pallas(query, part_pts, part_pbw, lengths, K=K,
                               radius=radius, eps=eps,
                               interpret=interpret)            # (P, C, D+1)
        return jnp.swapaxes(out, 0, 1)                         # (C, P, 25)
    from .pallas.knn_pallas import knn_topk_pallas
    d2, idx = knn_topk_pallas(query, part_pts, lengths, K=K,
                              interpret=interpret)             # (P, C, K)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    return _aggregate(d, idx, part_pbw, radius, eps)


def knn_blend_weights_multiassign(query: jnp.ndarray, part_pts: jnp.ndarray,
                                  part_pbw: jnp.ndarray, lengths: jnp.ndarray,
                                  K: int = 4, radius: float = 0.075,
                                  eps: float = 1e-8,
                                  chunk: int = 1024,
                                  exact: bool = False) -> jnp.ndarray:
    """Per-part KNN blend weights for every query point.

    query: (N, 3); part_pts: (P, M, 3) zero-padded; part_pbw: (P, M, 24);
    lengths: (P,) valid counts.  Returns (N, P, 25): 24 blended bone weights
    + the gaussian-aggregated distance (the 25th channel the model thresholds
    against ``smpl_thresh``).  Reference
    ``pts_knn_blend_weights_multiassign_batch`` (blend_utils.py:817-825).
    """
    N = query.shape[0]
    P = part_pts.shape[0]
    pad = (-N) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)  # (n_chunks, chunk, 3)

    def per_chunk(qc):
        def per_part(verts, vals, ln):
            return _knn_one_chunk(qc, verts, vals, ln, K, radius, eps, exact)
        bw, d = jax.vmap(per_part)(part_pts, part_pbw, lengths)  # (P, C, 24), (P, C)
        return bw, d

    bw, d = jax.lax.map(per_chunk, q)  # (n_chunks, P, chunk, 24/..)
    bw = jnp.swapaxes(bw, 1, 2).reshape(-1, P, NUM_BONES)[:N]
    d = jnp.swapaxes(d, 1, 2).reshape(-1, P)[:N]
    return jnp.concatenate([bw, d[..., None]], axis=-1)  # (N, P, 25)
