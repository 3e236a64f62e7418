"""Multiresolution hash-grid encoding (iNGP-style), TPU-native.

Rebuild of the reference's part hash embedder
(``lib/networks/embedders/part_base_embedder.py:12-174``):

  - L levels with growth factor ``b``; level i has ``int(base_res * b**i)``
    entries per side.
  - Levels whose dense size fits under the table size stay *dense* (flat
    x*n^2 + y*n + z indexing, concatenated into one table); larger levels are
    *hashed* with the prime-xor spatial hash into a ``nextprime(2^log2)``
    sized table.
  - 8-corner gather + trilinear interpolation, then feature aggregation:
    ``sum_over_features`` (-> L dims, the reference default for parts),
    sum-over-levels (-> F dims), or concat (-> L*F dims).
  - ``include_input`` concatenates the normalized xyz (3 dims).

Deviation (documented): the reference computes the spatial hash in int64
(``x*p0 ^ y*p1 ^ z*p2 mod T``, part_base_embedder.py:131-136); we compute it
in uint32 with wraparound multiplication — the original iNGP formulation —
because TPUs have no fast int64 path.  The hash *values* differ but the
distribution quality is identical; nothing downstream depends on exact
indices.

Init matches the reference's single-tensor kaiming_normal over an (L, T, F)
tensor (std = sqrt(2 / (T*F)), part_base_embedder.py:71-79): near-zero init
is load-bearing for convergence.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from sympy import nextprime

from .pallas.onehot_scatter import (onehot_scatter_add,
                                    onehot_scatter_profitable)
from .pallas.segmented_scatter import TILE_ROWS, segmented_scatter_add

# tables whose f32 gradient exceeds XLA's fast (VMEM-resident, ~20 ns/row)
# scatter path get the sorted-segment Pallas backward; originally set at the
# measured ~17 MB fast/slow cliff (278k rows x F16), lowered after round-2
# traces showed the 200k-230k-row dense tables scattering at ~15 ns/row
# (5.4 ms for 360k records) — the sort+kernel does those in ~2 ms.
# None = read from ops.device_rates (probe/cache/defaults); set a number to
# pin it (tests monkeypatch this)
KERNEL_MIN_ROWS = None


def _min_rows() -> int:
    if KERNEL_MIN_ROWS is not None:
        return KERNEL_MIN_ROWS
    from .device_rates import get_rates
    return get_rates().kernel_min_rows


def _use_scatter_kernel(n_rows: int, dtype) -> bool:
    return (n_rows >= _min_rows() and dtype == jnp.bfloat16
            and jax.default_backend() not in ("cpu",))


def _is_packed(n_rows: int, F: int) -> bool:
    """Big tables are STORED packed — (n_rows // (128//F), 128), row-major,
    i.e. exactly ``flat.reshape(-1, 128)``.  Three wins (docs/PERF.md r2):
    the scatter kernel's native output needs no ~10 ms tiled-layout
    relayout; TPU row gathers are latency-bound per ROW so a 128-lane
    gather costs the same as a 16-lane one; and the kernel's accumulator
    and matmuls use full 128-lane tiles (a (N, 16) VMEM array pads 8x)."""
    return n_rows >= _min_rows() and F < 128 and 128 % F == 0


def _lane_select(wide: jnp.ndarray, idx: jnp.ndarray, F: int) -> jnp.ndarray:
    """wide: (R, 128) gathered packed rows; pick each row's F-lane block.

    One-hot contraction over the rpl axis: a single pass over ``wide``
    (the k-loop where/add variant re-read the full (R, 128) gather rpl
    times — ~8.3 ms/step across tables, traced round 2).
    """
    rpl = 128 // F
    oh = (idx % rpl)[:, None] == jnp.arange(rpl, dtype=idx.dtype)[None, :]
    w3 = wide.reshape(-1, rpl, F)
    return jnp.sum(jnp.where(oh[:, :, None], w3, 0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def table_gather(table: jnp.ndarray, idx: jnp.ndarray, n_levels: int,
                 F: int, level_offsets: Tuple[int, ...] = None,
                 exact_grads: bool = False):
    """Logical-row gather with a kernel scatter-add backward.

    table: (T_rows, F) plain, or (T_rows // (128//F), 128) packed (decided
    by ``_is_packed``); idx: (R,) int32 of LOGICAL rows, level-major with
    per-level index ranges disjoint and ascending (dense offsets /
    l*table_size bases give this for free) — required for the batched
    per-level sort to produce a globally sorted record stream, and for the
    small-table one-hot kernel's per-level row windows.  ``level_offsets``
    (static, len n_levels+1) are the level row starts + total rows.
    """
    if table.shape[1] != F:                    # packed storage
        return _lane_select(table[idx // (128 // F)], idx, F)
    return table[idx]


def _table_gather_fwd(table, idx, n_levels, F, level_offsets, exact_grads):
    # the table rides along only for its shape/dtype (no copy is made)
    return (table_gather(table, idx, n_levels, F, level_offsets, exact_grads),
            (table, idx))


def _table_gather_bwd(n_levels, F, level_offsets, exact_grads, res, g):
    (table, idx) = res
    packed = table.shape[1] != F
    n_rows = table.shape[0] * (128 // F) if packed else table.shape[0]
    on_accel = jax.default_backend() not in ("cpu",)
    if (_use_scatter_kernel(n_rows, table.dtype)
            and n_rows % TILE_ROWS == 0 and packed):
        grad = segmented_scatter_add(idx, g.astype(jnp.bfloat16), n_rows,
                                     n_levels=n_levels, packed_out=True)
    elif (on_accel and not packed
          and table.dtype in (jnp.bfloat16, jnp.float32)
          and not (exact_grads and table.dtype == jnp.float32)
          and level_offsets is not None
          and onehot_scatter_profitable(n_rows, F, idx.shape[0],
                                        level_offsets)):
        # tiny table, huge record count: VMEM one-hot-matmul accumulate.
        # f32 tables take this path too when the spec allows bf16 gradient
        # rounding (the deformer-stays-f32-under-bf16-config case — same
        # rounding as the old bf16-gather path).  An explicit
        # grid_compute_dtype: float32 run sets spec.exact_grads and gets
        # the exact XLA f32 scatter instead (ADVICE r4).
        grad = onehot_scatter_add(idx, g.astype(jnp.bfloat16), n_rows,
                                  level_offsets)
    else:
        grad = jnp.zeros((n_rows, F), table.dtype).at[idx].add(g)
        if packed:
            grad = grad.reshape(table.shape)
    return grad.astype(table.dtype), None


table_gather.defvjp(_table_gather_fwd, _table_gather_bwd)


# --------------------------------------------------------------------------
# scalar tables (sum_over_features reparameterization)
# --------------------------------------------------------------------------
#
# When a grid aggregates with ``sum & sum_over_features`` (the reference
# default for every part grid, configs/inb/*.yaml), the network only ever
# consumes the per-row FEATURE SUM: in the forward the F features of a row
# enter as sum_f table[r, f], and in the backward every feature of a row
# receives the IDENTICAL gradient.  Under Adam (zero-init moments) identical
# gradients produce identical per-feature updates forever, so the (T, F)
# table carries only T effective degrees of freedom — in the reference
# (lib/networks/embedders/part_base_embedder.py:71-79 + feature-sum at
# :159) just as here.  We therefore store ONE value per row: q[r] :=
# mean_f table[r, f] and use F * q[r] in the forward.  Exactness: the
# q-gradient is F x the per-feature gradient, and Adam's update direction
# m_hat/(sqrt(v_hat)+eps) is invariant to uniform gradient scaling up to
# eps (1e-15, negligible vs sqrt(v_hat); the sole deviation).  Init matches
# by distribution: mean of F N(0, std^2) draws = N(0, std^2 / F).
#
# TPU payoff (the entire round-2/3 hot-op family shrinks):  table HBM 16x
# (1.1 GB -> 70 MB); the Adam sweep (11 ms/step) 16x; backward sort payload
# 8x (1 bf16 passenger vs 8 packed s32); the (R, 128) packed-row gather +
# one-hot lane-select + its layout copies collapse into a flat scalar
# gather; the forward feature-sum reduce disappears.


# Row width for the wide-row scalar gather.  A TPU gather from a 1-D table
# runs at ~9.6 ns/fetch; the SAME fetch count against a (rows/W, W)-reshaped
# table followed by an exact one-hot lane select runs ~1.9x faster (measured
# on this device at W in 8..128, flat across that range — a different XLA
# gather emitter).  The select is exact: one nonzero lane per row, so the
# lane sum reproduces the bf16/f32 value bit-for-bit.
WIDE_GATHER_W = 16


def _wide_row_gather(table: jnp.ndarray, idx: jnp.ndarray,
                     wide: bool = True) -> jnp.ndarray:
    """q[idx] via (rows/W, W) row fetch + exact lane select.

    Runs on every backend (same graph the TPU executes, so the CPU test
    suite covers it).  ``wide=False`` uses the plain 1-D gather: slower
    per fetch, but with NO (R, W) intermediate — when XLA materializes
    that intermediate at record scale it tile-pads W->128 lanes (the
    f32[66M,16] -> 33.9 GB eval allocation, docs/PERF.md round 5); callers
    with huge record streams into tiny tables pass wide=False.
    """
    W = WIDE_GATHER_W if wide else 1
    n = table.shape[0]
    if W <= 1:
        return table[idx]
    if n % W:
        table = jnp.pad(table, (0, W - n % W))  # tiny tables; big are tile-padded
    if table.dtype == jnp.float32:
        # f32 wide rows get the PADDED {1,0} (R, W) layout on TPU (16
        # lanes -> 128: 8x physical HBM, ~22 ms/step on the deformer
        # columns, docs/PERF.md round 5) while 2-byte dtypes get the
        # compact {0,1} layout.  So: view the f32 rows as u16 lane PAIRS,
        # gather (R, 2W) u16 (compact), and recombine the selected pair
        # with integer ops — bit-exact f32, 8x less gather traffic.
        # XLA BitcastConvert to a narrower type appends a minor dim whose
        # index 0 is the LEAST significant bits (tested vs table[idx] in
        # tests/test_hashgrid.py).
        t16 = jax.lax.bitcast_convert_type(table.reshape(-1, W), jnp.uint16)
        rows = t16.reshape(-1, 2 * W)[idx // W]          # (R, 2W) u16
        lanes = jnp.arange(2 * W, dtype=idx.dtype)[None, :]
        oh = (idx & (W - 1))[:, None] == lanes // 2      # selected PAIR
        m = jnp.where(lanes % 2 == 0, jnp.uint32(1), jnp.uint32(1 << 16))
        bits = jnp.sum(jnp.where(oh, rows.astype(jnp.uint32) * m, 0),
                       axis=1, dtype=jnp.uint32)
        return jax.lax.bitcast_convert_type(bits, jnp.float32)
    rows = table.reshape(-1, W)[idx // W]       # (R, W): one fetch per index
    oh = (idx & (W - 1))[:, None] == jnp.arange(W, dtype=idx.dtype)[None, :]
    return jnp.sum(jnp.where(oh, rows, 0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def scalar_table_gather(table: jnp.ndarray, idx: jnp.ndarray, n_levels: int,
                        level_offsets: Tuple[int, ...] = None,
                        allow_rounded: bool = False,
                        wide: bool = True):
    """1-D gather q[idx] with a kernel scatter-add backward.

    table: (T_rows,) scalar-per-row grid; idx: (R,) int32 logical rows,
    level-major with per-level ranges disjoint and ascending (see
    :func:`table_gather`).  ``allow_rounded`` (static) lets f32 tables take
    the one-hot kernel with a bf16-rounded gradient — the small-table
    per-feature-column path under bf16 configs, same rounding class as
    :func:`table_gather`'s f32 routing.  ``wide`` (static): see
    :func:`_wide_row_gather`.
    """
    return _wide_row_gather(table, idx, wide)


def _scalar_gather_fwd(table, idx, n_levels, level_offsets, allow_rounded,
                       wide):
    return _wide_row_gather(table, idx, wide), (table, idx)


def _scalar_gather_bwd(n_levels, level_offsets, allow_rounded, wide, res, g):
    (table, idx) = res
    n_rows = table.shape[0]
    on_accel = jax.default_backend() not in ("cpu",)
    if (_use_scatter_kernel(n_rows, table.dtype)
            and n_rows % TILE_ROWS == 0):
        grad = segmented_scatter_add(idx, g.astype(jnp.bfloat16)[:, None],
                                     n_rows, n_levels=n_levels,
                                     packed_out=True).reshape(n_rows)
    elif (on_accel
          and (table.dtype == jnp.bfloat16
               or (allow_rounded and table.dtype == jnp.float32))
          and level_offsets is not None
          and onehot_scatter_profitable(n_rows, 1, idx.shape[0],
                                        level_offsets)):
        grad = onehot_scatter_add(idx, g.astype(jnp.bfloat16)[:, None],
                                  n_rows, level_offsets).reshape(n_rows)
    else:
        grad = jnp.zeros((n_rows,), table.dtype).at[idx].add(g)
    return grad.astype(table.dtype), None


scalar_table_gather.defvjp(_scalar_gather_fwd, _scalar_gather_bwd)


def pack_table(flat: jnp.ndarray, scalar: bool = False) -> jnp.ndarray:
    """Bring an externally-loaded (rows, F) table into storage layout
    (tile-pad + pack when big; feature-mean reduce for scalar grids) —
    e.g. for reference-checkpoint import."""
    rows, F = flat.shape
    if scalar:
        q = jnp.mean(flat, axis=-1)
        return jnp.pad(q, (0, _pad_rows(rows, 1) - rows))
    flat = jnp.pad(flat, ((0, _pad_rows(rows, F) - rows), (0, 0)))
    if _is_packed(rows, F):
        return flat.reshape(-1, 128)
    return flat


def _pad_rows(n: int, F: int) -> int:
    """Pad big tables to the scatter kernel's tile multiple at init, so the
    backward needs no post-kernel slice copy."""
    if _is_packed(n, F):
        return ((n + TILE_ROWS - 1) // TILE_ROWS) * TILE_ROWS
    return n


class HashGridSpec(NamedTuple):
    """Static description of one hash-grid embedder (hashable; jit-static)."""
    n_levels: int
    n_features: int
    table_size: int              # nextprime(2**log2_hashmap_size)
    entries_num: Tuple[int, ...]  # per-level entries per side
    start_hash: int              # first hashed level
    dense_offsets: Tuple[int, ...]  # flat offset of each dense level in the dense table
    dense_total: int
    sum: bool
    sum_over_features: bool
    include_input: bool
    primes: Tuple[int, int, int]
    # store one value per row (the feature MEAN; forward uses F * q) — exact
    # for sum & sum_over_features grids, see the scalar_table_gather note
    scalar: bool = False
    # forbid bf16 gradient rounding in the backward scatter for f32 tables
    # (set by grid_compute_dtype: float32 configs — full-precision
    # parity/debugging runs get the exact XLA f32 scatter, ADVICE r4)
    exact_grads: bool = False
    # wide-row scalar gathers (W=16 row fetch + lane select, ~1.9x faster
    # per fetch) vs plain 1-D (no (R, W) intermediate).  Training keeps
    # wide (measured: 39.6 vs 53.6 ms selfcheck step); memory-bound eval
    # programs (chunk > 4096) flip it off — a materialized (R, 16)
    # intermediate tile-pads 8x at eval record counts (docs/PERF.md r5)
    wide_gather: bool = True

    @property
    def out_dim(self) -> int:
        if self.sum:
            d = self.n_levels if self.sum_over_features else self.n_features
        else:
            d = self.n_levels * self.n_features
        return d + (3 if self.include_input else 0)

    @property
    def n_hash_levels(self) -> int:
        return self.n_levels - self.start_hash


def make_hashgrid_spec(n_levels: int = 16, n_features_per_level: int = 16,
                       log2_hashmap_size: int = 18, base_resolution: int = 2,
                       b: float = 1.38, sum: bool = True,
                       sum_over_features: bool = True,
                       include_input: bool = True,
                       separate_dense: bool = True,
                       primes=(1, 19349663, 83492791),
                       scalar_tables: bool = True,
                       exact_grads: bool = False,
                       **_unused) -> HashGridSpec:
    table_size = int(nextprime(2 ** log2_hashmap_size))
    entries_num = tuple(int(base_resolution * b ** i) for i in range(n_levels))
    entries_cnt = [n ** 3 for n in entries_num]
    start_hash = n_levels
    for i in range(n_levels):
        if entries_cnt[i] > table_size:
            start_hash = i
            break
    if not separate_dense:
        start_hash = 0
    offsets, total = [], 0
    for i in range(start_hash):
        offsets.append(total)
        total += entries_cnt[i]
    return HashGridSpec(
        n_levels=n_levels, n_features=n_features_per_level,
        table_size=table_size, entries_num=entries_num, start_hash=start_hash,
        dense_offsets=tuple(offsets), dense_total=total, sum=sum,
        sum_over_features=sum_over_features, include_input=include_input,
        primes=tuple(int(p) for p in primes),
        scalar=bool(scalar_tables and sum and sum_over_features),
        exact_grads=bool(exact_grads))


def hashgrid_init(key: jax.Array, spec: HashGridSpec,
                  dtype=jnp.float32) -> dict:
    """Parameters: {'dense': (dense_total, F), 'hash': (H*T, F)}.

    Both use std = sqrt(2 / (T*F)) — the fan of the reference's joint
    (L, T, F) kaiming init.  The hash table is stored FLAT with levels
    concatenated: reshaping an (H, T, F) param at use-time forces a
    physical relayout copy of the whole table every step on TPU
    (T(8,128)-tiled layouts are not reshape-free).

    ``spec.scalar`` grids store (rows,) scalars instead — the per-row
    feature mean, init N(0, std^2 / F) = the distribution of the mean of F
    kaiming draws (see the scalar_table_gather note).
    """
    std = math.sqrt(2.0 / (spec.table_size * spec.n_features))
    kd, kh = jax.random.split(key)
    F = spec.n_features

    def make(k, rows):
        # rows beyond the logical size (scatter-kernel tile padding) are
        # never indexed; zero-init keeps them exactly zero under Adam
        if spec.scalar:
            q = (std / math.sqrt(F)) * jax.random.normal(k, (rows,), dtype=dtype)
            return jnp.pad(q, (0, _pad_rows(rows, 1) - rows))
        t = std * jax.random.normal(k, (rows, F), dtype=dtype)
        t = jnp.pad(t, ((0, _pad_rows(rows, F) - rows), (0, 0)))
        if _is_packed(rows, F):
            t = t.reshape(-1, 128)             # packed storage (row-major)
        return t

    return {"dense": make(kd, max(spec.dense_total, 1)),
            "hash": make(kh, max(spec.n_hash_levels, 1) * spec.table_size)}


def hashgrid_encode(spec: HashGridSpec, params: dict, xyz: jnp.ndarray,
                    bounds: jnp.ndarray) -> jnp.ndarray:
    """Encode points.  xyz: (N, 3); bounds: (2, 3).  Returns (N, out_dim).

    Forward is a flat gather + lerp (XLA TPU dynamic-gather).  The backward
    table scatter-add goes through ``table_gather``'s custom VJP: big tables
    use the sorted-segment Pallas kernel in
    ``instant_nvr_tpu/ops/pallas/segmented_scatter.py`` (~5x the XLA
    scatter), small ones XLA's fast VMEM-resident scatter path.
    """
    N = xyz.shape[0]
    L, F = spec.n_levels, spec.n_features
    S, H = spec.start_hash, spec.n_hash_levels

    x01 = (xyz - bounds[0]) / (bounds[1] - bounds[0])  # (N, 3) normalized

    # LAYOUT RULE (docs/PERF.md round 5): every record-scale array keeps N
    # on the MINOR axis and puts the 8-corner axis in the MIDDLE — (L, 8, N)
    # — and the xyz axes are carried as three separate (L, N)/(L, 8, N)
    # arrays instead of a trailing dim of 3.  TPU tiles pad the minor two
    # dims to (8, 128): trailing dims of 3/8/2 cost 42x/16x/64x physical
    # HBM (the round-5 eval chunk-8192 OOM — a 252 MB deformer gather
    # padded to 15.79 GB).  (L, 8, N) keeps the flattened record stream
    # level-major, which the backward scatter kernels require (per-level
    # windows; order WITHIN a level is free — they sort/window per level).
    entries = jnp.array(spec.entries_num, dtype=x01.dtype)  # (L,)
    nmax = jnp.array(spec.entries_num, dtype=jnp.int32)[:, None]  # (L,1)
    # 8 corner offsets in the reference's bit order (z fastest)
    cbits = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                     axis=-1).reshape(8, 3)  # rows: 000,001,010,011,100,...

    idx3, off3 = [], []
    for d in range(3):
        fd = x01[:, d][None, :] * (entries - 1.0)[:, None]       # (L, N)
        # truncation toward zero like torch .long() (part_base_embedder.py:116)
        bd = fd.astype(jnp.int32)
        cd = jnp.array(cbits[:, d], jnp.int32)[None, :, None]    # (1,8,1)
        idx3.append(jnp.clip(bd[:, None, :] + cd, 0, (nmax - 1)[:, :, None]))
        # offset measured from the *clipped* 000 corner (reference line 118)
        off3.append(fd - jnp.clip(bd, 0, nmax - 1).astype(fd.dtype))

    # trilinear weights: corner bit 0 -> (1-off), bit 1 -> off
    w = None
    for d in range(3):
        cf = jnp.array(cbits[:, d], x01.dtype)[None, :, None]    # (1,8,1)
        wd = (1.0 - cf) + (2.0 * cf - 1.0) * off3[d][:, None, :]
        w = wd if w is None else w * wd                          # (L, 8, N)

    def interp(table, ind, n_lev, level_offsets, lo):
        """-> (n_lev, F', N) level-major feature blocks (F'=1 for scalar
        grids).  NOTE: lerp accumulates in f32 (w's dtype); a bf16-lerp
        variant was measured SLOWER (-7% step throughput): the weight
        converts + bf16 VPU reduces cost more than the f32 promotion."""
        ws = w[lo:lo + n_lev]                                    # (n_lev,8,N)
        ind_flat = ind.reshape(-1)  # level-major stream, corner mid, N minor
        if spec.scalar:
            # scalar grid: one value per row; forward contribution F * q
            v = scalar_table_gather(table, ind_flat, n_lev, level_offsets,
                                    False,
                                    spec.wide_gather).reshape(n_lev, 8, N)
            return (jnp.sum(ws * v, axis=1) * F)[:, None, :]     # (n_lev,1,N)
        if table.shape[1] != F:
            # packed big table: keep the wide-row gather (one row fetch
            # carries all F features; per-column gathers would F-plicate
            # the latency-bound row fetches)
            v = table_gather(table, ind_flat, n_lev, F, level_offsets,
                             spec.exact_grads).reshape(n_lev, 8, N, F)
            return jnp.moveaxis(jnp.sum(ws[..., None] * v, axis=1), -1, 1)
        # plain small table: per-feature COLUMN gathers — a (R, F) gather
        # output with F on the minor axis tile-pads 64x at F=2
        feats = []
        for f in range(F):
            vf = scalar_table_gather(table[:, f], ind_flat, n_lev,
                                     level_offsets, not spec.exact_grads,
                                     spec.wide_gather).reshape(n_lev, 8, N)
            feats.append(jnp.sum(ws * vf, axis=1))               # (n_lev, N)
        return jnp.stack(feats, axis=1)                          # (n_lev,F,N)

    # one flat gather per table: (S,8,N) dense indices into (dense_total, F)
    # and (H,8,N) level-offset hashed indices into the flattened hash table —
    # a single big gather beats 1 + H separate/vmapped gathers on TPU (fewer
    # ops, one fused backward scatter-add).
    # PERF: gathers MUST use flat 1-D index vectors — multi-dim index arrays
    # (whose minor dims are tiny) trigger a ~1000x slower TPU gather path
    # (measured 56ms -> 0.02ms for the same 1.2M rows).
    vals = []
    if S > 0:
        nd = nmax[:S, :, None]  # (S,1,1)
        ind_d = (idx3[0][:S] * (nd * nd) + idx3[1][:S] * nd
                 + idx3[2][:S])  # (S, 8, N)
        ind_d = ind_d + jnp.array(spec.dense_offsets,
                                  dtype=jnp.int32)[:, None, None]
        vals.append(interp(params["dense"], ind_d, S,
                           spec.dense_offsets + (spec.dense_total,), 0))
    if H > 0:
        p0, p1, p2 = (jnp.uint32(p) for p in spec.primes)
        ind_h = ((idx3[0][S:].astype(jnp.uint32) * p0)
                 ^ (idx3[1][S:].astype(jnp.uint32) * p1)
                 ^ (idx3[2][S:].astype(jnp.uint32) * p2))
        ind_h = (ind_h % jnp.uint32(spec.table_size)).astype(jnp.int32)
        ind_h = ind_h + (jnp.arange(H, dtype=jnp.int32)
                         * spec.table_size)[:, None, None]  # (H, 8, N)
        vals.append(interp(params["hash"], ind_h, H,
                           tuple(l * spec.table_size for l in range(H + 1)), S))
    val = jnp.concatenate(vals, axis=0) if len(vals) > 1 else vals[0]

    # val: (L, F', N) — transpose to point-major only ONCE, at the final
    # (N, out_dim) assembly (an out_dim minor pad is small and bounded)
    val = val.astype(x01.dtype)
    if spec.scalar:
        out = val[:, 0, :].T                              # (N, L) feature sums
    elif spec.sum:
        out = (jnp.sum(val, axis=1).T if spec.sum_over_features
               else jnp.sum(val, axis=0).T)               # (N, L) / (N, F)
    else:
        out = val.reshape(L * F, N).T                     # (N, L*F)
    if spec.include_input:
        out = jnp.concatenate([x01, out], axis=-1)
    return out


# --------------------------------------------------------------------------
# fused multi-part encoding
# --------------------------------------------------------------------------

def multi_hashgrid_encode(specs: Tuple[HashGridSpec, ...], params_list,
                          pts: jnp.ndarray, bounds: jnp.ndarray,
                          seg_sizes: Tuple[int, ...]) -> jnp.ndarray:
    """Encode a part-major concatenation of points through P part grids.

    Numerically equivalent to running :func:`hashgrid_encode` per part on
    ``pts[off_p : off_p + seg_sizes[p]]`` with ``bounds[p]`` and
    concatenating — but ALL index/weight math runs once on the (M, ...) axis
    and the per-(level, point, corner) features from every table join one
    flat record stream with a single feature-sum + corner-lerp reduce.  On
    this TPU the per-part unroll was ~6 us/op x hundreds of small ops
    (docs/PERF.md round 3); table storage stays per part (a unified table
    would push every gather into the big-table ~11 ns/row latency regime —
    small tables gather ~6x faster).

    pts: (M, 3) with M == sum(seg_sizes); bounds: (P, 2, 3) dynamic.
    Requires every spec to share n_levels / n_features / primes and the
    part-grid mode (sum over features, include_input).  Returns (M, out_dim).

    Reference being replaced: the serial per-part embedder loop,
    lib/networks/bw_deform/inb_part_network_multiassign.py:222-227 +
    part_base_embedder.py:114-159.
    """
    P = len(specs)
    s0 = specs[0]
    L, F = s0.n_levels, s0.n_features
    assert all(s.n_levels == L and s.n_features == F and s.sum
               and s.sum_over_features and s.include_input == s0.include_input
               and s.primes == s0.primes and s.scalar == s0.scalar
               for s in specs), \
        "multi_hashgrid_encode requires uniform part-grid specs"
    M = sum(seg_sizes)
    assert pts.shape[0] == M
    offs = np.cumsum([0] + list(seg_sizes))
    pid = np.repeat(np.arange(P), seg_sizes)             # (M,) host constant

    # per-point bounds (dynamic) via one gather; pid is compile-time constant
    b = bounds[jnp.asarray(pid, jnp.int32)]              # (M, 2, 3)
    x01 = (pts - b[:, 0]) / (b[:, 1] - b[:, 0])          # (M, 3)

    # Same layout rule as hashgrid_encode (docs/PERF.md round 5): corner
    # axis in the MIDDLE, M minor, xyz as three separate arrays — a
    # trailing dim of 3/8 tile-pads 42x/16x at record scale.  The record
    # stream stays level-major (backward kernel contract); corner order
    # within a level is free.
    # (L, M) per-point-per-level resolutions — a host-side constant
    e_np = np.asarray([s.entries_num for s in specs], np.int32)[pid].T  # (L, M)
    e_f = jnp.asarray(e_np, x01.dtype)
    e_i = jnp.asarray(e_np)                              # (L, M) i32
    cbits = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                     axis=-1).reshape(8, 3)              # z fastest

    idx3 = []
    w = None
    for d in range(3):
        fd = x01[:, d][None, :] * (e_f - 1.0)            # (L, M)
        bd = fd.astype(jnp.int32)
        cd = jnp.asarray(cbits[:, d], jnp.int32)[None, :, None]   # (1,8,1)
        idx3.append(jnp.clip(bd[:, None, :] + cd, 0, (e_i - 1)[:, None, :]))
        od = fd - jnp.clip(bd, 0, e_i - 1).astype(fd.dtype)       # (L, M)
        cf = jnp.asarray(cbits[:, d], x01.dtype)[None, :, None]
        wd = (1.0 - cf) + (2.0 * cf - 1.0) * od[:, None, :]
        w = wd if w is None else w * wd                  # (L, 8, M)

    # dense + hash candidate indices for EVERY (level, corner, point); each
    # table then slices its (levels x points) window.  Flat 1-D gather
    # indices (multi-dim index arrays hit the ~1000x slower TPU path).
    n_lm = e_i[:, None, :]                               # (L, 1, M)
    ind_dense = idx3[0] * (n_lm * n_lm) + idx3[1] * n_lm + idx3[2]
    p0, p1, p2 = (jnp.uint32(p) for p in s0.primes)
    h_all = ((idx3[0].astype(jnp.uint32) * p0)
             ^ (idx3[1].astype(jnp.uint32) * p1)
             ^ (idx3[2].astype(jnp.uint32) * p2))        # (L, 8, M)

    scalar = s0.scalar

    def block_feat(tab, ind, ws, n_lev, Kp, level_offsets):
        """One (part, table) block: gather + feature-sum + corner lerp.
        ind/ws: (n_lev, 8, Kp); -> (n_lev, Kp) level-block features.
        sum_over_features runs FIRST (f32 accumulation); scalar grids carry
        the sum directly as F * q."""
        ind_flat = ind.reshape(-1)
        if scalar:
            v = scalar_table_gather(tab, ind_flat, n_lev, level_offsets,
                                    False, s0.wide_gather)
            vsum = v.astype(jnp.float32) * F
        elif tab.shape[1] != F:
            # packed big table: one wide-row fetch carries all F features
            v = table_gather(tab, ind_flat, n_lev, F, level_offsets,
                             s0.exact_grads)
            vsum = jnp.sum(v, axis=-1, dtype=jnp.float32)
        else:
            # plain small table: per-feature COLUMN gathers — the (R, F)
            # gather output tile-pads 128/F x at record scale
            vsum = None
            for f in range(F):
                vf = scalar_table_gather(tab[:, f], ind_flat, n_lev,
                                         level_offsets, not s0.exact_grads,
                                         s0.wide_gather)
                vsum = vf if vsum is None else vsum + vf
            vsum = vsum.astype(jnp.float32)
        return jnp.sum(ws * vsum.reshape(n_lev, 8, Kp), axis=1)

    outs = []
    for p in range(P):
        s = specs[p]
        Kp, o = seg_sizes[p], offs[p]
        S, H = s.start_hash, s.n_hash_levels
        blocks = []
        if S > 0:
            d = ind_dense[:S, :, o:o + Kp] + jnp.asarray(
                s.dense_offsets, jnp.int32)[:, None, None]
            blocks.append(block_feat(params_list[p]["dense"], d,
                                     w[:S, :, o:o + Kp], S, Kp,
                                     s.dense_offsets + (s.dense_total,)))
        if H > 0:
            hh = (h_all[S:, :, o:o + Kp]
                  % jnp.uint32(s.table_size)).astype(jnp.int32)
            hh = hh + (jnp.arange(H, dtype=jnp.int32)
                       * s.table_size)[:, None, None]
            blocks.append(block_feat(params_list[p]["hash"], hh,
                                     w[S:, :, o:o + Kp], H, Kp,
                                     tuple(l * s.table_size
                                           for l in range(H + 1))))
        part = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)
        outs.append(part.T)                              # (Kp, L)
    val = jnp.concatenate(outs, axis=0).astype(x01.dtype)  # (M, L)
    if s0.include_input:
        val = jnp.concatenate([x01, val], axis=-1)
    return val
