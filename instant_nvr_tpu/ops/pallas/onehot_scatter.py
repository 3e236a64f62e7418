"""Sort-free one-hot-matmul scatter-add for SMALL tables (Pallas TPU).

The deformer's hash tables are tiny (12k-33k rows x 2 features = 24-66 KB)
but receive >1M gradient records per step; XLA's scatter-add serializes at
~7 ns/record (~12 ms/step across the two tables, round-2 trace).  The
sorted-segment kernel (segmented_scatter.py) doesn't help here: sorting the
records costs more than the scatter saves when the table is this small.

Instead: keep the WHOLE table accumulator in VMEM and turn every chunk of
records into one MXU contraction —

    upd[p, lane] = sum_r oh[p, r] * payT_wide[lane, r]

where ``oh[p, r] = (key_r // rpl == w0 + p)`` selects the packed table row
and ``payT_wide[lane, r] = pay[r, lane % F] * (lane // F == key_r % rpl)``
lane-slots the payload (packed layout: ``packed[p, F*c + f] =
grad[rpl*p + c, f]``, rpl = 128 // F).  Both operands are built in VMEM
from a (1, CHUNK) key row — no sort, no HBM-side one-hot, no lane-slotted
payload materialization.  Records are level-major, and each level's keys
fall in its own row window, so ``oh`` only spans the level's packed-row
window (``P_pad`` rows), not the whole table: per-chunk FLOPs =
P_pad * CHUNK * 128 * 2, which the MXU eats at tens of TFLOP/s.

Profitability vs the XLA scatter is decided statically from the shapes
(``onehot_scatter_profitable``); ops/hashgrid.py routes small-table
backwards here when it wins.  Reference hot path being replaced:
lib/networks/embedders/part_base_embedder.py:149-159 backward (uvt/xyzt
deformer tables).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8192          # records per MXU contraction
_MAX_ACC_BYTES = 4 * 1024 * 1024   # f32 accumulator VMEM budget


def _windows(level_offsets: Tuple[int, ...], rpl: int):
    """Per-level packed-row window starts (8-aligned) + common P_pad."""
    starts, sizes = [], []
    for l in range(len(level_offsets) - 1):
        lo = (level_offsets[l] // rpl) // 8 * 8
        hi = (level_offsets[l + 1] - 1) // rpl
        starts.append(lo)
        sizes.append(hi - lo + 1)
    p_pad = max((s + 7) // 8 * 8 for s in sizes)
    return starts, p_pad


def onehot_scatter_profitable(n_rows: int, F: int, R: int,
                              level_offsets: Tuple[int, ...]) -> bool:
    if 128 % F or R % (len(level_offsets) - 1):
        return False
    rpl = 128 // F
    t_packed = -(-n_rows // rpl)
    if t_packed * 128 * 4 > _MAX_ACC_BYTES:
        return False
    n_levels = len(level_offsets) - 1
    starts, p_pad = _windows(level_offsets, rpl)
    r_l = R // n_levels
    n_chunks = n_levels * (-(-r_l // CHUNK))
    flops = n_chunks * p_pad * CHUNK * 128 * 2
    # device rates from the probe/cache registry (round-2 hardcodes were
    # this tunnel's measurements; see ops/device_rates.py)
    from ..device_rates import get_rates
    rates = get_rates()
    t_kernel = flops / rates.matmul_tflops + 3e-4
    return t_kernel < 0.7 * R * rates.xla_scatter_ns_per_row


def _kernel(w0s_ref, keys_ref, payT_ref, out_ref, acc_ref, *, F: int,
            p_pad: int, n_chunks: int):
    c = pl.program_id(0)
    rpl = 128 // F

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    krow = keys_ref[0]                      # (1, CHUNK) i32
    w0 = w0s_ref[c]
    # NOTE: all mask/select math runs in f32/i32 ((8,128)-tiled) — Mosaic
    # cannot relayout a sublane-replicated i1 mask to bf16's (16,128)
    # tiling; only the final matmul operands convert to bf16.
    prow = krow // rpl - w0                 # window-relative packed row
    slot = (krow % rpl).astype(jnp.float32)  # lane block within the row

    sub_p = jax.lax.broadcasted_iota(jnp.int32, (p_pad, CHUNK), 0)
    oh = (prow == sub_p).astype(jnp.float32)         # (p_pad, CHUNK)

    payT = payT_ref[0].astype(jnp.float32)  # (F, CHUNK)
    sub_l = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 0)
    wide = payT[0:1, :] + jnp.zeros((128, 1), jnp.float32)
    for f in range(1, F):                   # row l of wide = payT[l % F]
        wide = jnp.where(sub_l % F == f, payT[f:f + 1, :], wide)
    m = ((sub_l // F).astype(jnp.float32) == slot).astype(jnp.float32)
    wide = wide * m                                   # (128, CHUNK)

    upd = jax.lax.dot_general(
        oh.astype(jnp.bfloat16), wide.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (p_pad, 128)
    sl = pl.ds(w0, p_pad)
    acc_ref[sl, :] = acc_ref[sl, :] + upd

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "level_offsets",
                                             "interpret"))
def onehot_scatter_add(keys: jnp.ndarray, payload: jnp.ndarray, n_rows: int,
                       level_offsets: Tuple[int, ...],
                       interpret: bool = False) -> jnp.ndarray:
    """Dense (n_rows, F) bf16 gradient from R unsorted scatter records.

    keys: (R,) int32, level-major with level l's keys inside
    [level_offsets[l], level_offsets[l+1]); payload: (R, F) with F a power
    of two <= 128 and R divisible by the level count.
    """
    R = keys.shape[0]
    F = payload.shape[1]
    L = len(level_offsets) - 1
    rpl = 128 // F
    starts, p_pad = _windows(level_offsets, rpl)

    r_l = R // L
    n_per = -(-r_l // CHUNK)
    r_pad = n_per * CHUNK
    k2 = keys.reshape(L, r_l)
    p2 = payload.astype(jnp.bfloat16).reshape(L, r_l, F)
    if r_pad != r_l:  # sentinel keys land in-window with zero payload
        offs = jnp.asarray([level_offsets[l] for l in range(L)], jnp.int32)
        k2 = jnp.concatenate(
            [k2, jnp.broadcast_to(offs[:, None], (L, r_pad - r_l))], axis=1)
        p2 = jnp.concatenate(
            [p2, jnp.zeros((L, r_pad - r_l, F), jnp.bfloat16)], axis=1)
    n_chunks = L * n_per
    keys_c = k2.reshape(n_chunks, 1, CHUNK)
    payT = jnp.swapaxes(p2.reshape(n_chunks, CHUNK, F), 1, 2)  # (C, F, CHUNK)

    t_packed = max(-(-n_rows // rpl), max(starts) + p_pad)
    w0s = jnp.asarray([starts[c // n_per] for c in range(n_chunks)], jnp.int32)

    packed = pl.pallas_call(
        functools.partial(_kernel, F=F, p_pad=p_pad, n_chunks=n_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 1, CHUNK), lambda c, s: (c, 0, 0)),
                pl.BlockSpec((1, F, CHUNK), lambda c, s: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((t_packed, 128), lambda c, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((t_packed, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t_packed, 128), jnp.bfloat16),
        interpret=interpret,
    )(w0s, keys_c, payT)

    # packed[p, F*c+f] == grad[rpl*p + c, f] -> plain row-major reshape
    return packed.reshape(-1, F)[:n_rows]
