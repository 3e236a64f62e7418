"""Sorted-segment scatter-add for big hash-table gradients (Pallas TPU).

Replaces the XLA scatter-add in the backward of the hash-grid table gather
(reference hot path: ``lib/networks/embedders/part_base_embedder.py:149-159``
backward).  Measured on this TPU (docs/PERF.md round 2):

  - XLA scatter-add into a big (>17 MB) table costs ~105 ns/row regardless
    of index order or sortedness hints — it is serialized per row.
  - ``lax.sort`` with a key + bf16-packed payload moves records at
    ~9 ns/row, and the MXU runs one-hot accumulate matmuls at >100 TFLOP/s.

So the backward becomes:

  1. XLA: pack the (R, F) bf16 payload into F/2 int32 operands and
     multisort with the row keys — batched per hash level (levels sort
     independently; level-offset keys keep the concatenation globally
     sorted, and an N-element bitonic sort is ~log^2 N, so L small sorts
     beat one big one).
  2. XLA: place each sorted record's F features at lane slot
     ``F * (key % ROWS_PER_LANE_ROW)`` of a 128-lane row ("lane-slotted"
     payload), and searchsorted macro-tile edges -> per-tile segments.
  3. Pallas: grid over macro tiles; each step streams its record segment
     through a double-buffered VMEM refill (bounded chunks, so arbitrary
     key pileups stay correct).  Both the accumulator and the gradient use
     a PACKED layout — ``packed[p, F*c + f] = grad[8p + c, f]`` — so a
     128-record block folds into a 1024-table-row window with ONE
     (128 x 128) @ (128 x 128) one-hot matmul on the MXU: zero lane
     padding, zero MXU waste.  f32 accumulation in VMEM (the XLA path
     accumulated in bf16), bf16 gradient out, unpacked by one XLA reshape.

Why packed: a (N, 16) f32 array in VMEM is lane-padded to 128 lanes — an
unpacked accumulator burned 8x VMEM (32 MB!) and 8x MXU throughput.

Every inner loop is a dynamic-trip-count ``fori_loop``: Mosaic fully
unrolls static-bound loops, which once blew the scoped-vmem stack.

Tables must be padded to TILE_ROWS (ops/hashgrid.py pads at init).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 65536        # macro tile (grid granularity)
WINDOW = 1024            # table rows folded per one-hot matmul (M=128 packed)
BLOCK = 128              # records per one-hot matmul (K dim)
CAP = 4096               # records buffered in VMEM per refill slot
LANES = 128              # lane width


def _scatter_kernel(starts_ref, keys_hbm, pay_hbm, out_ref, acc_ref,
                    keys_buf, keys_smem, pay_buf, sem, *, F: int):
    """One macro tile: accumulate its sorted record segment (packed layout).

    starts_ref: (n_macro+1,) SMEM — global record index of each macro
    tile's segment start.  keys_hbm: (R_pad/128, 128) i32;
    pay_hbm: (R_pad, LANES) bf16 lane-slotted.  acc/out rows hold
    LANES // F consecutive table rows each.
    """
    t = pl.program_id(0)
    rpl = LANES // F                           # table rows per packed row
    wp = WINDOW // rpl                         # packed rows per window (=128)
    ppm = TILE_ROWS // rpl                     # packed rows per macro tile
    wpm = TILE_ROWS // WINDOW                  # windows per macro tile
    seg_start = starts_ref[t]
    seg_end = starts_ref[t + 1]

    def zero_body(wi, _):
        acc_ref[pl.ds(wi * wp, wp), :] = jnp.zeros((wp, LANES), jnp.float32)
        return 0

    jax.lax.fori_loop(0, ppm // wp, zero_body, 0, unroll=False)

    # block-aligned record range for this macro tile (global 128 grid)
    b_lo = (seg_start // BLOCK) * BLOCK
    n_refills = pl.cdiv(seg_end - b_lo, CAP)

    def refill_copies(rf, slot):
        buf0 = b_lo + rf * CAP                 # multiple of BLOCK
        return (
            pltpu.make_async_copy(
                keys_hbm.at[pl.ds(buf0 // 128, CAP // 128), :],
                keys_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                keys_hbm.at[pl.ds(buf0 // 128, CAP // 128), :],
                keys_smem.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(
                pay_hbm.at[pl.ds(buf0, CAP), :], pay_buf.at[slot],
                sem.at[slot, 2]),
        )

    @pl.when(n_refills > 0)
    def _():
        for c in refill_copies(0, 0):
            c.start()

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (wp, BLOCK), 0)

    def refill_body(rf, _):
        slot = jax.lax.rem(rf, 2)
        buf0 = b_lo + rf * CAP

        @pl.when(rf + 1 < n_refills)
        def _():
            for c in refill_copies(rf + 1, 1 - slot):
                c.start()

        for c in refill_copies(rf, slot):
            c.wait()

        nb = pl.cdiv(jnp.minimum(seg_end, buf0 + CAP) - buf0, BLOCK)

        def block_body(bj, _):
            off = pl.multiple_of(bj * BLOCK, BLOCK)
            krow = keys_buf[slot, pl.ds(off // 128, 1), :]      # (1, 128)
            prow = krow // rpl                                  # packed row
            pay = pay_buf[slot, pl.ds(off, BLOCK), :]           # (128, 128)
            # window span of this (sorted) block, clamped to the tile;
            # sentinel keys (>= T_pad) and neighbor-tile keys fall outside
            # and are excluded by the clamp + one-hot
            k0 = keys_smem[slot, off // 128, 0]
            k1 = keys_smem[slot, (off + BLOCK - 1) // 128, 127]
            wlo = jnp.maximum(k0 // WINDOW, t * wpm)
            whi = jnp.minimum(k1 // WINDOW, t * wpm + wpm - 1)

            def window_body(w, _):
                # oh[p, r] = record r lands in packed row (w*wp + p)
                oh = (prow - w * wp == iota_p).astype(jnp.bfloat16)
                upd = jax.lax.dot_general(
                    oh, pay, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (wp, 128)
                sl = pl.ds(pl.multiple_of(w * wp - t * ppm, wp), wp)
                acc_ref[sl, :] = acc_ref[sl, :] + upd
                return 0

            jax.lax.fori_loop(wlo, whi + 1, window_body, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, nb, block_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_refills, refill_body, 0, unroll=False)

    def write_body(wi, _):
        sl = pl.ds(wi * wp, wp)
        out_ref[sl, :] = acc_ref[sl, :].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ppm // wp, write_body, 0, unroll=False)


def _scatter_kernel_f1(starts_ref, keys_hbm, pay_hbm, out_ref, acc_ref,
                       keys_buf, keys_smem, pay_buf, sem):
    """F=1 (scalar-table) macro-tile kernel: lane-slotting happens HERE.

    v1 lane-slotted the payload in XLA — for F=1 that is a 128x expansion
    ((R,) -> (R, 128) bf16; ~170 MB written + padded + re-read per big
    table, ~3.5 ms/step of pure HBM churn on the flagship trace).  Here the
    payload rides to VMEM in its natural (R/128, 128) layout and each
    128-record block builds its slotted (128, 128) tile on the fly:

      Z[j, l]  = pay[j] * (lane(j) == l)        lane(j) = key_j % 128
      oh[p, j] = (key_j // 128 == w*128 + p)    packed-row one-hot
      upd      = oh @ Z                         (128,128)@(128,128) MXU

    Z needs lane/pay indexed by SUBLANE (the contraction dim) while the
    buffers hold them lane-major — transposed via one-hot MXU matmuls.
    CRITICAL precision note: the MXU computes f32 matmuls at bf16 precision
    on this device (see CLAUDE.md KNN corruption), so only values exact in
    bf16 may ride a transpose matmul: lane in [0,128) and the bf16 payload
    qualify; raw keys (up to 2^22) do NOT and stay lane-major throughout.
    The f1 window is 128 packed rows * 128 lanes = 16384 table rows, so
    the accumulate matmul runs the full 128x128 MXU (v1's WINDOW=1024 was
    tuned for F=16 and would leave M=8).
    """
    t = pl.program_id(0)
    wp = 128                                   # packed rows per window
    w_rows = wp * LANES                        # table rows per window: 16384
    ppm = TILE_ROWS // LANES                   # packed rows per macro tile
    wpm = TILE_ROWS // w_rows                  # windows per macro tile
    seg_start = starts_ref[t]
    seg_end = starts_ref[t + 1]

    def zero_body(wi, _):
        acc_ref[pl.ds(wi * wp, wp), :] = jnp.zeros((wp, LANES), jnp.float32)
        return 0

    jax.lax.fori_loop(0, ppm // wp, zero_body, 0, unroll=False)

    b_lo = (seg_start // BLOCK) * BLOCK
    n_refills = pl.cdiv(seg_end - b_lo, CAP)

    def refill_copies(rf, slot):
        buf0 = b_lo + rf * CAP
        return (
            pltpu.make_async_copy(
                keys_hbm.at[pl.ds(buf0 // 128, CAP // 128), :],
                keys_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                keys_hbm.at[pl.ds(buf0 // 128, CAP // 128), :],
                keys_smem.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(
                pay_hbm.at[pl.ds(buf0 // 128, CAP // 128), :],
                pay_buf.at[slot], sem.at[slot, 2]),
        )

    @pl.when(n_refills > 0)
    def _():
        for c in refill_copies(0, 0):
            c.start()

    iota_sub_f = jax.lax.broadcasted_iota(
        jnp.int32, (LANES, LANES), 0).astype(jnp.float32)
    iota_lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (LANES, LANES), 1).astype(jnp.float32)
    # transpose matmuls run in f32 (Mosaic rejects mixed bf16->f32
    # dot_general on a (1,128) operand); the MXU truncates f32 matmuls to
    # bf16 precision on this device, which is exact here: lane in [0,128)
    # and the payload is bf16 to begin with
    ident = (iota_sub_f == iota_lane_f).astype(jnp.float32)

    def refill_body(rf, _):
        slot = jax.lax.rem(rf, 2)
        buf0 = b_lo + rf * CAP

        @pl.when(rf + 1 < n_refills)
        def _():
            for c in refill_copies(rf + 1, 1 - slot):
                c.start()

        for c in refill_copies(rf, slot):
            c.wait()

        nb = pl.cdiv(jnp.minimum(seg_end, buf0 + CAP) - buf0, BLOCK)

        def block_body(bj, _):
            off = pl.multiple_of(bj * BLOCK, BLOCK)
            krow = keys_buf[slot, pl.ds(off // 128, 1), :]      # (1, 128) i32
            prow_f = (krow // LANES).astype(jnp.float32)        # (1, 128)
            lane_f = (krow % LANES).astype(jnp.float32)         # exact: <128
            # pay rides as f32: Mosaic cannot do an unaligned 1-row dynamic
            # load from a (16,128)-tiled bf16 buffer (32-bit buffers can)
            pay_f = pay_buf[slot, pl.ds(off // 128, 1), :]      # (1, 128) f32

            # transpose lane/pay to columns via one-hot MXU matmuls
            lane_col = jax.lax.dot_general(
                ident, lane_f, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (128, 1)
            pay_col = jax.lax.dot_general(
                ident, pay_f, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (128, 1)
            z = jnp.where(lane_col == iota_lane_f, pay_col, 0.0)  # (128, 128)
            zb = z.astype(jnp.bfloat16)

            k0 = keys_smem[slot, off // 128, 0]
            k1 = keys_smem[slot, (off + BLOCK - 1) // 128, 127]
            wlo = jnp.maximum(k0 // w_rows, t * wpm)
            whi = jnp.minimum(k1 // w_rows, t * wpm + wpm - 1)

            def window_body(w, _):
                base = (w * wp).astype(jnp.float32)
                # oh[p, j] = (key_j // 128 == w*wp + p); prow_f (1, 128)
                # broadcasts along sublanes, p is the sublane iota
                oh = ((prow_f - base) == iota_sub_f).astype(jnp.bfloat16)
                upd = jax.lax.dot_general(
                    oh, zb, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (wp, 128)
                sl = pl.ds(pl.multiple_of(w * wp - t * ppm, wp), wp)
                acc_ref[sl, :] = acc_ref[sl, :] + upd
                return 0

            jax.lax.fori_loop(wlo, whi + 1, window_body, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, nb, block_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_refills, refill_body, 0, unroll=False)

    def write_body(wi, _):
        sl = pl.ds(wi * wp, wp)
        out_ref[sl, :] = acc_ref[sl, :].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ppm // wp, write_body, 0, unroll=False)


@functools.partial(jax.jit,
                   static_argnames=("T_pad", "n_levels", "packed_out",
                                    "interpret"))
def segmented_scatter_add(keys: jnp.ndarray, payload: jnp.ndarray,
                          T_pad: int, n_levels: int = 1,
                          packed_out: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """Dense grad (T_pad, F) bf16 from R scatter-add records.

    keys: (R,) int32 in [0, T_pad), ordered (level, point, corner) so a
    per-level batched sort yields a globally sorted stream (each level's
    keys carry the level's table offset; per-level key ranges must be
    disjoint and ascending).  payload: (R, F) bf16 with F a power of two
    <= 128 — including F=1, the scalar-table mode (ops/hashgrid.py stores
    sum-over-features grids as one value per row; the sort then moves a
    single bf16 passenger instead of F/2 packed pairs, ~4x less sort
    traffic).  T_pad must be a multiple of TILE_ROWS.

    With ``packed_out`` the gradient stays in the kernel's native packed
    layout (T_pad // (128//F), 128) — ``packed[p, F*c+f] == grad[rpl*p+c,
    f]``, i.e. exactly ``grad.reshape(-1, 128)``.  Callers that store
    tables packed (ops/hashgrid.py) use this to skip a ~10 ms tiled-layout
    relayout per big table.
    """
    R = keys.shape[0]
    F = payload.shape[1]
    assert T_pad % TILE_ROWS == 0, T_pad
    assert R % n_levels == 0 and (F == 1 or F % 2 == 0) and LANES % F == 0
    rpl = LANES // F

    # 1. per-level batched multisort.  F>=2: key + F/2 packed-bf16-pair
    #    operands.  F==1: key + ONE bf16 passenger (sorted by key only, so
    #    the payload dtype never affects the order).
    # is_stable=False: a stable sort makes XLA carry a hidden iota operand
    # (traced as a third s32 passenger, +1/3 sort traffic); equal-key
    # records are summed (f32, in-kernel) so their relative order is moot
    kl = keys.reshape(n_levels, R // n_levels)
    if F == 1:
        pl1 = payload.astype(jnp.bfloat16).reshape(n_levels, R // n_levels)
        sk, sp = jax.lax.sort([kl, pl1], dimension=1, num_keys=1,
                              is_stable=False)
        sk = sk.reshape(R)
        spay = sp.reshape(R, 1)
    else:
        packed = jax.lax.bitcast_convert_type(
            payload.astype(jnp.bfloat16).reshape(R, F // 2, 2), jnp.int32)
        pll = packed.reshape(n_levels, R // n_levels, F // 2)
        ops = [kl] + [pll[..., i] for i in range(F // 2)]
        out = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        sk = out[0].reshape(R)
        spay = jax.lax.bitcast_convert_type(
            jnp.stack(out[1:], axis=-1), jnp.bfloat16).reshape(R, F)

    if F > 1:
        # 2. lane-slot the payload: record r's features go to lane block
        #    (key % rpl) of a 128-lane row (same bytes as zero-padding to 128)
        slot_oh = (sk[:, None] % rpl
                   == jnp.arange(rpl, dtype=jnp.int32)[None, :])
        spay = (slot_oh[:, :, None] * spay[:, None, :]).reshape(R, LANES)
    else:
        # F=1: the kernel lane-slots per block in VMEM (_scatter_kernel_f1);
        # the payload ships in its natural (R/128, 128) layout — v1's XLA
        # expansion here cost a 128x HBM round-trip per big table.  f32
        # because Mosaic only supports the kernel's unaligned 1-row dynamic
        # loads from 32-bit (8,128)-tiled buffers (4 B/record vs v1's
        # (R,128) bf16 = 256 B/record — 64x less)
        spay = spay.reshape(R).astype(jnp.float32)

    # 3. pad records to the CAP grid, plus 2*CAP of sentinel slack: a macro
    #    tile's refill window starts at its (block-aligned) segment start,
    #    which can be as large as R, so the last refill may read up to
    #    ~R + CAP + BLOCK rows — keep every DMA in bounds
    R_pad = ((R + CAP - 1) // CAP) * CAP + 2 * CAP
    sk = jnp.pad(sk, (0, R_pad - R), constant_values=jnp.int32(T_pad))
    if F > 1:
        spay = jnp.pad(spay, ((0, R_pad - R), (0, 0)))
    else:
        spay = jnp.pad(spay, (0, R_pad - R)).reshape(R_pad // 128, 128)
        assert spay.dtype == jnp.float32

    # 4. per-macro-tile segment starts
    n_macro = T_pad // TILE_ROWS
    edges = jnp.arange(0, T_pad + 1, TILE_ROWS, dtype=jnp.int32)
    starts = jnp.searchsorted(sk, edges).astype(jnp.int32)

    keys2d = sk.reshape(R_pad // 128, 128)
    kern = (_scatter_kernel_f1 if F == 1
            else functools.partial(_scatter_kernel, F=F))
    pay_scratch = (pltpu.VMEM((2, CAP // 128, 128), jnp.float32) if F == 1
                   else pltpu.VMEM((2, CAP, LANES), jnp.bfloat16))
    packed_grad = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_macro,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TILE_ROWS // rpl, LANES),
                                   lambda t, s: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((TILE_ROWS // rpl, LANES), jnp.float32),
                pltpu.VMEM((2, CAP // 128, 128), jnp.int32),
                pltpu.SMEM((2, CAP // 128, 128), jnp.int32),
                pay_scratch,
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad // rpl, LANES), jnp.bfloat16),
        interpret=interpret,
    )(starts, keys2d, spay)
    if packed_out:
        return packed_grad
    return packed_grad.reshape(T_pad, F)


def segmented_scatter_add_ref(keys, payload, T_pad):
    """XLA reference (same f32-accumulate semantics) for tests."""
    acc = jnp.zeros((T_pad, payload.shape[1]), jnp.float32)
    return acc.at[keys].add(payload.astype(jnp.float32)).astype(jnp.bfloat16)
