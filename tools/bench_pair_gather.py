#!/usr/bin/env python
"""Microbench: single-row corner fetches vs 2-wide corner-pair fetches.

Hypothesis (round 4): hash/dense table gathers are latency-bound per
fetched ROW (W in 8..128 costs the same per fetch, see
ops/hashgrid.WIDE_GATHER_W).  The 8 trilinear corners of a (level, point)
are fetched as 8 independent rows today; but the two z-corners are
consecutive integers, so with a power-of-two table and the unit hash
multiplier assigned to z, every z-pair is an ALIGNED index pair
{2m, 2m+1} — one wide fetch can return both corners, halving the fetch
count (8 -> 4 per point-level).

This measures, on the real device, the same total corner workload:
  a) 8R single fetches through the current wide-row path
  b) 4R pair fetches (wide row at (2m)//W, two adjacent lane selects)
  c) 4R pair fetches, lane-pair select via one reshape to (R, W/2, 2)
plus the backward: scatter-add of 8R records (F=1) vs 4R records (F=2).

Run: python tools/bench_pair_gather.py  (TPU; NVR_PLATFORM=cpu to smoke)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import instant_nvr_tpu  # noqa: F401  (platform + cache config)

import jax
import jax.numpy as jnp
import numpy as np

W = 16


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # tunnel-safe sync
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def single_gather(table, idx):
    """Current path: wide-row fetch + one-hot lane select (8R fetches)."""
    rows = table.reshape(-1, W)[idx // W]
    oh = (idx & (W - 1))[:, None] == jnp.arange(W, dtype=idx.dtype)[None, :]
    return jnp.sum(jnp.where(oh, rows, 0), axis=1)


def pair_gather(table, m):
    """Pair fetch: wide row at (2m)//W, select lanes (l, l+1).  4R fetches,
    returns (R, 2)."""
    e = 2 * m
    rows = table.reshape(-1, W)[e // W]                   # (R, W)
    lane = (e & (W - 1)) // 2                             # pair slot in row
    oh = lane[:, None] == jnp.arange(W // 2, dtype=m.dtype)[None, :]
    pairs = rows.reshape(-1, W // 2, 2)                   # (R, W/2, 2)
    return jnp.sum(jnp.where(oh[:, :, None], pairs, 0), axis=1)  # (R, 2)


def main():
    k = jax.random.PRNGKey(0)
    T = 1 << 21            # 2M-entry scalar table (hash-table scale)
    R = 2_000_000          # corner-pair count per "chunk" (~ eval scale)
    dt = jnp.bfloat16
    table = jax.jit(lambda k: jax.random.normal(k, (T,), jnp.float32).astype(dt))(k)
    km, ks = jax.random.split(k)
    m = jax.jit(lambda k: jax.random.randint(k, (R,), 0, T // 2))(km)  # pair slots
    # the equivalent single-fetch workload: both corners as separate indices
    idx2 = jax.jit(lambda m: jnp.stack([2 * m, 2 * m + 1], -1).reshape(-1))(m)
    # and a fully random single workload (today's hash: corners uncorrelated)
    idx_rand = jax.jit(lambda k: jax.random.randint(k, (2 * R,), 0, T))(ks)

    # reduce to a scalar INSIDE the jit: fetching a 2R-element result
    # through the tunnel would dominate the timing
    f_single = jax.jit(lambda t, i: jnp.sum(single_gather(t, i),
                                            dtype=jnp.float32))
    f_pair = jax.jit(lambda t, i: jnp.sum(pair_gather(t, i),
                                          dtype=jnp.float32))

    t_rand = timed(f_single, table, idx_rand)
    t_single = timed(f_single, table, idx2)
    t_pair = timed(f_pair, table, m)
    print(f"single fetch, random idx : {t_rand*1e3:8.2f} ms "
          f"({t_rand/ (2*R) * 1e9:.2f} ns/corner)")
    print(f"single fetch, paired idx : {t_single*1e3:8.2f} ms "
          f"({t_single/(2*R)*1e9:.2f} ns/corner)")
    print(f"pair fetch               : {t_pair*1e3:8.2f} ms "
          f"({t_pair /(2*R)*1e9:.2f} ns/corner)  "
          f"speedup vs random {t_rand/t_pair:.2f}x")

    # numerical check (full outputs, off the clock)
    a = np.asarray(jax.jit(single_gather)(table, idx2)).reshape(-1, 2)
    b = np.asarray(jax.jit(pair_gather)(table, m))
    print("pair == single:", bool(np.array_equal(a, b)))

    # backward: scatter-add F=1 x 2R records vs F=2 x R records (XLA path)
    g1 = jax.jit(lambda k: jax.random.normal(k, (2 * R,), jnp.float32))(km)

    def bwd_single(idx, g):
        return jnp.sum(jnp.zeros((T,), jnp.float32).at[idx].add(g))

    def bwd_pair(m, g):
        return jnp.sum(jnp.zeros((T // 2, 2), jnp.float32)
                       .at[m].add(g.reshape(-1, 2)))

    t_b1 = timed(jax.jit(bwd_single), idx_rand, g1)
    t_b2 = timed(jax.jit(bwd_pair), m, g1)
    print(f"xla scatter F=1 2R rec   : {t_b1*1e3:8.2f} ms")
    print(f"xla scatter F=2  R rec   : {t_b2*1e3:8.2f} ms  "
          f"speedup {t_b1/t_b2:.2f}x")


if __name__ == "__main__":
    main()
