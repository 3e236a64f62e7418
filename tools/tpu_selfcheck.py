#!/usr/bin/env python
"""On-hardware self-check: run on a real TPU to validate kernels + the step.

The CPU test suite can't catch hardware-only issues (example found this way:
Mosaic lowered the KNN distance matmul to bf16 MXU passes — exact in
interpret mode, wrong neighbor distances on silicon).  Run this after any
kernel/toolchain change:

    JAX_COMPILATION_CACHE_DIR=~/.jax_cache python tools/tpu_selfcheck.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}")
    failures = []

    # 1. pallas KNN == XLA KNN
    from instant_nvr_tpu.ops.knn import (knn_blend_weights_multiassign,
                                         knn_blend_weights_multiassign_pallas)
    rng = np.random.default_rng(0)
    P, M, C = 5, 2688, 4096
    lengths = jnp.asarray(np.array([2688, 2000, 800, 600, 600], np.int32))
    pts = jnp.asarray(rng.normal(size=(P, M, 3)).astype(np.float32))
    pbw = jnp.asarray(rng.uniform(size=(P, M, 24)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(C, 3)).astype(np.float32) * 0.5)
    b = np.asarray(jax.jit(lambda x: knn_blend_weights_multiassign(
        x, pts, pbw, lengths, chunk=2048))(q))
    for fused in (False, True):
        a = np.asarray(jax.jit(lambda x: knn_blend_weights_multiassign_pallas(
            x, pts, pbw, lengths, fused=fused))(q))
        agree = np.isclose(a, b, rtol=1e-3, atol=1e-4).mean()
        tag = "fused" if fused else "topk+gather"
        print(f"[1] pallas-vs-xla KNN agreement ({tag}): {agree:.4f}")
        if agree < 0.995:
            failures.append(
                f"pallas KNN ({tag}) disagrees with XLA on this hardware")

    # 1b. compiled segmented scatter-add == numpy oracle (the Mosaic kernel
    #     can diverge from interpret mode on silicon)
    from instant_nvr_tpu.ops.pallas.segmented_scatter import (
        TILE_ROWS, segmented_scatter_add)
    Lh, N8 = 4, 8192 * 8
    Th = 4 * 1048576
    T_pad = ((Th + TILE_ROWS - 1) // TILE_ROWS) * TILE_ROWS
    sk = np.concatenate([rng.integers(i * 1048576, (i + 1) * 1048576, N8)
                         for i in range(Lh)]).astype(np.int32)
    spay = rng.normal(size=(Lh * N8, 16)).astype(np.float32)
    got = np.asarray(segmented_scatter_add(
        jnp.asarray(sk), jnp.asarray(spay, jnp.bfloat16), T_pad,
        n_levels=Lh), np.float32)
    ref = np.zeros((T_pad, 16), np.float32)
    np.add.at(ref, sk, spay.astype(np.float32))
    serr = np.abs(got - ref).max()
    print(f"[1b] segmented scatter-add max err vs numpy: {serr:.4f}")
    if serr > 0.05 * max(1.0, np.abs(ref).max()):
        failures.append("segmented_scatter_add wrong on this hardware")

    # 1b-scalar. F=1 payload (the scalar-table mode: one bf16 passenger)
    spay1 = rng.normal(size=(Lh * N8, 1)).astype(np.float32)
    got1 = np.asarray(segmented_scatter_add(
        jnp.asarray(sk), jnp.asarray(spay1, jnp.bfloat16), T_pad,
        n_levels=Lh), np.float32)
    ref1 = np.zeros((T_pad, 1), np.float32)
    np.add.at(ref1, sk, spay1.astype(np.float32))
    s1err = np.abs(got1 - ref1).max()
    print(f"[1b-scalar] F=1 scatter-add max err vs numpy: {s1err:.4f}")
    if s1err > 0.05 * max(1.0, np.abs(ref1).max()):
        failures.append("segmented_scatter_add F=1 wrong on this hardware")

    # 1c. compiled one-hot small-table scatter == numpy oracle
    from instant_nvr_tpu.ops.pallas.onehot_scatter import onehot_scatter_add
    To, Ro = 12276, 1_081_344
    ko = rng.integers(0, To, Ro).astype(np.int32)
    po = rng.normal(size=(Ro, 2)).astype(np.float32)
    got_o = np.asarray(onehot_scatter_add(
        jnp.asarray(ko), jnp.asarray(po, jnp.bfloat16), To, (0, To)),
        np.float32)
    ref_o = np.zeros((To, 2), np.float32)
    np.add.at(ref_o, ko, jnp.asarray(po, jnp.bfloat16).astype(np.float32))
    oerr = np.abs(got_o - ref_o).max() / (np.abs(ref_o).max() + 1e-6)
    print(f"[1c] one-hot scatter-add rel err vs numpy: {oerr:.4f}")
    if oerr > 0.05:
        failures.append("onehot_scatter_add wrong on this hardware")

    # 1c-scalar. F=1 one-hot payload (reachable from _scalar_gather_bwd for
    # small scalar tables with many records) — interpret mode passing does
    # not prove the Mosaic compile is right on silicon
    po1 = rng.normal(size=(Ro, 1)).astype(np.float32)
    got_o1 = np.asarray(onehot_scatter_add(
        jnp.asarray(ko), jnp.asarray(po1, jnp.bfloat16), To, (0, To)),
        np.float32)
    ref_o1 = np.zeros((To, 1), np.float32)
    np.add.at(ref_o1, ko, jnp.asarray(po1, jnp.bfloat16).astype(np.float32))
    o1err = np.abs(got_o1 - ref_o1).max() / (np.abs(ref_o1).max() + 1e-6)
    print(f"[1c-scalar] F=1 one-hot scatter-add rel err vs numpy: {o1err:.4f}")
    if o1err > 0.05:
        failures.append("onehot_scatter_add F=1 wrong on this hardware")

    # 2. f32 matmul precision sanity (MXU truncation detector)
    x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    got = np.asarray(jax.jit(lambda m: m @ m)(x))
    want = np.asarray(x) @ np.asarray(x)
    err = np.abs(got - want).max()
    print(f"[2] f32 matmul max err (default precision): {err:.2e}"
          f" {'(bf16-truncating MXU: use precision=HIGHEST where it matters)' if err > 1e-3 else ''}")

    # 3. flagship train step: finite loss, decreasing over 10 steps
    from __graft_entry__ import _flagship
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.train.state import TrainState, make_optimizer
    from instant_nvr_tpu.train.step import make_train_step
    cfg, mspec, rspec, lw, batch, _ = _flagship(tiny=False)
    params = jax.jit(lambda k: inb.init_params(k, mspec))(jax.random.key(0))
    opt, _s = make_optimizer(cfg)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
    step = jax.jit(make_train_step(mspec, rspec, lw, opt))
    state, stats = step(state, batch, jax.random.key(0))
    first = float(stats["loss"])
    t0 = time.perf_counter()
    for i in range(10):
        state, stats = step(state, batch, jax.random.key(i + 1))
    last = float(stats["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"[3] train step: loss {first:.4f} -> {last:.4f}, {dt * 1000:.1f} ms/step, "
          f"cull_overflow {float(stats['cull_overflow']):.2f}")
    if not np.isfinite(last) or last >= first:
        failures.append("train loss not decreasing / not finite")

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("\nall self-checks passed")


if __name__ == "__main__":
    main()
