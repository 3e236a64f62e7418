"""Profile one full-image eval render and dump an XLA trace.

Usage (on the TPU):
    python tools/profile_eval.py --cfg_file configs/inb/inb_fake_big.yaml \
        [--trace /tmp/eval_trace] [--item 0]
    python tools/analyze_trace.py /tmp/eval_trace

Renders the item twice: once to compile + settle budgets, once inside
``jax.profiler.trace`` with a value fetch (the axon tunnel ignores
``block_until_ready``).  Prints the warm render wall-clock.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", default="configs/inb/inb_fake_big.yaml")
    p.add_argument("--trace", default="/tmp/eval_trace",
                   help="trace dir; pass '' to skip tracing")
    p.add_argument("--item", type=int, default=0)
    p.add_argument("--repeats", type=int, default=1,
                   help="untraced timed renders before the traced one")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from instant_nvr_tpu.config import make_cfg
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
    from instant_nvr_tpu.eval.runner import AutoBudgetRenderer, eval_chunk
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.renderer.inb_renderer import make_render_spec
    from instant_nvr_tpu.train.checkpoint import load_weights

    cfg = make_cfg(args.cfg_file, args.opts).replace(eval=True)
    mspec = inb.build_model_spec(cfg)
    params = jax.jit(inb.init_params, static_argnums=1)(
        jax.random.key(0), mspec)
    params = load_weights(cfg.trained_model_dir, params)

    ds = TPoseDataset(cfg, "test")
    item = ds.get_item(args.item)
    renderer = AutoBudgetRenderer(
        mspec, make_render_spec(cfg), eval_chunk(cfg),
        persist_path=os.path.join(cfg.trained_model_dir,
                                  "eval_budgets.json"))

    out = renderer(params, item)            # compile + budget settle
    print(f"warmup done (rgb mean {float(out['rgb_map'].mean()):.4f})")

    n = item["ray_o"].shape[0]
    for i in range(args.repeats):
        t0 = time.time()
        out = renderer(params, item)        # AutoBudgetRenderer fetches
        dt = time.time() - t0
        print(f"warm render (untraced): {dt:.2f}s for {n} rays "
              f"({n / dt:.0f} rays/s)")

    if args.trace:
        t0 = time.time()
        with jax.profiler.trace(args.trace):
            out = renderer(params, item)
        dt = time.time() - t0
        print(f"warm render (traced): {dt:.2f}s for {n} rays "
              f"({n / dt:.0f} rays/s) -> trace at {args.trace}")


if __name__ == "__main__":
    main()
