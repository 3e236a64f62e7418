#!/usr/bin/env python
"""Train CLI.

Usage mirrors the reference (``train_net.py:209-240``):

    python train_net.py --cfg_file configs/inb/inb_377.yaml [key value ...]

Flags: --test (run eval after training), --dry_run (print the parameter
inventory and exit), --no_resume (start fresh).
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", default="configs/inb/inb_377.yaml")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="capture a windowed jax.profiler trace")
    parser.add_argument("--profile_window", default="20:36",
                        help="step window 'start:stop' for --profile "
                             "(reference torch.profiler schedule, "
                             "train_net.py:26-46)")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax debug_nans (reference torch detect_anomaly)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize()")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from instant_nvr_tpu.config import make_cfg
    cfg = make_cfg(args.cfg_file, args.opts)

    import jax
    if args.distributed:
        jax.distributed.initialize()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    if cfg.get("fix_random", False):
        # determinism switch (reference train_net.fix_random:49-57): jax is
        # deterministic given fixed PRNG keys; also pin XLA determinism.
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_gpu_deterministic_ops=true"
    from instant_nvr_tpu.models import inb

    if args.dry_run:
        mspec = inb.build_model_spec(cfg)
        params = inb.init_params(jax.random.key(0), mspec)
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            n = 1
            for d in leaf.shape:
                n *= d
            total += n
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            print(f"{name:60s} {str(leaf.shape):>20s} {n:>12,d}")
        print(f"total parameters: {total:,d}")
        return

    from instant_nvr_tpu.train.loop import train
    profile_window = None
    if args.profile:
        lo, hi = (int(x) for x in args.profile_window.split(":"))
        profile_window = (lo, hi)
    state = train(cfg, resume=not args.no_resume,
                  profile_window=profile_window)

    if args.test:
        from instant_nvr_tpu.eval.runner import evaluate_dataset
        from instant_nvr_tpu.renderer.inb_renderer import make_render_spec
        mspec = inb.build_model_spec(cfg)
        evaluate_dataset(cfg.replace(eval=True), mspec, make_render_spec(cfg),
                         state.params, split="test")


if __name__ == "__main__":
    main()
