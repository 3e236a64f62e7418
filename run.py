#!/usr/bin/env python
"""Eval / vis / utility CLI (type-dispatched like the reference ``run.py``).

    python run.py --type evaluate --cfg_file configs/inb/inb_377.yaml
    python run.py --type vis      ...   # novel-view rendering to video frames
    python run.py --type tmesh    ...   # canonical-pose mesh via marching cubes
    python run.py --type tdmesh   ...   # deformed canonical mesh
    python run.py --type network  ...   # forward timing harness
    python run.py --type dataset  ...   # data-pipeline smoke iteration
"""
import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", default="configs/inb/inb_377.yaml")
    p.add_argument("--type", default="evaluate")
    p.add_argument("--epoch", type=int, default=-1)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def _load(cfg):
    import jax
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.train.checkpoint import load_weights
    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(0), mspec)
    try:
        params = load_weights(cfg.trained_model_dir, params)
        print(f"loaded weights from {cfg.trained_model_dir}")
    except FileNotFoundError:
        print("WARNING: no checkpoint found, using random init")
    return mspec, params


def run_evaluate(cfg):
    from instant_nvr_tpu.eval.runner import evaluate_dataset
    from instant_nvr_tpu.renderer.inb_renderer import make_render_spec
    cfg = cfg.replace(eval=True)
    mspec, params = _load(cfg)
    evaluate_dataset(cfg, mspec, make_render_spec(cfg), params, split="test",
                     save_images=not cfg.get("fast_eval", False))


def run_dataset(cfg):
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
    import numpy as np
    ds = TPoseDataset(cfg, "train")
    t0 = time.time()
    for i in range(min(len(ds), 8)):
        item = ds.get_item(i, rng=np.random.default_rng(i))
        print(f"item {i}: rays={item['ray_o'].shape} H={item['H']} W={item['W']}")
    print(f"{min(len(ds), 8)} items in {time.time() - t0:.2f}s")


def run_network(cfg):
    """Forward-pass timing harness (reference run.py:16-40).

    Times the ACTUAL dataset loader's output like the reference does (it
    iterates the real data loader); falls back to a synthetic batch when the
    configured dataset is not on disk.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
    from instant_nvr_tpu.renderer.inb_renderer import make_render_spec, render_rays
    from instant_nvr_tpu.train.loop import DEVICE_KEYS
    mspec, params = _load(cfg)
    rspec = make_render_spec(cfg)
    try:
        ds = TPoseDataset(cfg, "train")
        item = ds.get_item(0, rng=np.random.default_rng(0))
        item["reg_dist_weight"] = np.float32(cfg.get("reg_dist_weight", 0.1))
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if k in DEVICE_KEYS}
        n_rays = int(batch["ray_o"].shape[0])
        print(f"timing a real dataset batch ({n_rays} rays)")
    except FileNotFoundError as e:
        from instant_nvr_tpu.datasets import synthetic
        print(f"dataset not found ({e}); timing a synthetic batch")
        scene = synthetic.make_scene()
        view = synthetic.render_gt(scene, H=128, W=128)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic.make_batch(scene, view, n_rays=cfg.N_rand).items()}
        n_rays = cfg.N_rand
    fn = jax.jit(lambda p, b, r: render_rays(mspec, rspec, p, b, False, r)["rgb_map"])
    rng = jax.random.key(0)
    out = fn(params, batch, rng)
    float(out.sum())   # value fetch: block_until_ready does not wait for
    t0 = time.time()   # completion through the remote tunnel
    n = 20
    for i in range(n):
        out = fn(params, batch, rng)
    float(out.sum())
    dt = (time.time() - t0) / n
    print(f"forward: {dt * 1000:.2f} ms  ({n_rays / dt:.0f} rays/s)")


def run_vis(cfg):
    """Render test-split views to pngs (reference run_vis, run.py:108-135)."""
    from instant_nvr_tpu.eval.runner import evaluate_dataset
    from instant_nvr_tpu.renderer.inb_renderer import make_render_spec
    cfg = cfg.replace(eval=True)
    mspec, params = _load(cfg)
    evaluate_dataset(cfg, mspec, make_render_spec(cfg), params, split="test",
                     save_images=True)


def run_bullet(cfg):
    """Bullet-time spiral novel views + video (reference run_other('bullet'))."""
    from instant_nvr_tpu.eval.visualizer import render_novel_views
    mspec, params = _load(cfg)
    render_novel_views(cfg, mspec, params)


def run_exportdecoder(cfg):
    """Export per-part decoder (MLP) weights (reference run.py:42-58)."""
    import numpy as np
    import jax
    mspec, params = _load(cfg)
    out = os.path.join(cfg.result_dir, "decoders")
    os.makedirs(out, exist_ok=True)
    flat = {}
    for j, layer in enumerate(params["occ"]):
        flat[f"occ_{j}_w"] = np.asarray(layer["w"])
        flat[f"occ_{j}_b"] = np.asarray(layer["b"])
    for key, layers in params["rgb"].items():
        for j, layer in enumerate(layers):
            flat[f"rgb_{key}_{j}_w"] = np.asarray(layer["w"])
            flat[f"rgb_{key}_{j}_b"] = np.asarray(layer["b"])
    flat["latent"] = np.asarray(params["latent"])
    np.savez(os.path.join(out, "decoders.npz"), **flat)
    print(f"wrote {out}/decoders.npz")


def run_exportpart(cfg):
    """Export per-part hash tables (reference run_exportpart)."""
    import numpy as np
    mspec, params = _load(cfg)
    out = os.path.join(cfg.result_dir, "parts")
    os.makedirs(out, exist_ok=True)
    for name, tbl in params["embed"].items():
        np.savez(os.path.join(out, f"{name}.npz"),
                 dense=np.asarray(tbl["dense"]), hash=np.asarray(tbl["hash"]))
    print(f"wrote {out}/<part>.npz x{len(params['embed'])}")


def run_prune(cfg):
    """Write the occupancy grid to result_dir/latest.npy — the geometry-
    pruning artifact the dataset's ``prune_using_geo`` sampling consumes
    (reference run.py:137-164 + tpose_dataset.py:512-527)."""
    import numpy as np
    from instant_nvr_tpu.eval.mesh import occupancy_grid
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
    mspec, params = _load(cfg)
    ds = TPoseDataset(cfg, "test")
    item = ds.get_item(0)
    occ, _ = occupancy_grid(cfg, mspec, params, item, deformed=False, res=128)
    os.makedirs(cfg.result_dir, exist_ok=True)
    np.save(os.path.join(cfg.result_dir, "latest.npy"), occ)
    print(f"wrote {cfg.result_dir}/latest.npy")


def run_tmesh(cfg, deformed=False):
    from instant_nvr_tpu.eval.mesh import extract_mesh
    mspec, params = _load(cfg)
    out = os.path.join(cfg.result_dir, "tdmesh" if deformed else "tmesh")
    extract_mesh(cfg, mspec, params, out, deformed=deformed)


def main():
    args = parse_args()
    from instant_nvr_tpu.config import make_cfg
    cfg = make_cfg(args.cfg_file, args.opts)
    if args.epoch >= 0:
        cfg = cfg.replace(test=cfg.test.replace(epoch=args.epoch))
    if cfg.get("auto_budget", False):
        # same budget probe as training, so eval/vis/export paths build the
        # model spec with the budgets the checkpoint was trained at
        from instant_nvr_tpu.models.budget import apply_auto_budget
        cfg = apply_auto_budget(cfg)

    dispatch = {
        "evaluate": run_evaluate,
        "dataset": run_dataset,
        "network": run_network,
        "vis": run_vis,
        "bullet": run_bullet,
        "prune": run_prune,
        "exportdecoder": run_exportdecoder,
        "exportpart": run_exportpart,
        "tmesh": lambda c: run_tmesh(c, deformed=False),
        "tdmesh": lambda c: run_tmesh(c, deformed=True),
    }
    if args.type not in dispatch:
        raise SystemExit(f"unknown --type {args.type}; one of {list(dispatch)}")
    dispatch[args.type](cfg)


if __name__ == "__main__":
    main()
