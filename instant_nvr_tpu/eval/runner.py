"""Full-image evaluation: chunked in-jit rendering + metric accumulation.

Rebuild of ``run.py:61-90`` (run_evaluate) and the renderer's eval chunking
(``inb_renderer.py:217-237``): rays are padded to a multiple of
``render_chunk`` and rendered with ``lax.map`` *inside* one jit — one
compile, no per-chunk dispatch (the reference pays a Python loop + host
sync per 4096-ray chunk).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.tpose_dataset import TPoseDataset
from ..datasets.samplers import FrameSampler, shard_indices
from ..models import inb
from ..renderer.inb_renderer import RenderSpec, render_rays
from .evaluator import Evaluator

RAY_KEYS = ("ray_o", "ray_d", "near", "far")


def make_chunked_renderer(mspec: inb.ModelSpec, rspec: RenderSpec,
                          chunk: int):
    """jit(params, ray batch (Npad,...), meta) -> rgb/acc maps (Npad,...).

    Eval uses inflated point budgets: training-time budgets drop the farthest
    points on overflow (graceful there), but eval should compute every
    surviving sample like the reference does.
    """
    mspec = mspec._replace(
        cull_frac=max(mspec.cull_frac, min(0.5, mspec.cull_frac * 2.0)),
        part_frac=max(mspec.part_frac, min(0.75, mspec.part_frac * 1.5)))

    @partial(jax.jit, static_argnames=())
    def render_image(params, rays: Dict[str, jnp.ndarray],
                     meta: Dict[str, jnp.ndarray]):
        n = rays["ray_o"].shape[0]
        nc = n // chunk

        def one_chunk(chunk_rays):
            b = dict(meta)
            b.update(chunk_rays)
            ret = render_rays(mspec, rspec._replace(perturb=False), params, b,
                              train=False, rng=jax.random.key(0))
            return {"rgb_map": ret["rgb_map"], "acc_map": ret["acc_map"]}

        chunked = {k: rays[k].reshape(nc, chunk, *rays[k].shape[1:])
                   for k in RAY_KEYS}
        out = jax.lax.map(one_chunk, chunked)
        return {k: v.reshape(n, *v.shape[2:]) for k, v in out.items()}

    return render_image


def render_full_image(render_fn, params, item: Dict[str, np.ndarray],
                      meta_keys, chunk: int) -> Dict[str, np.ndarray]:
    """Pad host rays to a chunk multiple, render, unpad."""
    n = item["ray_o"].shape[0]
    pad = (-n) % chunk
    rays = {}
    for k in RAY_KEYS:
        v = np.asarray(item[k])
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        rays[k] = jnp.asarray(np.pad(v, widths, mode="edge"))
    meta = {k: jnp.asarray(item[k]) for k in meta_keys if k in item}
    out = render_fn(params, rays, meta)
    return {k: np.asarray(v)[:n] for k, v in out.items()}


META_KEYS = ("A", "big_A", "pbw", "pbw_sizes", "pbounds", "tbounds", "tuv",
             "tuv_sizes", "part_pts", "part_pbw", "lengths2", "part_bounds",
             "R", "Th", "latent_index", "frame_dim")


def evaluate_dataset(cfg, mspec, rspec, params, split: str = "test",
                     epoch: int = -1, max_items: Optional[int] = None,
                     save_images: bool = True) -> Dict[str, float]:
    ds = TPoseDataset(cfg, split)
    interval = cfg[split].get("frame_sampler_interval", 1) if split in cfg else 1
    sampler = FrameSampler(len(ds), ds.num_cams, interval)
    indices = list(sampler)
    if max_items:
        indices = indices[:max_items]
    # multi-host: each process renders its own item shard; metrics are
    # allgathered before summarize so the summary covers the full split
    n_total = len(indices)
    indices = shard_indices(indices, jax.process_index(), jax.process_count(),
                            pad=False)

    chunk = cfg.render_chunk
    render_fn = make_chunked_renderer(mspec, rspec, chunk)
    evaluator = Evaluator(result_dir=cfg.result_dir,
                          lpips_weights=cfg.get("lpips_weights", ""),
                          save_images=save_images,
                          eval_part=cfg.get("eval_part", ""),
                          partnames=list(mspec.partnames),
                          test_full=cfg.get("test_full", True))

    for idx in indices:
        item = ds.get_item(idx)
        out = render_full_image(render_fn, params, item, META_KEYS, chunk)
        evaluator.evaluate(out["rgb_map"], item["rgb"], item["mask_at_box"],
                           int(item["H"]), int(item["W"]),
                           frame_index=int(item["frame_index"]),
                           view_index=int(item["cam_ind"]),
                           sem_mask=item.get("sem_mask"), epoch=epoch)
    if jax.process_count() > 1:
        _allgather_metrics(evaluator, n_total)
        if jax.process_index() != 0:
            evaluator.result_dir = ""   # rank 0 writes the merged metrics.npy
    return evaluator.summarize(epoch=epoch)


def _allgather_metrics(evaluator: Evaluator, n_total: int) -> None:
    """Merge per-process metric shards so metrics.npy / the summary cover the
    FULL split (reference analog: one process evaluates everything,
    lib/evaluators/if_nerf.py:146-180; here each process rendered only its
    item shard).  Shards can be uneven, so each process also gathers its
    count and padding is dropped by COUNT, not by value — a genuine NaN
    metric (e.g. zero-variance SSIM crop) must survive the merge exactly
    as it would single-process."""
    from jax.experimental import multihost_utils
    cap = -(-n_total // jax.process_count())
    for attr in ("mse", "psnr", "ssim", "lpips"):
        xs = getattr(evaluator, attr)
        a = np.zeros(cap + 1, np.float32)
        a[0] = len(xs)
        a[1:1 + len(xs)] = np.asarray(xs, np.float32)
        g = np.asarray(multihost_utils.process_allgather(a))
        g = g.reshape(jax.process_count(), cap + 1)
        merged = [float(v) for row in g for v in row[1:1 + int(row[0])]]
        setattr(evaluator, attr, merged)
