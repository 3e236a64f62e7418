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


def eval_chunk(cfg) -> int:
    """Eval-time ray chunk: ``eval_render_chunk`` when set, else
    ``render_chunk`` (the reference uses one 4096 chunk for both,
    ``lib/config/config.py:29,281``; eval is forward-only so the device
    can usually afford a fatter chunk — fewer lax.map iterations paying
    the per-chunk KNN/sort/selection fixed costs)."""
    c = int(cfg.get("eval_render_chunk", -1))
    return c if c > 0 else int(cfg.render_chunk)


MAP_KEYS = ("rgb_map", "acc_map")
TELEMETRY_KEYS = ("cull_overflow", "part_overflow", "cull_need", "part_need")


def _lean_gather_specs(mspec: inb.ModelSpec) -> inb.ModelSpec:
    """Flip the DEFORMER grid to plain (non-wide) scalar gathers: its
    per-column wide-row (R, 16) intermediate is what XLA materializes
    (tile-padded 8x -> the 33.9 GB allocation) at eval chunks > 4096.
    The part grids keep wide gathers — their intermediates fuse, and
    flipping them too measured 2x slower eval (60.3 s vs 29.1 s per 512^2
    frame at chunk 16384; docs/PERF.md round 5)."""
    return mspec._replace(
        deformer=mspec.deformer._replace(
            embed=mspec.deformer.embed._replace(wide_gather=False)))


def make_chunked_renderer(mspec: inb.ModelSpec, rspec: RenderSpec,
                          chunk: int):
    """jit(params, ray batch (Npad,...), meta) -> rgb/acc maps (Npad,...)
    plus worst-chunk budget telemetry (overflow fractions + needed budget
    fractions; see AutoBudgetRenderer)."""
    if chunk > 4096:
        mspec = _lean_gather_specs(mspec)

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
            return {k: ret[k] for k in MAP_KEYS + TELEMETRY_KEYS}

        chunked = {k: rays[k].reshape(nc, chunk, *rays[k].shape[1:])
                   for k in RAY_KEYS}
        out = jax.lax.map(one_chunk, chunked)
        res = {k: out[k].reshape(n, *out[k].shape[2:]) for k in MAP_KEYS}
        for k in ("cull_overflow", "part_overflow", "cull_need"):
            res[k] = jnp.max(out[k])
        res["part_need"] = jnp.max(out["part_need"], axis=0)   # (P,)
        return res

    return render_image


def render_full_image(render_fn, params, item: Dict[str, np.ndarray],
                      meta_keys, chunk: int) -> Dict[str, np.ndarray]:
    """Pad host rays to a power-of-two chunk count, render, unpad.

    The ray count (mask_at_box hits) differs per frame; padding to the
    exact next chunk multiple gave every frame its own jit program — at
    ~40 s per remote compile that, not render compute, dominated eval
    wall-clock (round-4 rehearsal: ~74 s/frame).  Power-of-two chunk-count
    buckets mean a whole eval shares 1-2 programs for <=2x padded compute
    on the worst frame.  Padding wraps the real rays (not edge-dup): a
    chunk of 4096 copies of one ray concentrates all samples in one part
    and would spuriously inflate the overflow telemetry that sizes eval
    budgets.
    """
    n = item["ray_o"].shape[0]
    nc = max(1, -(-n // chunk))
    npad = (1 << (nc - 1).bit_length()) * chunk
    idx = np.arange(npad) % n
    rays = {k: jnp.asarray(np.asarray(item[k])[idx]) for k in RAY_KEYS}
    meta = {k: jnp.asarray(item[k]) for k in meta_keys if k in item}
    out = render_fn(params, rays, meta)
    return {k: np.asarray(v)[:n] if k in MAP_KEYS else np.asarray(v)
            for k, v in out.items()}


def raise_budgets(mspec: inb.ModelSpec, cull_need: float, part_need,
                  headroom: float = 1.15) -> inb.ModelSpec:
    """Budgets sized to the worst observed demand, with headroom.

    ``cull_need`` = surviving fraction of all samples; ``part_need`` = per
    part, flagged fraction of the cull budget K (both from the model's
    telemetry).  Never lowers an existing budget.
    """
    new_cull = min(1.0, max(mspec.cull_frac, float(cull_need) * headroom))
    old_t = np.array([min(mspec.part_frac * s, 1.0)
                      for s in mspec.part_budget_scales])
    need_t = np.minimum(np.asarray(part_need, np.float64) * headroom, 1.0)
    t = np.maximum(old_t, need_t)
    pf = float(t.max())
    scales = tuple(float(x) for x in t / max(pf, 1e-9))
    return mspec._replace(cull_frac=new_cull, part_frac=pf,
                          part_budget_scales=scales)


def merge_budgets(mspec: inb.ModelSpec, cull_frac: float, part_frac: float,
                  scales) -> inb.ModelSpec:
    """Elementwise-max merge of stored eval budgets into ``mspec``
    (same never-lower semantics as raise_budgets, but the stored values
    are final budget fractions, not telemetry needs)."""
    old_t = np.array([min(mspec.part_frac * s, 1.0)
                      for s in mspec.part_budget_scales])
    new_t = np.array([min(float(part_frac) * float(s), 1.0) for s in scales])
    t = np.maximum(old_t, new_t)
    pf = float(t.max())
    return mspec._replace(
        cull_frac=min(1.0, max(mspec.cull_frac, float(cull_frac))),
        part_frac=pf,
        part_budget_scales=tuple(float(x) for x in t / max(pf, 1e-9)))


class AutoBudgetRenderer:
    """Full-image renderer with a no-dropped-samples guarantee.

    Training budgets drop the farthest threshold-passing points on overflow
    (graceful there); the reference computes EVERY surviving sample at eval
    (``lib/networks/renderer/inb_renderer.py:217-237``).  This renderer
    starts at the trained budgets, checks the model's overflow telemetry on
    every image, and on any overflow raises the budgets to the measured
    demand (one re-jit) and re-renders — so eval metrics are invariant to
    the training budget config (tested: tests/test_eval_overflow.py).

    Raised budgets are persisted to ``persist_path`` (eval_budgets.json in
    the model dir) so later evals/vis runs start already-raised — the
    round-4 rehearsal paid a re-render + re-jit on the first frame of
    EVERY eval because each run re-discovered the same raise.
    """

    def __init__(self, mspec: inb.ModelSpec, rspec: RenderSpec, chunk: int,
                 max_raises: int = 4, persist_path: Optional[str] = None):
        self.persist_path = persist_path
        if persist_path:
            import glob
            import json
            import os
            # merge rank 0's file AND any per-rank sidecars: in multi-host
            # eval every process persists its own raises (no collective in
            # the render program to broadcast through), so no rank re-pays
            # a raise another rank already discovered (ADVICE r4)
            for path in sorted(glob.glob(persist_path + "*")):
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    saved = json.load(f)
                mspec = merge_budgets(mspec, saved["cull_frac"],
                                      saved["part_frac"], saved["scales"])
                print(f"eval: loaded raised budgets from {path} "
                      f"(cull_frac={mspec.cull_frac:.3f} "
                      f"part_frac={mspec.part_frac:.3f})")
        self.mspec = mspec
        self.rspec = rspec
        self.chunk = chunk
        self.max_raises = max_raises
        self.render_fn = make_chunked_renderer(mspec, rspec, chunk)

    def _save(self) -> None:
        if not self.persist_path:
            return
        try:
            rank = jax.process_index()
        except Exception:
            rank = 0
        import json
        import os
        path = self.persist_path if rank == 0 else \
            f"{self.persist_path}.rank{rank}"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"cull_frac": self.mspec.cull_frac,
                       "part_frac": self.mspec.part_frac,
                       "scales": list(self.mspec.part_budget_scales)}, f)

    def __call__(self, params, item: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        out = render_full_image(self.render_fn, params, item, META_KEYS,
                                self.chunk)
        for _ in range(self.max_raises):
            if out["cull_overflow"] <= 0 and out["part_overflow"] <= 0:
                return out
            self.mspec = raise_budgets(self.mspec, out["cull_need"],
                                       out["part_need"])
            self._save()
            print(f"eval: budget overflow (cull {float(out['cull_overflow']):.4f}, "
                  f"part {float(out['part_overflow']):.4f}) -> raised to "
                  f"cull_frac={self.mspec.cull_frac:.3f} "
                  f"part_frac={self.mspec.part_frac:.3f}; re-rendering")
            self.render_fn = make_chunked_renderer(self.mspec, self.rspec,
                                                   self.chunk)
            out = render_full_image(self.render_fn, params, item, META_KEYS,
                                    self.chunk)
        if out["cull_overflow"] > 0 or out["part_overflow"] > 0:
            print(f"eval WARNING: overflow persists after {self.max_raises} "
                  f"budget raises (cull {float(out['cull_overflow']):.4f}, "
                  f"part {float(out['part_overflow']):.4f})")
        return out


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

    import os
    chunk = eval_chunk(cfg)
    renderer = AutoBudgetRenderer(
        mspec, rspec, chunk,
        persist_path=os.path.join(cfg.trained_model_dir, "eval_budgets.json"))
    evaluator = Evaluator(result_dir=cfg.result_dir,
                          lpips_weights=cfg.get("lpips_weights", ""),
                          save_images=save_images,
                          eval_part=cfg.get("eval_part", ""),
                          partnames=list(mspec.partnames),
                          test_full=cfg.get("test_full", True))

    import time
    for idx in indices:
        t0 = time.time()
        item = ds.get_item(idx)
        t1 = time.time()
        out = renderer(params, item)   # returns host arrays (fetch included)
        t2 = time.time()
        evaluator.evaluate(out["rgb_map"], item["rgb"], item["mask_at_box"],
                           int(item["H"]), int(item["W"]),
                           frame_index=int(item["frame_index"]),
                           view_index=int(item["cam_ind"]),
                           sem_mask=item.get("sem_mask"), epoch=epoch)
        print(f"eval item {idx} ({item['ray_o'].shape[0]} rays): "
              f"data {t1 - t0:.2f}s  render {t2 - t1:.2f}s  "
              f"metrics {time.time() - t2:.2f}s", flush=True)
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
