"""The training loop: epochs, stages, prefetch, eval/checkpoint cadence.

Rebuild of ``train_net.py:78-180`` + ``lib/train/trainers/trainer.py``:
  - per-epoch stage schedule (derived config views, not global mutation)
  - ``ep_iter`` steps per epoch over a prefetching host pipeline
  - periodic console/TensorBoard logging with ETA
  - checkpoint every ``save_latest_ep`` (latest) / ``save_ep`` (numbered)
  - validation every ``eval_ep`` via the chunked full-image renderer
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..datasets.prefetch import Prefetcher
from ..datasets.samplers import IterationBasedSampler
from ..datasets.tpose_dataset import TPoseDataset

from ..models import inb
from ..models.lpips import perceptual_loss
from ..parallel import mesh as pmesh
from ..renderer.inb_renderer import make_render_spec
from .checkpoint import load_checkpoint, save_checkpoint
from .recorder import Recorder
from .stages import stage_for_epoch
from .state import TrainState, create_train_state, make_optimizer
from .step import make_loss_weights, make_train_step

# batch keys the jitted step consumes (everything else stays on host)
DEVICE_KEYS = ("rgb", "ray_o", "ray_d", "near", "far", "ray_mask", "occupancy",
               "A", "big_A", "pbw", "pbw_sizes", "pbounds", "tbounds", "tuv",
               "tuv_sizes", "part_pts", "part_pbw", "lengths2", "part_bounds",
               "R", "Th", "latent_index", "frame_dim", "reg_dist_weight")

# keys that are a pure function of the frame id (SMPL pose/meta) or fully
# static (canonical volumes): re-uploading them every step cost ~25 ms in
# patch mode (traced round 2) — the train loop caches their device copies
FRAME_KEYS = ("A", "big_A", "pbw", "pbw_sizes", "pbounds", "R", "Th",
              "part_pts", "part_pbw", "lengths2", "latent_index", "frame_dim")
STATIC_KEYS = ("tbounds", "tuv", "tuv_sizes", "part_bounds")


def device_batch(item: Dict[str, np.ndarray], reg_dist_weight: float,
                 shardings=None, cache: Optional[Dict] = None,
                 max_cached_frames: int = 16) -> Dict[str, jnp.ndarray]:
    item = dict(item)
    item["reg_dist_weight"] = np.float32(reg_dist_weight)
    frame = item.get("frame_index", None)

    def put(k, v):
        if shardings is not None:
            return pmesh.put_global(v, shardings[k])
        return jnp.asarray(v)

    if cache is not None and frame is not None:
        # LRU over frames: per-frame pbw volumes are multi-MB and a real
        # dataset has ~100 frames — bound the device-resident set
        lru = cache.setdefault("_frames", [])
        f = int(frame)
        if f in lru:
            lru.remove(f)
        lru.append(f)
        if len(lru) > max_cached_frames:
            evict = lru.pop(0)
            for k in FRAME_KEYS:
                cache.pop((k, evict), None)

    out = {}
    for k in DEVICE_KEYS:
        if k not in item:
            continue
        v = item[k]
        ck = None
        if cache is not None:
            if k in STATIC_KEYS:
                ck = (k,)
            elif k in FRAME_KEYS and frame is not None:
                ck = (k, int(frame))
        if ck is not None:
            if ck not in cache:
                cache[ck] = put(k, v)
            out[k] = cache[ck]
        else:
            out[k] = put(k, v)
    return out


def make_patch_loss_fn(cfg):
    """Image-space patch loss (LPIPS by default; inb_trainer.py:188-226)."""
    size = cfg.patch_size
    weights_path = cfg.get("lpips_weights", "")
    kind = "lpips"
    for k in ("lpips", "ssim", "fourier", "tv_image"):
        if cfg.get(f"use_{k}", False):
            kind = k
            break

    def fn(ret, batch):
        mask = batch["ray_mask"][:, None]
        img_pred = (ret["rgb_map"] * mask).reshape(size, size, 3)
        img_gt = (batch["rgb"] * mask).reshape(size, size, 3)
        if kind == "lpips":
            return perceptual_loss(img_pred, img_gt, weights_path)
        if kind == "ssim":
            from ..ops.ssim import ssim_loss
            mse = jnp.mean((img_pred - img_gt) ** 2)
            return 0.1 * (1.0 - ssim_loss(img_pred, img_gt)) + mse
        if kind == "fourier":
            fp = jnp.fft.fft2(jnp.mean(img_pred, -1))
            fg = jnp.fft.fft2(jnp.mean(img_gt, -1))
            floss = jnp.mean(jnp.abs(jnp.abs(fp) - jnp.abs(fg))) + \
                jnp.mean(jnp.abs(jnp.angle(fp) - jnp.angle(fg)))
            return 0.1 * floss + jnp.mean((img_pred - img_gt) ** 2)
        # tv_image
        tv = jnp.mean(jnp.abs(img_pred[1:] - img_pred[:-1])) + \
            jnp.mean(jnp.abs(img_pred[:, 1:] - img_pred[:, :-1]))
        return 0.01 * tv + jnp.mean((img_pred - img_gt) ** 2)

    return fn


def train(cfg: Config, resume: bool = True,
          max_epochs: Optional[int] = None,
          profile_window: Optional[tuple] = None) -> TrainState:
    """Run training.  ``profile_window=(lo, hi)`` captures a jax.profiler
    trace of post-compile steps [lo, hi) only — a whole-run trace is
    unusable for a 3,000-step run (reference uses a windowed
    skip/wait/warmup/active torch.profiler schedule, train_net.py:26-46)."""
    from ..models.budget import apply_auto_budget
    if not resume:
        # fresh run: drop budgets persisted by a previous training (the
        # reference's resume=False likewise wipes the model dir)
        import glob
        import os
        for name in ("budgets.json", "eval_budgets.json*"):
            for bpath in glob.glob(os.path.join(cfg.trained_model_dir, name)):
                if jax.process_index() == 0 and os.path.exists(bpath):
                    os.remove(bpath)
    cfg = apply_auto_budget(cfg)
    if jax.process_index() == 0:
        # reproducibility snapshot (reference train_net.py:80-82)
        from ..config import dump_cfg
        dump_cfg(cfg, cfg.result_dir)
    mspec = inb.build_model_spec(cfg)
    rspec = make_render_spec(cfg)
    lw = make_loss_weights(cfg)
    opt, schedule = make_optimizer(cfg)
    patch_fn = make_patch_loss_fn(cfg) if lw.use_patch else None

    # jit the init: eager init ops each compile separately (ruinous through
    # the remote-compile tunnel); one jitted program compiles once
    params = jax.jit(lambda k: inb.init_params(k, mspec))(jax.random.key(0))
    # jit this too: eager opt.init + shadow casts are each a separate
    # remote compile through the tunnel
    state = jax.jit(lambda p: create_train_state(p, opt, mspec))(params)
    recorder = Recorder(cfg.record_dir, resume=resume,
                        enabled=jax.process_index() == 0)

    begin_epoch = 0
    if resume:
        restored, meta = load_checkpoint(cfg.trained_model_dir, state)
        if restored is not None:
            # rebuild the bf16 table shadow from the restored masters (the
            # template's shadow is stale pre-restore data); jitted — eager
            # per-leaf casts each pay a remote compile, and resume is the
            # tunnel-flap recovery path
            state = restored._replace(
                grid_bf16=jax.jit(lambda p: inb.grid_shadow(mspec, p))(
                    restored.params))
            begin_epoch = int(meta.get("epoch", 0)) + 1
            recorder.load_state_dict(meta)
            print(f"resumed from epoch {begin_epoch - 1}")

    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    shardings = None
    rep = None
    if mesh is not None:
        rep = pmesh.replicated(mesh)
        state = jax.device_put(state, rep)

    step_fn = jax.jit(make_train_step(mspec, rspec, lw, opt, patch_fn),
                      donate_argnums=(0,))

    n_epochs = max_epochs if max_epochs is not None else cfg.train.epoch
    ep_iter = cfg.ep_iter
    max_iter = n_epochs * ep_iter
    steps_seen = 0  # post-resume step counter driving the profile window
    profiling = False
    dev_cache: Dict = {}  # device copies of frame/static batch tensors

    datasets: Dict[float, TPoseDataset] = {}

    t_start = None
    for epoch in range(begin_epoch, n_epochs):
        ecfg = stage_for_epoch(cfg, epoch)
        ratio = ecfg.ratio
        if ratio not in datasets:
            datasets[ratio] = TPoseDataset(ecfg, "train")
        ds = datasets[ratio]
        recorder.epoch = epoch

        # multi-host contract: every process walks the SAME indices and
        # builds the SAME host batch (item rng is (epoch, pos)-seeded); the
        # ray axis is then globally sharded and each process contributes its
        # addressable slice (pmesh.put_global).  One image per step, like
        # the reference — rays are the parallel axis, not images.
        sampler = IterationBasedSampler(len(ds), ep_iter, seed=epoch)
        indices = sampler.epoch(epoch)

        def produce(pos, _ds=ds, _ecfg=ecfg, _indices=indices, _epoch=epoch):
            # rng is seeded by (epoch, position), NOT drawn from a shared
            # stream: with parallel producer threads a shared generator
            # would make ray sampling depend on thread schedule, breaking
            # the multi-host same-batch-everywhere contract
            rng = np.random.default_rng(
                np.random.SeedSequence(entropy=(7, _epoch, pos)))
            item = _ds.get_item(_indices[pos], ratio=_ecfg.ratio,
                                sample_focus=_ecfg.get("sample_focus", ""),
                                rng=rng)
            return item

        def stage(item, _ecfg=ecfg):
            # double-buffered device staging (docs/PERF.md backlog #3): the
            # prefetch worker issues the H2D puts for batch N+1..N+depth
            # while the main thread's step N runs, so per-step upload
            # latency (remote tunnel!) is hidden instead of serialized.
            # Single worker thread => dev_cache needs no locking.
            nonlocal shardings
            rdw = _ecfg.get("reg_dist_weight", 0.1)
            if mesh is not None and shardings is None:
                db = device_batch(item, rdw)
                shardings = pmesh.batch_shardings(mesh, db)
            return item, device_batch(item, rdw, shardings, cache=dev_cache)

        # cfg.train.num_workers producer threads (reference: 16 DataLoader
        # worker processes, make_dataset.py:122-128); 0/1 = serial producer.
        # Staging (device_put) always runs on one thread — see prefetch.py.
        n_workers = max(1, int(cfg.train.num_workers))
        if n_workers > 1:
            # stop cv2's internal pool oversubscribing the host (the
            # reference pins cv2 threads per worker, make_dataset.py:88-97)
            import cv2
            cv2.setNumThreads(1)
        pf = Prefetcher(produce, range(len(indices)), depth=8,
                        device_put=stage, workers=n_workers)
        t_data = time.time()
        ep_t0 = time.time()
        ep_data_s = 0.0  # exact host-wait aggregate (the per-line `data:`
        # is a point sample every log_interval steps — too noisy to answer
        # "what share of the step is data-bound", VERDICT r4 next #3)
        try:
            for it, (item, batch) in enumerate(pf):
                data_time = time.time() - t_data
                ep_data_s += data_time

                if profile_window is not None and steps_seen == profile_window[0]:
                    if steps_seen:  # drain in-flight work before tracing
                        float(stats["loss"])
                    import os
                    jax.profiler.start_trace(os.path.join(cfg.record_dir, "profile"))
                    profiling = True

                rng = jax.random.fold_in(jax.random.key(1), epoch * ep_iter + it)
                state, stats = step_fn(state, batch, rng)
                steps_seen += 1

                if profiling and steps_seen >= profile_window[1]:
                    float(stats["loss"])  # value fetch: block_until_ready does
                    # not wait for completion through the remote tunnel
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profile trace captured: steps "
                          f"[{profile_window[0]}, {profile_window[1]})")

                if ecfg.get("sample_using_mse", False):
                    if ds.error_map is None:
                        ds.init_error_map(int(item["H"]), int(item["W"]))
                        ds.load_error_map(cfg.result_dir)
                    ds.update_error_map(item["coord"],
                                        np.asarray(stats["ray_error"]),
                                        item["frame_index"], item["cam_ind"])

                if t_start is None:
                    jax.block_until_ready(stats["loss"])
                    t_start = time.time()

                recorder.step += 1
                if (it + 1) % cfg.log_interval == 0 or it == ep_iter - 1:
                    host_stats = {k: float(v) for k, v in stats.items()
                                  if getattr(v, "ndim", 0) == 0}
                    recorder.update(host_stats)
                    # steps_seen, not recorder.step: the latter is restored
                    # from the checkpoint on resume, which made the average
                    # divide this process's elapsed time by the lifetime
                    # step count (batch: 0.03s on a resumed 0.69s/step run)
                    batch_time = (time.time() - t_start) / max(steps_seen - 1, 1)
                    lr = float(schedule(int(state.step)))
                    print(recorder.console_line(lr, max_iter, batch_time, data_time))
                    recorder.record("train")
                t_data = time.time()
        finally:
            # release producer/stager threads + queued batches even on
            # an abandoned epoch (train-step exception / interrupt)
            pf.close()

        ep_wall = time.time() - ep_t0
        print(f"epoch {epoch}: host data wait {ep_data_s:.1f}s of "
              f"{ep_wall:.1f}s wall ({100.0 * ep_data_s / max(ep_wall, 1e-9):.1f}%)")

        if ecfg.get("sample_using_mse", False) and ds.error_map is not None:
            import os
            os.makedirs(cfg.result_dir, exist_ok=True)
            ds.save_error_map(cfg.result_dir)

        if jax.process_index() == 0:
            if (epoch + 1) % cfg.save_latest_ep == 0 or epoch == n_epochs - 1:
                save_checkpoint(cfg.trained_model_dir, epoch, state,
                                recorder.state_dict())
            if (epoch + 1) % cfg.save_ep == 0:
                save_checkpoint(cfg.trained_model_dir, epoch, state,
                                recorder.state_dict(), latest=False)

        # refresh the geometry-pruning artifact every epoch (reference
        # train_net.py:160-162 trainer.tmesh).  EVERY process computes the
        # cube (replicated params + identical item -> identical cube) and
        # installs it in-memory, preserving the same-batch-everywhere
        # contract; only rank 0 writes the latest.npy artifact.
        if cfg.get("prune_using_geo", False):
            import os
            from ..eval.mesh import occupancy_grid
            occ, _ = occupancy_grid(cfg, mspec, state.params, item,
                                    deformed=False, res=128)
            for dset in datasets.values():
                dset.set_prune_geometry(occ)
            if jax.process_index() == 0:
                os.makedirs(cfg.result_dir, exist_ok=True)
                np.save(os.path.join(cfg.result_dir, "latest.npy"), occ)

        if (epoch + 1) % cfg.eval_ep == 0:
            try:
                validate(cfg, mspec, rspec, state.params, epoch)
            except FileNotFoundError as e:
                print(f"skipping val (no data): {e}")

        # periodic visualization (reference trainer.vis cadence, vis_ep)
        if cfg.get("vis_ep", 0) and (epoch + 1) % cfg.vis_ep == 0:
            try:
                from ..eval.runner import evaluate_dataset
                evaluate_dataset(cfg.replace(eval=True), mspec, rspec,
                                 state.params, split="val", epoch=epoch,
                                 max_items=1, save_images=True)
            except FileNotFoundError as e:
                print(f"skipping vis (no data): {e}")

    if profiling:  # window end past the final step: still flush the trace
        jax.profiler.stop_trace()
        print(f"profile trace captured: steps [{profile_window[0]}, "
              f"{steps_seen}) (run ended inside the window)")
    if t_start is not None:
        total = time.time() - t_start
        print(f"training wall-clock (post-compile): {total:.1f}s")
    recorder.close()
    return state


def validate(cfg: Config, mspec, rspec, params, epoch: int):
    from ..eval.runner import evaluate_dataset
    ecfg = cfg.replace(eval=True)
    evaluate_dataset(ecfg, mspec, rspec, params, split="val", epoch=epoch,
                     max_items=4)
