"""Real multi-process data-parallel execution check.

The reference exercises its DDP path by actually launching N processes
(``/root/reference/train_net.py:211-216``); until round 3 this repo's
multi-process branches (``parallel/mesh.py put_global``, the eval metric
allgather) had only run under a monkeypatched single process.  This script
launches N real jax processes (``jax.distributed.initialize`` over a
localhost coordinator, 8/N virtual CPU devices each -> one 8-device global
mesh; N defaults to 2, the test suite runs 4) and drives the REAL
training/eval helpers through them:

  - ``shard_batch``/``put_global`` multi-process slicing + assembly
  - one jitted ``make_train_step`` over the global mesh (grad all-reduce
    across processes)
  - ``eval.runner._allgather_metrics`` + rank-0 ``summarize`` writing ONE
    metrics.npy covering both processes' item shards

and asserts the N-process loss matches a single-process 8-device run.

Usage:  python tools/multiprocess_check.py [N]        (orchestrator, N=2)
        python tools/multiprocess_check.py worker I PORT TMPDIR NPROCS
        python tools/multiprocess_check.py single
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RAYS = 256
N_ITEMS = 5  # odd on purpose: uneven eval shards exercise the NaN padding


def _spec():
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.models.deformer import make_deformer_spec
    from instant_nvr_tpu.ops.hashgrid import make_hashgrid_spec
    primes = (1, 19349663, 83492791)
    embed = make_hashgrid_spec(n_levels=4, n_features_per_level=4,
                               log2_hashmap_size=10, base_resolution=4,
                               b=1.38, primes=primes)
    deformer = make_deformer_spec(dict(n_levels=4, n_features_per_level=2,
                                       log2_hashmap_size=8, base_resolution=4,
                                       b=1.38, sum=False), primes)
    return inb.ModelSpec(
        partnames=("body", "leg", "head", "larm", "rarm"),
        part_embeds=(embed,) * 5,
        rgb_archs=((32, 2), (32, 1), (32, 2), (32, 1), (32, 1)),
        occ_arch=(32, 1), geo_feature_dim=8, latent_dim=8, num_latent=4,
        viewdir_res=4, deformer=deformer, aggr="", smpl_thresh=0.10,
        knn_k=4, knn_radius=0.075, knn_chunk=512, knn_backend="xla",
        cull_frac=0.25, part_frac=0.5,
        part_budget_scales=(1.0, 0.75, 0.5, 0.25, 0.25),
        tpose_viewdir=True, compute_dtype="float32",
        grid_compute_dtype="float32")


def _run(mode: str, pid: int = 0, port: int = 0, tmpdir: str = "",
         nprocs: int = 2) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    if mode == "worker":
        jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                                   process_id=pid)
    import numpy as np
    import optax

    from instant_nvr_tpu.datasets import synthetic
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.parallel import mesh as pmesh
    from instant_nvr_tpu.renderer.inb_renderer import RenderSpec
    from instant_nvr_tpu.train.state import create_train_state
    from instant_nvr_tpu.train.step import LossWeights, make_train_step

    print(f"PROCS {jax.process_count()} DEVICES {len(jax.devices())}",
          flush=True)

    spec = _spec()
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    batch_np = synthetic.make_batch(scene, view, n_rays=N_RAYS)

    mesh = pmesh.make_mesh()
    rep = pmesh.replicated(mesh)
    batch = pmesh.shard_batch(mesh, batch_np)   # multi-proc branch for real

    if mode == "worker":
        # establish the cross-process Gloo communicator NOW, via a tiny
        # collective, while worker skew is seconds: Gloo address exchange
        # has a hard 30 s deadline, and on the 1-core host the big step
        # compiles (time-shared 4 ways) can skew workers past it when the
        # first collective is the step itself
        warm = pmesh.put_global(
            np.arange(len(jax.devices()), dtype=np.float32),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
                mesh.axis_names[0])))
        import jax.numpy as jnp
        total = float(jax.jit(jnp.sum, out_shardings=rep)(warm))
        assert total == sum(range(len(jax.devices()))), total

    opt = optax.adam(1e-3, eps=1e-15)
    params = inb.init_params(jax.random.key(0), spec)
    state = create_train_state(params, opt, spec)
    state = jax.tree.map(lambda x: pmesh.put_global(np.asarray(x), rep), state)
    rng = pmesh.put_global(
        np.asarray(jax.random.PRNGKey(42), np.uint32), rep)

    rspec = RenderSpec(n_samples=8, pair_budget=128, use_pair_reg=False,
                       use_reg_distortion=False)
    step = jax.jit(make_train_step(spec, rspec, LossWeights(
        use_pair=False, use_distortion=False), opt))
    state, stats = step(state, batch, rng)
    print(f"LOSS {float(stats['loss']):.8f}", flush=True)

    if mode == "worker":
        # eval metric aggregation across the two processes (uneven shards)
        from instant_nvr_tpu.datasets.samplers import shard_indices
        from instant_nvr_tpu.eval.evaluator import Evaluator
        from instant_nvr_tpu.eval.runner import _allgather_metrics
        mine = shard_indices(list(range(N_ITEMS)), jax.process_index(),
                             jax.process_count(), pad=False)
        ev = Evaluator(result_dir=tmpdir if jax.process_index() == 0 else "",
                       save_images=False)
        for i in mine:
            ev.mse.append(float(i)); ev.psnr.append(10.0 + i)
            ev.ssim.append(0.5); ev.lpips.append(0.1)
        _allgather_metrics(ev, N_ITEMS)
        if jax.process_index() == 0:
            ev.summarize()
            import numpy as _np
            m = _np.load(os.path.join(tmpdir, "metrics.npy"),
                         allow_pickle=True).item()
            print(f"METRICS {len(m['psnr'])} "
                  f"PSNRSUM {sum(m['psnr']):.1f}", flush=True)
        # auto_budget broadcast: rank 0 decides (probe stubbed to known
        # values), every rank must land on the SAME static budgets — shape
        # divergence here would deadlock the lockstep jitted step
        from instant_nvr_tpu.config.config import Config
        from instant_nvr_tpu.datasets import tpose_dataset as tmod
        from instant_nvr_tpu.models import budget as bmod
        probes = []

        def fake_probe(cfg_, ds_, n_probe=4, headroom=1.25, seed=0):
            probes.append(1)
            return 0.31, 0.41, (1.0, 0.8, 0.6, 0.4, 0.2)

        bmod.estimate_budgets = fake_probe
        tmod.TPoseDataset = lambda *a, **k: None
        bcfg = Config({"auto_budget": True, "trained_model_dir": tmpdir,
                       "cull_budget": 0.1, "part_budget": 0.1,
                       "N_samples": 8, "N_rand": 64, "patch_size": 8})
        out = bmod.apply_auto_budget(bcfg)
        assert probes == ([1] if jax.process_index() == 0 else []), \
            "non-rank-0 process probed budgets itself"
        print(f"BUDGET {out.cull_budget:.4f} {out.part_budget:.4f} "
              f"{out.part_budget_scales[1]:.4f}", flush=True)
        jax.experimental.multihost_utils.sync_global_devices("done")


def _orchestrate(nprocs: int = 2) -> int:
    import tempfile
    assert 8 % nprocs == 0, "nprocs must divide the 8-device mesh"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmpdir = tempfile.mkdtemp(prefix="mpcheck_")

    def env(n_dev):
        e = dict(os.environ)
        e["JAX_PLATFORMS"] = "cpu"
        # drop any inherited device-count flag first: under pytest the
        # conftest exports --xla_force_host_platform_device_count=8, and
        # with duplicated flags the LAST wins — every worker then saw 8
        # local devices instead of its 8/nprocs share and Gloo timed out
        # waiting for the phantom peers
        inherited = [f for f in e.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f]
        e["XLA_FLAGS"] = " ".join(
            [f"--xla_force_host_platform_device_count={n_dev}"] + inherited)
        return e

    # run the single-process reference FIRST, alone: with it racing the 4
    # workers, 5 jax processes time-share the 1-core host and worker Gloo
    # listeners can miss the ~30 s connect window (flaky barrier timeouts)
    single = subprocess.Popen(
        [sys.executable, __file__, "single"], env=env(8), cwd=REPO,
        stdout=subprocess.PIPE, text=True)
    outs = []
    workers = []
    try:
        out, _ = single.communicate(timeout=300)
        outs.append(out)
        sys.stdout.write(out)
        if single.returncode != 0:
            print(f"FAIL rc={single.returncode}")
            return 1
        workers = [subprocess.Popen(
            [sys.executable, __file__, "worker", str(i), str(port), tmpdir,
             str(nprocs)],
            env=env(8 // nprocs), cwd=REPO, stdout=subprocess.PIPE, text=True)
            for i in range(nprocs)]
        for p in workers:
            # inner timeout < the pytest-side 540 s so a hung worker is
            # killed HERE (pytest killing only the orchestrator would
            # orphan the jax.distributed children + their coordinator)
            out, _ = p.communicate(timeout=450)
            outs.append(out)
            sys.stdout.write(out)
            if p.returncode != 0:
                print(f"FAIL rc={p.returncode}")
                return 1
    finally:
        for p in [single] + workers:
            if p.poll() is None:
                p.kill()

    def grab(out, key):
        for ln in out.splitlines():
            if ln.startswith(key):
                return ln.split()[1]
        raise AssertionError(f"{key} missing in: {out!r}")

    losses = [float(grab(o, "LOSS")) for o in outs]
    for o in outs[1:]:
        assert grab(o, "PROCS") == str(nprocs), \
            f"workers did not form a {nprocs}-process job"
    for lw in losses[2:]:
        assert abs(losses[1] - lw) < 1e-7, "worker losses disagree"
    assert abs(losses[0] - losses[1]) < 2e-4 * max(1.0, abs(losses[0])), \
        f"{nprocs}-process loss {losses[1]} != single-process {losses[0]}"
    metrics_out = next(o for o in outs[1:] if "METRICS" in o)
    n = int(grab(metrics_out, "METRICS"))
    assert n == N_ITEMS, f"merged metrics cover {n}/{N_ITEMS} items"
    budgets = [[ln for ln in o.splitlines() if ln.startswith("BUDGET")]
               for o in outs[1:]]
    assert all(b and b == budgets[0] for b in budgets), \
        f"broadcast budgets differ across processes: {budgets}"
    assert budgets[0][0].split()[1] == "0.3100", \
        f"budget broadcast wrong: {budgets[0][0]}"
    print(f"OK {nprocs}-process loss={losses[1]:.8f} single={losses[0]:.8f} "
          f"metrics={n}/{N_ITEMS} budgets={budgets[0][0].split()[1:]}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("worker", "single"):
        sys.path.insert(0, REPO)
        _run(sys.argv[1],
             pid=int(sys.argv[2]) if len(sys.argv) > 2 else 0,
             port=int(sys.argv[3]) if len(sys.argv) > 3 else 0,
             tmpdir=sys.argv[4] if len(sys.argv) > 4 else "",
             nprocs=int(sys.argv[5]) if len(sys.argv) > 5 else 2)
    else:
        sys.exit(_orchestrate(int(sys.argv[1]) if len(sys.argv) > 1 else 2))
