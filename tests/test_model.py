"""Model forward / train-step integration tests on the synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nvr_tpu.models import inb
from instant_nvr_tpu.models.deformer import make_deformer_spec
from instant_nvr_tpu.ops.hashgrid import make_hashgrid_spec
from instant_nvr_tpu.datasets import synthetic
from instant_nvr_tpu.renderer.inb_renderer import RenderSpec, render_rays
from instant_nvr_tpu.train.step import LossWeights, compute_losses, make_train_step
from instant_nvr_tpu.train.state import TrainState

PRIMES = (1, 19349663, 83492791)


def tiny_spec(**kw) -> inb.ModelSpec:
    embed = make_hashgrid_spec(n_levels=4, n_features_per_level=4,
                               log2_hashmap_size=10, base_resolution=4,
                               b=1.38, primes=PRIMES)
    deformer = make_deformer_spec(dict(n_levels=4, n_features_per_level=2,
                                       log2_hashmap_size=8, base_resolution=4,
                                       b=1.38, sum=False), PRIMES)
    defaults = dict(
        partnames=("body", "leg", "head", "larm", "rarm"),
        part_embeds=(embed,) * 5,
        rgb_archs=((32, 2), (32, 1), (32, 2), (32, 1), (32, 1)),
        occ_arch=(32, 1),
        geo_feature_dim=8,
        latent_dim=8,
        num_latent=4,
        viewdir_res=4,
        deformer=deformer,
        aggr="",
        smpl_thresh=0.10,
        knn_k=4,
        knn_radius=0.075,
        knn_chunk=512,
        knn_backend="xla",
        cull_frac=0.25,
        part_frac=0.5,
        part_budget_scales=(1.0, 0.75, 0.5, 0.25, 0.25),
        tpose_viewdir=True,
        compute_dtype="float32",
        grid_compute_dtype="float32",
    )
    defaults.update(kw)
    return inb.ModelSpec(**defaults)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_verts=600, grid=24)


@pytest.fixture(scope="module")
def view(scene):
    return synthetic.render_gt(scene, H=48, W=48)


def _to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_forward_shapes_and_finite(scene, view):
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    R, S = 64, 8
    z = jnp.linspace(batch["near"], batch["far"], S, axis=-1)
    wpts = (batch["ray_o"][:, None] + batch["ray_d"][:, None] * z[..., None])
    ret = inb.forward(spec, params, wpts.reshape(-1, 3),
                      jnp.repeat(batch["ray_d"], S, axis=0), batch, train=True)
    assert ret["raw"].shape == (R * S, 4)
    assert np.isfinite(np.asarray(ret["raw"])).all()
    # occupancies in [0, 1]
    occ = np.asarray(ret["occ"])
    assert occ.min() >= 0 and occ.max() <= 1


def test_forward_density_located_on_surface(scene, view):
    """Points on the sphere surface should be able to receive nonzero occ
    after a few gradient steps; points far away must stay culled (occ=0)."""
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=32))
    far_pts = jnp.full((128, 3), 5.0)  # way outside the SMPL distance field
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (128, 1))
    ret = inb.forward(spec, params, far_pts, dirs, batch, train=False)
    np.testing.assert_allclose(np.asarray(ret["occ"]), 0.0, atol=1e-6)


def test_render_and_losses(scene, view):
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    rspec = RenderSpec(n_samples=8, pair_budget=128)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    loss, stats = compute_losses(spec, rspec, LossWeights(), params, batch,
                                 jax.random.key(1))
    assert np.isfinite(float(loss))
    for k in ("img_loss", "psnr", "offset_loss", "loss"):
        assert k in stats and np.isfinite(float(stats[k])), k


def test_overfit_sphere(scene, view):
    """End-to-end: loss decreases and PSNR rises when overfitting one view."""
    import optax
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    rspec = RenderSpec(n_samples=12, pair_budget=128, use_pair_reg=False,
                       use_reg_distortion=False)
    lw = LossWeights(use_pair=False, use_distortion=False, resd=0.01)
    opt = optax.adam(5e-3, eps=1e-15)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
    step = jax.jit(make_train_step(spec, rspec, lw, opt))

    batch_np = synthetic.make_batch(scene, view, n_rays=256, seed=0)
    batch = _to_device(batch_np)
    first_psnr = None
    for i in range(60):
        state, stats = step(state, batch, jax.random.key(i))
        if i == 0:
            first_psnr = float(stats["psnr"])
    last_psnr = float(stats["psnr"])
    assert last_psnr > first_psnr + 3.0, (first_psnr, last_psnr)


def test_mask_supervision_losses(scene, view):
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    rspec = RenderSpec(n_samples=8, pair_budget=128)
    lw = LossWeights(use_freespace=True, use_occ=True)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    loss, stats = compute_losses(spec, rspec, lw, params, batch,
                                 jax.random.key(1))
    assert "free_loss" in stats and "occ_loss" in stats
    assert np.isfinite(float(stats["free_loss"]))
    assert np.isfinite(float(stats["occ_loss"]))


def test_no_nans_with_all_regularizers(scene, view):
    """10 steps with pair-reg + distortion + resd losses: everything stays
    finite (regression: norm-at-zero and masked-where NaN gradients)."""
    import optax
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    rspec = RenderSpec(n_samples=12, pair_budget=128, use_pair_reg=True,
                       use_reg_distortion=True)
    lw = LossWeights(use_pair=True, use_distortion=True, pair=10.0, resd=0.1)
    opt = optax.adam(5e-3, eps=1e-15)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
    step = jax.jit(make_train_step(spec, rspec, lw, opt))
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=256, seed=0))
    for i in range(10):
        state, stats = step(state, batch, jax.random.key(i))
        assert np.isfinite(float(stats["loss"])), (i, {k: float(v) for k, v
                                                       in stats.items()
                                                       if getattr(v, "ndim", 0) == 0})
    # params stayed finite too
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_grid_compute(scene, view):
    """bf16 table compute stays close to f32 and trains without NaNs."""
    import optax
    spec32 = tiny_spec()
    spec16 = tiny_spec(grid_compute_dtype="bfloat16")
    params = inb.init_params(jax.random.key(0), spec32)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    z = jnp.linspace(batch["near"], batch["far"], 8, axis=-1)
    wpts = (batch["ray_o"][:, None] + batch["ray_d"][:, None] * z[..., None]).reshape(-1, 3)
    dirs = jnp.repeat(batch["ray_d"], 8, axis=0)
    r32 = inb.forward(spec32, params, wpts, dirs, batch, train=False)
    r16 = inb.forward(spec16, params, wpts, dirs, batch, train=False)
    d = np.abs(np.asarray(r32["raw"]) - np.asarray(r16["raw"]))
    assert d.max() < 0.1 and d.mean() < 0.01

    opt = optax.adam(5e-3, eps=1e-15)
    # production path: create_train_state builds the bf16 grid SHADOW, so
    # the step exercises with_grid_shadow + the bf16->f32 grad remap + the
    # in-step shadow refresh (not just the legacy in-forward cast branch)
    from instant_nvr_tpu.train.state import create_train_state
    state = create_train_state(params, opt, spec16)
    assert state.grid_bf16 is not None
    step = jax.jit(make_train_step(
        spec16, RenderSpec(n_samples=8, pair_budget=64), LossWeights(), opt))
    for i in range(5):
        state, stats = step(state, batch, jax.random.key(i))
        assert np.isfinite(float(stats["loss"]))
    # the refreshed shadow must track the updated masters
    for key in ("dense", "hash"):
        got = np.asarray(state.grid_bf16["embed"]["body"][key], np.float32)
        want = np.asarray(state.params["embed"]["body"][key],
                          np.float32).astype(np.float32)
        np.testing.assert_allclose(
            got, np.asarray(jnp.asarray(want, jnp.bfloat16), np.float32))
    # the deformer tables are NOT shadowed: they stay f32 (tiny tables are
    # row-latency bound; the bf16 gather only bought a standalone
    # full-stream convert — docs/PERF.md round 4)
    assert "deformer_embed" not in state.grid_bf16
    eff = inb.with_grid_shadow(state.params, state.grid_bf16)
    for leaf in jax.tree.leaves(eff["deformer"]["embed"]):
        assert leaf.dtype == jnp.float32


def test_aggr_modes(scene, view):
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=32))
    for aggr in ("", "mean", "dist"):
        spec = tiny_spec(aggr=aggr)
        params = inb.init_params(jax.random.key(0), spec)
        ret = render_rays(spec, RenderSpec(n_samples=8), params, batch,
                          train=False, rng=jax.random.key(0))
        assert np.isfinite(np.asarray(ret["rgb_map"])).all(), aggr


def test_forward_matches_parts_reference(scene, view):
    """The batched round-3 forward must match the per-part unrolled
    reference implementation exactly (same selection, same math)."""
    spec = tiny_spec(select_mode="topk")  # exact-match selection policy
    params = inb.init_params(jax.random.key(0), spec)
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    R, S = 64, 8
    z = jnp.linspace(batch["near"], batch["far"], S, axis=-1)
    wpts = (batch["ray_o"][:, None] + batch["ray_d"][:, None] * z[..., None]
            ).reshape(-1, 3)
    dirs = jnp.repeat(batch["ray_d"], S, axis=0)

    got = inb.forward(spec, params, wpts, dirs, batch, train=True)
    want = inb.forward_parts(spec, params, wpts, dirs, batch, train=True)
    for k in ("raw", "occ", "resd", "tpts", "tocc", "tflag",
              "cull_overflow", "part_overflow"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)

    def loss(fwd, p):
        r = fwd(spec, p, wpts, dirs, batch, train=True)
        return jnp.sum(r["raw"] ** 2) + jnp.sum(r["resd"] ** 2)

    g_new = jax.grad(lambda p: loss(inb.forward, p))(params)
    g_old = jax.grad(lambda p: loss(inb.forward_parts, p))(params)
    for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_partition_select_matches_topk_without_overflow(scene, view):
    """At ample budgets the sort-free partition selection must produce the
    same rendered outputs as top_k (same selected SET, different order)."""
    kw = dict(cull_frac=1.0, part_frac=1.0,
              part_budget_scales=(1.0,) * 5)
    params = inb.init_params(jax.random.key(0), tiny_spec(**kw))
    batch = _to_device(synthetic.make_batch(scene, view, n_rays=64))
    z = jnp.linspace(batch["near"], batch["far"], 8, axis=-1)
    wpts = (batch["ray_o"][:, None] + batch["ray_d"][:, None] * z[..., None]
            ).reshape(-1, 3)
    dirs = jnp.repeat(batch["ray_d"], 8, axis=0)

    outs = {}
    for mode in ("partition", "topk"):
        spec = tiny_spec(select_mode=mode, **kw)
        outs[mode] = inb.forward(spec, params, wpts, dirs, batch, train=True)
    for k in ("raw", "occ"):
        np.testing.assert_allclose(np.asarray(outs["partition"][k]),
                                   np.asarray(outs["topk"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # flat per-point extras are permutations of each other
    for k in ("resd", "tocc"):
        a = np.sort(np.asarray(outs["partition"][k]).ravel())
        b = np.sort(np.asarray(outs["topk"][k]).ravel())
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=k)
    assert int(np.asarray(outs["partition"]["tflag"]).sum()) == \
        int(np.asarray(outs["topk"]["tflag"]).sum())


def test_select_ops_agree():
    from instant_nvr_tpu.ops.select import partition_select, topk_select
    score = jnp.array(np.random.default_rng(0).uniform(0, 1, 257), jnp.float32)
    for budget, thresh in ((64, 0.2), (256, 0.9), (128, 0.0)):
        ti, tv = topk_select(score, budget, thresh)
        pi, pv = partition_select(score, budget, thresh)
        assert int(tv.sum()) == int(pv.sum())
        a = set(np.asarray(ti)[np.asarray(tv)].tolist())
        b = set(np.asarray(pi)[np.asarray(pv)].tolist())
        if int(tv.sum()) < budget:   # no overflow: identical sets
            assert a == b
