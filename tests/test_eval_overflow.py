"""Eval overflow guarantee: metrics must be invariant to training budgets.

The reference computes every threshold-surviving sample at eval
(``lib/networks/renderer/inb_renderer.py:217-237``); the TPU rebuild uses
fixed budgets, so the eval runner (eval/runner.AutoBudgetRenderer) watches
the model's overflow telemetry and auto-raises budgets (one re-jit) until
overflow is exactly zero.  A dense subject rendered through starved
training budgets must therefore produce the same image as one rendered
through generous budgets.
"""
import jax
import numpy as np

from instant_nvr_tpu.datasets import synthetic
from instant_nvr_tpu.eval.runner import AutoBudgetRenderer, raise_budgets
from instant_nvr_tpu.models import inb
from instant_nvr_tpu.renderer.inb_renderer import RenderSpec

from test_model import tiny_spec


def test_raise_budgets_monotone_and_sized():
    spec = tiny_spec(cull_frac=0.1, part_frac=0.2,
                     part_budget_scales=(1.0, 0.5, 0.5, 0.25, 0.25))
    out = raise_budgets(spec, cull_need=0.4,
                        part_need=(0.5, 0.1, 0.01, 0.01, 0.01))
    # raised to demand * headroom
    assert out.cull_frac >= 0.4 * 1.15 - 1e-9
    kp = [out.part_frac * s for s in out.part_budget_scales]
    assert kp[0] >= 0.5 * 1.15 - 1e-9
    # never lowers an existing budget (part 1 had 0.2*0.5=0.1 > 0.1*1.15)
    assert kp[1] >= 0.1 - 1e-9
    # no-op when demand is already covered
    same = raise_budgets(out, cull_need=0.01, part_need=(0.01,) * 5)
    kp2 = [same.part_frac * s for s in same.part_budget_scales]
    assert same.cull_frac == out.cull_frac
    np.testing.assert_allclose(kp2, kp, rtol=1e-12)
    # caps at 1.0
    capped = raise_budgets(spec, cull_need=1.0, part_need=(1.0,) * 5)
    assert capped.cull_frac == 1.0
    assert max(capped.part_frac * s for s in capped.part_budget_scales) == 1.0


def test_eval_invariant_to_training_budgets():
    """Starved budgets + auto-raise == generous budgets, pixel for pixel."""
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    item = synthetic.make_batch(scene, view, n_rays=256, split="test")
    rspec = RenderSpec(n_samples=8, perturb=False)

    generous = tiny_spec(cull_frac=1.0, part_frac=1.0,
                         part_budget_scales=(1.0,) * 5)
    params = inb.init_params(jax.random.key(0), generous)

    ref_renderer = AutoBudgetRenderer(generous, rspec, chunk=64)
    ref = ref_renderer(params, item)
    assert float(ref["cull_overflow"]) <= 0
    assert float(ref["part_overflow"]) <= 0

    # starved: budgets far below this dense subject's demand
    starved = tiny_spec(cull_frac=0.02, part_frac=0.05,
                        part_budget_scales=(1.0, 0.1, 0.1, 0.1, 0.1))
    renderer = AutoBudgetRenderer(starved, rspec, chunk=64)
    out = renderer(params, item)

    # the guarantee: the raise loop ended with zero overflow...
    assert float(out["cull_overflow"]) <= 0
    assert float(out["part_overflow"]) <= 0
    assert renderer.mspec.cull_frac > starved.cull_frac  # it did raise
    # ...and the image matches the generous-budget render
    np.testing.assert_allclose(out["rgb_map"], ref["rgb_map"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["acc_map"], ref["acc_map"],
                               rtol=1e-4, atol=1e-5)

    # budgets stay raised: a second image renders overflow-free first try
    mspec_after = renderer.mspec
    out2 = renderer(params, item)
    assert renderer.mspec is mspec_after
    np.testing.assert_allclose(out2["rgb_map"], ref["rgb_map"],
                               rtol=1e-4, atol=1e-5)


def test_eval_budget_persistence(tmp_path):
    """Raised budgets persist to eval_budgets.json; a fresh renderer loads
    them and renders overflow-free on the FIRST pass (no re-render/re-jit —
    the round-4 rehearsal paid one per eval run without this)."""
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    item = synthetic.make_batch(scene, view, n_rays=256, split="test")
    rspec = RenderSpec(n_samples=8, perturb=False)
    starved = tiny_spec(cull_frac=0.02, part_frac=0.05,
                        part_budget_scales=(1.0, 0.1, 0.1, 0.1, 0.1))
    params = inb.init_params(jax.random.key(0), starved)
    path = str(tmp_path / "eval_budgets.json")

    r1 = AutoBudgetRenderer(starved, rspec, chunk=64, persist_path=path)
    out1 = r1(params, item)
    assert r1.mspec.cull_frac > starved.cull_frac
    import os
    assert os.path.exists(path)

    # fresh renderer from the SAME starved spec: starts already-raised
    r2 = AutoBudgetRenderer(starved, rspec, chunk=64, persist_path=path)
    assert r2.mspec.cull_frac == r1.mspec.cull_frac
    np.testing.assert_allclose(
        [r2.mspec.part_frac * s for s in r2.mspec.part_budget_scales],
        [r1.mspec.part_frac * s for s in r1.mspec.part_budget_scales],
        rtol=1e-9)
    spec_before = r2.mspec
    out2 = r2(params, item)
    assert r2.mspec is spec_before          # no raise happened
    np.testing.assert_allclose(out2["rgb_map"], out1["rgb_map"],
                               rtol=1e-4, atol=1e-5)

    # merge never lowers: a generous spec is untouched by a stingier file
    generous = tiny_spec(cull_frac=1.0, part_frac=1.0,
                         part_budget_scales=(1.0,) * 5)
    r3 = AutoBudgetRenderer(generous, rspec, chunk=64, persist_path=path)
    assert r3.mspec.cull_frac == 1.0
    assert max(r3.mspec.part_frac * s
               for s in r3.mspec.part_budget_scales) == 1.0


def test_eval_image_invariant_to_chunk_size():
    """The eval_render_chunk knob must not change pixels: a fatter chunk
    only pools the per-chunk fixed costs (and, with per-chunk fractional
    budgets, the selection pool) — with overflow-free budgets the rendered
    image is chunk-invariant."""
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    item = synthetic.make_batch(scene, view, n_rays=256, split="test")
    rspec = RenderSpec(n_samples=8, perturb=False)
    generous = tiny_spec(cull_frac=1.0, part_frac=1.0,
                         part_budget_scales=(1.0,) * 5)
    params = inb.init_params(jax.random.key(0), generous)

    ref = AutoBudgetRenderer(generous, rspec, chunk=32)(params, item)
    fat = AutoBudgetRenderer(generous, rspec, chunk=128)(params, item)
    np.testing.assert_allclose(fat["rgb_map"], ref["rgb_map"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(fat["acc_map"], ref["acc_map"],
                               rtol=1e-4, atol=1e-5)


def test_eval_chunk_knob():
    from instant_nvr_tpu.config.defaults import default_config
    from instant_nvr_tpu.eval.runner import eval_chunk
    cfg = default_config()
    assert eval_chunk(cfg) == cfg.render_chunk
    cfg2 = cfg.merged({"eval_render_chunk": 16384})
    assert eval_chunk(cfg2) == 16384
