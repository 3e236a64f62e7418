"""Chunked in-jit rendering must match a single-pass render exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.datasets import synthetic
from instant_nvr_tpu.eval.runner import META_KEYS, make_chunked_renderer, render_full_image
from instant_nvr_tpu.models import inb
from instant_nvr_tpu.renderer.inb_renderer import RenderSpec, render_rays

from test_model import tiny_spec


def test_chunked_equals_single_pass():
    # full budgets: with no overflow-dropping, chunked == direct exactly
    # (with tight budgets the two paths drop different far points)
    spec = tiny_spec(cull_frac=1.0, part_frac=1.0,
                     part_budget_scales=(1.0,) * 5)
    params = inb.init_params(jax.random.key(0), spec)
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    batch_np = synthetic.make_batch(scene, view, n_rays=256, split="test")

    rspec = RenderSpec(n_samples=8, perturb=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    direct = render_rays(spec, rspec, params, batch, train=False,
                         rng=jax.random.key(0))

    render_fn = make_chunked_renderer(spec, rspec, chunk=64)
    out = render_full_image(render_fn, params, batch_np, META_KEYS, chunk=64)

    np.testing.assert_allclose(out["rgb_map"], np.asarray(direct["rgb_map"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["acc_map"], np.asarray(direct["acc_map"]),
                               rtol=1e-4, atol=1e-5)


def test_chunked_handles_nonmultiple_ray_count():
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    scene = synthetic.make_scene(n_verts=400, grid=16)
    view = synthetic.render_gt(scene, H=32, W=32)
    batch_np = synthetic.make_batch(scene, view, n_rays=100, split="test")
    render_fn = make_chunked_renderer(spec, RenderSpec(n_samples=8, perturb=False),
                                      chunk=64)
    out = render_full_image(render_fn, params, batch_np, META_KEYS, chunk=64)
    assert out["rgb_map"].shape == (100, 3)
    assert np.isfinite(out["rgb_map"]).all()
