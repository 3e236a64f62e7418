"""Compositing, ray sampling, searchsorted, grid-sample oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.ops import ray, rendering, searchsorted, grid_sample


# -- compositing -----------------------------------------------------------

def np_render_weights(alpha, eps=1e-10):
    trans = np.cumprod(1 - alpha + eps, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alpha * trans


def test_render_weights(rng):
    alpha = rng.uniform(size=(2, 8, 16)).astype(np.float32)
    got = np.asarray(rendering.render_weights(jnp.array(alpha)))
    np.testing.assert_allclose(got, np_render_weights(alpha), rtol=1e-5, atol=1e-6)


def test_volume_rendering_opaque_first_sample():
    # fully opaque first sample -> rgb_map == first color, acc == 1
    rgb = jnp.broadcast_to(jnp.array([0.2, 0.4, 0.6]), (1, 4, 8, 3))
    alpha = jnp.zeros((1, 4, 8)).at[:, :, 0].set(1.0)
    w, rgb_map, acc = rendering.volume_rendering(rgb, alpha)
    np.testing.assert_allclose(np.asarray(rgb_map), np.tile([0.2, 0.4, 0.6], (1, 4, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)


def test_volume_rendering_bg_brightness():
    rgb = jnp.zeros((1, 2, 4, 3))
    alpha = jnp.zeros((1, 2, 4))
    _, rgb_map, acc = rendering.volume_rendering(rgb, alpha, bg_brightness=1.0)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-5)


def test_distortion_zero_for_delta():
    # all weight on one sample -> zero distortion
    w = jnp.zeros((4, 16)).at[:, 3].set(1.0)
    z = jnp.broadcast_to(jnp.linspace(0, 1, 16), (4, 16))
    d = rendering.distortion_loss(w, z)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


# -- ray sampling ----------------------------------------------------------

def test_stratified_z_vals_deterministic():
    near = jnp.full((8,), 1.0)
    far = jnp.full((8,), 3.0)
    z = ray.stratified_z_vals(jax.random.key(0), near, far, 16, perturb=False)
    assert z.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(z[0, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[0, -1]), 3.0, atol=1e-6)
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)


def test_stratified_z_vals_perturbed_in_bins():
    near = jnp.full((8,), 1.0)
    far = jnp.full((8,), 3.0)
    z0 = np.asarray(ray.stratified_z_vals(jax.random.key(0), near, far, 16, False))
    z = np.asarray(ray.stratified_z_vals(jax.random.key(1), near, far, 16, True))
    mids = 0.5 * (z0[..., 1:] + z0[..., :-1])
    lower = np.concatenate([z0[..., :1], mids], -1)
    upper = np.concatenate([mids, z0[..., -1:]], -1)
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)


def test_near_far_np_box_hit():
    bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    ray_o = np.array([[0, 0, -5], [0, 5, -5]], np.float32)
    ray_d = np.array([[0, 0, 1], [0, 0, 1]], np.float32)
    near, far, mask = ray.get_near_far_np(bounds, ray_o, ray_d)
    assert mask.tolist() == [True, False]
    np.testing.assert_allclose(near, [4.0], atol=1e-4)
    np.testing.assert_allclose(far, [6.0], atol=1e-4)


def test_get_rays_np_center_pixel():
    H = W = 4
    K = np.array([[100, 0, 2], [0, 100, 2], [0, 0, 1]], np.float64)
    R = np.eye(3)
    T = np.zeros((3, 1))
    o, d = ray.get_rays_np(H, W, K, R, T)
    np.testing.assert_allclose(o[0, 0], 0.0, atol=1e-6)
    # center pixel looks straight down +z
    np.testing.assert_allclose(d[2, 2], [0, 0, 1], atol=1e-6)


# -- searchsorted / sample_pdf --------------------------------------------

def test_searchsorted_vs_numpy(rng):
    a = np.sort(rng.normal(size=(6, 32)), axis=-1).astype(np.float32)
    v = rng.normal(size=(6, 20)).astype(np.float32)
    for side in ("left", "right"):
        got = np.asarray(searchsorted.searchsorted(jnp.array(a), jnp.array(v), side))
        want = np.stack([np.searchsorted(a[i], v[i], side=side) for i in range(6)])
        np.testing.assert_array_equal(got, want)


def test_sample_pdf_concentrates(rng):
    # all pdf mass in one bin -> samples land there
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (4, 9))
    w = jnp.zeros((4, 8)).at[:, 4].set(100.0)
    s = np.asarray(searchsorted.sample_pdf(jax.random.key(0), bins, w, 32))
    b = np.asarray(bins)
    assert (s >= b[:, 4:5] - 0.05).all() and (s <= b[:, 5:6] + 0.05).all()


# -- grid sample -----------------------------------------------------------

def test_grid_sample_3d_exact_at_corners(rng):
    vol = rng.normal(size=(4, 5, 6, 3)).astype(np.float32)
    # coords hitting exact voxel centers should return exact values
    xs, ys, zs = np.meshgrid(np.arange(4), np.arange(5), np.arange(6), indexing="ij")
    pts = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
    coords = pts / (np.array([4, 5, 6]) - 1) * 2 - 1
    got = np.asarray(grid_sample.grid_sample_3d(jnp.array(vol), jnp.array(coords)))
    np.testing.assert_allclose(got, vol.reshape(-1, 3), atol=1e-5)


def test_grid_sample_3d_border_clamp(rng):
    vol = rng.normal(size=(3, 3, 3, 2)).astype(np.float32)
    coords = jnp.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    got = np.asarray(grid_sample.grid_sample_3d(jnp.array(vol), coords))
    np.testing.assert_allclose(got[0], vol[0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(got[1], vol[2, 2, 2], atol=1e-5)


def test_grid_sample_3d_linear_midpoint():
    vol = np.zeros((2, 2, 2, 1), np.float32)
    vol[1, :, :, 0] = 1.0  # varies along x only
    got = np.asarray(grid_sample.grid_sample_3d(jnp.array(vol), jnp.array([[0.0, 0.0, 0.0]])))
    np.testing.assert_allclose(got, [[0.5]], atol=1e-6)


def test_grid_sample_3d_padded_sizes(rng):
    """Padded volume + actual-size array must match the unpadded result."""
    vol = rng.normal(size=(4, 5, 6, 2)).astype(np.float32)
    pad = np.zeros((8, 8, 8, 2), np.float32)
    pad[:4, :5, :6] = vol
    coords = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    want = np.asarray(grid_sample.grid_sample_3d(jnp.array(vol), jnp.array(coords)))
    got = np.asarray(grid_sample.grid_sample_3d(
        jnp.array(pad), jnp.array(coords), sizes=jnp.array([4, 5, 6])))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pts_sample_volume_matches_manual(rng):
    vol = rng.normal(size=(5, 5, 5, 4)).astype(np.float32)
    bounds = jnp.array([[-1.0, 0.0, 2.0], [1.0, 2.0, 4.0]])
    pts = jnp.array([[-1.0, 0.0, 2.0], [1.0, 2.0, 4.0], [0.0, 1.0, 3.0]])
    got = np.asarray(grid_sample.pts_sample_volume(pts, jnp.array(vol), bounds))
    np.testing.assert_allclose(got[0], vol[0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(got[1], vol[4, 4, 4], atol=1e-5)
    np.testing.assert_allclose(got[2], vol[2, 2, 2], atol=1e-5)


def test_grid_sample_grad_of_grad(rng):
    """Double-backward works natively (the reference needed a custom op)."""
    vol = jnp.array(rng.normal(size=(4, 4, 4, 1)).astype(np.float32))

    def f(coords):
        return jnp.sum(grid_sample.grid_sample_3d(vol, coords) ** 2)

    coords = jnp.array(rng.uniform(-0.5, 0.5, size=(8, 3)).astype(np.float32))
    g = jax.grad(f)(coords)
    gg = jax.grad(lambda c: jnp.sum(jax.grad(f)(c) ** 2))(coords)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(gg)).all()
