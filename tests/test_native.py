"""Native host-runtime kernels vs their numpy oracles."""
import numpy as np
import pytest

from instant_nvr_tpu.utils import native
from instant_nvr_tpu.ops.ray import get_near_far_np, get_rays_np


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("g++/libnvrhost unavailable")


def test_ray_dirs_matches_numpy(rng):
    H = W = 32
    K = np.array([[80, 0, 16], [0, 80, 16], [0, 0, 1]], np.float64)
    import cv2
    R = cv2.Rodrigues(np.array([0.1, -0.2, 0.3]))[0]
    T = np.array([[0.1], [0.2], [1.5]])
    o_ref, d_ref = get_rays_np(H, W, K, R, T)
    coords = np.stack(np.meshgrid(np.arange(H), np.arange(W), indexing="ij"),
                      -1).reshape(-1, 2)
    o, d = native.ray_dirs(K, R, T, coords)
    np.testing.assert_allclose(o, o_ref.reshape(-1, 3), atol=1e-5)
    np.testing.assert_allclose(d, d_ref.reshape(-1, 3), atol=1e-5)


def test_near_far_matches_numpy(rng):
    bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    ray_o = rng.normal(size=(100, 3)).astype(np.float32) * 3
    ray_d = rng.normal(size=(100, 3)).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    near_ref, far_ref, hit_ref = get_near_far_np(bounds, ray_o, ray_d)
    near, far, hit = native.near_far(bounds, ray_o, ray_d)
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(near, near_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(far, far_ref, rtol=1e-4, atol=1e-5)


def test_sample_pixels_classes():
    msk = np.zeros((64, 64), np.uint8)
    msk[10:30, 10:30] = 1
    msk[40:50, 40:50] = 13
    bound = np.ones((64, 64), np.uint8)
    coords = native.sample_pixels(msk, bound, 100, 50, 30, seed=0)
    assert len(coords) == 180
    vals = msk[coords[:100, 0], coords[:100, 1]]
    assert (vals == 1).all()
    vals = msk[coords[100:150, 0], coords[100:150, 1]]
    assert (vals == 13).all()
