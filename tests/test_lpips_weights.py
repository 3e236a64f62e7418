"""Loaded-weights LPIPS path: npz fixture from disk -> documented formula.

Pretrained torchvision/lpips weights are unobtainable in this offline
environment (tools/export_vgg_weights.py converts them elsewhere), so this
exercises the ``cfg.lpips_weights`` code path end-to-end with a synthetic
fixture: weights load from disk, and both ``lpips_distance`` (VGG16, 5
stages, lin weights) and ``perceptual_loss`` (VGG19, 2 stages) reproduce an
independent numpy implementation of the documented formulas
(reference: lib/evaluators/if_nerf.py:23-26 + lpips package net='vgg';
lib/train/trainers/loss/perceptual_loss.py:55-68).
"""
import numpy as np
import pytest

from instant_nvr_tpu.models.lpips import (lpips_distance, perceptual_loss,
                                          vgg_load_npz, _VGG16_PLAN,
                                          _VGG19_PLAN)

# tiny stand-in channel plan: vgg_load_npz reads n_convs per stage from the
# plan but takes the channel sizes from the arrays themselves
_CHANS = [4, 6, 8, 10, 12]


def _write_fixture(path, plan, n_stages, lin=False, seed=0):
    rng = np.random.default_rng(seed)
    z = {}
    c_in = 3
    for s, (_, n_convs) in enumerate(plan[:n_stages]):
        c_out = _CHANS[s]
        for i in range(n_convs):
            z[f"w_{s}_{i}"] = rng.standard_normal((3, 3, c_in, c_out)).astype(np.float32) * 0.3
            z[f"b_{s}_{i}"] = rng.standard_normal(c_out).astype(np.float32) * 0.05
            c_in = c_out
        if lin:
            z[f"lin_{s}"] = rng.uniform(0.1, 1.0, c_out).astype(np.float32)
    np.savez(path, **z)
    return z


# -- independent numpy reference -------------------------------------------

def _np_conv(x, w, b):
    H, W, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((H, W, w.shape[-1]), np.float64)
    for i in range(3):
        for j in range(3):
            out += np.einsum("hwc,co->hwo", xp[i:i + H, j:j + W], w[i, j])
    return out + b


def _np_features(z, plan, n_stages, img):
    feats = []
    x = img.astype(np.float64)
    for s, (_, n_convs) in enumerate(plan[:n_stages]):
        for i in range(n_convs):
            x = np.maximum(_np_conv(x, z[f"w_{s}_{i}"], z[f"b_{s}_{i}"]), 0.0)
        feats.append(x)
        if s < n_stages - 1:
            H, W, C = x.shape
            x = x.reshape(H // 2, 2, W // 2, 2, C).max(axis=(1, 3))
    return feats


def _np_lpips(z, a, b):
    shift = np.array([-0.030, -0.088, -0.188])
    scale = np.array([0.458, 0.448, 0.450])
    prep = lambda im: ((im * 2.0 - 1.0) - shift) / scale
    fa = _np_features(z, _VGG16_PLAN, 5, prep(a))
    fb = _np_features(z, _VGG16_PLAN, 5, prep(b))
    total = 0.0
    for s in range(5):
        na = fa[s] / np.maximum(np.linalg.norm(fa[s], axis=-1, keepdims=True), 1e-10)
        nb = fb[s] / np.maximum(np.linalg.norm(fb[s], axis=-1, keepdims=True), 1e-10)
        d2 = (na - nb) ** 2 * z[f"lin_{s}"]
        total += d2.sum(-1).mean()
    return total


def test_vgg_load_npz_shapes(tmp_path):
    p = str(tmp_path / "w16.npz")
    _write_fixture(p, _VGG16_PLAN, 5, lin=True)
    params = vgg_load_npz(p, _VGG16_PLAN, 5)
    assert len(params) == 5
    assert [len(st) for st in params] == [n for _, n in _VGG16_PLAN]
    assert params[0][0]["w"].shape == (3, 3, 3, _CHANS[0])
    assert params[4][-1]["w"].shape == (3, 3, _CHANS[4], _CHANS[4])


def test_lpips_distance_matches_numpy_reference(tmp_path):
    p = str(tmp_path / "w16.npz")
    z = _write_fixture(p, _VGG16_PLAN, 5, lin=True, seed=7)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    got = float(lpips_distance(a, b, weights_path=p))
    want = _np_lpips(z, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4)

    assert float(lpips_distance(a, a, weights_path=p)) == pytest.approx(0.0, abs=1e-8)
    # loaded weights give a different metric than the random-feature fallback
    assert abs(got - float(lpips_distance(a, b))) > 1e-6


def test_perceptual_loss_matches_numpy_reference(tmp_path):
    p = str(tmp_path / "w19.npz")
    z = _write_fixture(p, _VGG19_PLAN, 2, seed=11)
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    fa = _np_features(z, _VGG19_PLAN, 2, a)
    fb = _np_features(z, _VGG19_PLAN, 2, b)
    want = (np.abs(fa[0] - fb[0]).mean() + np.abs(fa[1] - fb[1]).mean()) / 2.0
    want += np.abs(a - b).mean() + ((a - b) ** 2).mean()

    got = float(perceptual_loss(a, b, weights_path=p))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_lpips_jit_matches_eager(tmp_path):
    """The evaluator's jit-cached path must equal the eager formula."""
    from instant_nvr_tpu.models.lpips import lpips_distance_jit
    p = str(tmp_path / "w16j.npz")
    _write_fixture(p, _VGG16_PLAN, 5, lin=True, seed=13)
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    for wp in ("", p):
        np.testing.assert_allclose(lpips_distance_jit(a, b, wp),
                                   float(lpips_distance(a, b, wp)), rtol=1e-5)
