"""SSIM — training loss (JAX) and eval metric (numpy/scipy).

Two deliberately separate implementations, mirroring the reference which also
has two:

  - :func:`ssim_loss` — the classic pytorch-ssim formulation (11x11 gaussian
    window, sigma 1.5), used as a differentiable training loss
    (reference ``lib/utils/loss_utils.py:39-63``).  Pure JAX.
  - :func:`ssim_skimage` — skimage ``structural_similarity`` semantics
    (7x7 uniform window, sample covariance, edge crop, channel mean), used by
    the evaluator (reference ``lib/evaluators/if_nerf.py:126``).  numpy+scipy
    since it runs on host at eval time.  ``data_range`` defaults to 1.0 for
    [0,1] float images (skimage's legacy float default of 2.0 silently
    inflates scores; pass 2.0 if bit-parity with old skimage runs is needed).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import uniform_filter


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)  # (size, size)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' conv: img (H, W, C), win (k, k) -> (H, W, C)."""
    k = win.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
    # im2col-free separable-ish approach: direct lax conv per channel
    import jax.lax as lax
    lhs = jnp.moveaxis(x, -1, 0)[:, None]       # (C, 1, H+2p, W+2p)
    rhs = win[None, None]                       # (1, 1, k, k)
    out = lax.conv_general_dilated(lhs, rhs, (1, 1), "VALID")  # (C, 1, H, W)
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim_loss(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
              c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Mean SSIM of two (H, W, C) images in [0, 1] — differentiable."""
    win = _gaussian_window(window_size)
    mu1 = _filter2d(img1, win)
    mu2 = _filter2d(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, win) - mu1_sq
    s2 = _filter2d(img2 * img2, win) - mu2_sq
    s12 = _filter2d(img1 * img2, win) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / \
               ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def ssim_skimage(img1: np.ndarray, img2: np.ndarray, win_size: int = 7,
                 data_range: float = 1.0) -> float:
    """skimage.structural_similarity clone for (H, W[, C]) numpy images."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    if img1.ndim == 3:
        return float(np.mean([
            ssim_skimage(img1[..., c], img2[..., c], win_size, data_range)
            for c in range(img1.shape[-1])]))

    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # sample covariance like skimage

    def f(x):
        return uniform_filter(x, size=win_size)

    ux, uy = f(img1), f(img2)
    uxx, uyy, uxy = f(img1 * img1), f(img2 * img2), f(img1 * img2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return float(S[pad:S.shape[0] - pad, pad:S.shape[1] - pad].mean())
