import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.ops import select, ssim


def test_topk_select_and_scatter(rng):
    score = rng.uniform(size=(100,)).astype(np.float32)
    idx, valid = select.topk_select(jnp.array(score), budget=20, thresh=0.15)
    idx, valid = np.asarray(idx), np.asarray(valid)
    # the selected 20 are the smallest 20 scores
    assert set(idx.tolist()) == set(np.argsort(score)[:20].tolist())
    assert (valid == (score[idx] < 0.15)).all()

    vals = np.ones((20, 4), np.float32)
    full = select.scatter_back(jnp.zeros((100, 4)), jnp.array(idx),
                               jnp.array(vals), jnp.array(valid))
    full = np.asarray(full)
    n_valid = int(valid.sum())
    assert (full.sum(-1) > 0).sum() == n_valid
    # invalid-selected and unselected rows are exactly zero
    assert np.all(full[np.setdiff1d(np.arange(100), idx[valid])] == 0)


def test_ssim_identical_is_one(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(ssim.ssim_loss(jnp.array(img), jnp.array(img))) > 0.99
    assert ssim.ssim_skimage(img, img) > 0.999


def test_ssim_decreases_with_noise(rng):
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + 0.3 * rng.normal(size=img.shape), 0, 1).astype(np.float32)
    s_noisy = ssim.ssim_skimage(img, noisy)
    assert s_noisy < 0.9
    s_loss = float(ssim.ssim_loss(jnp.array(img), jnp.array(noisy)))
    assert s_loss < 0.9


def test_ssim_skimage_structure():
    # constant vs shifted constant: high structural similarity, penalized luminance
    a = np.full((32, 32), 0.2)
    b = np.full((32, 32), 0.8)
    s = ssim.ssim_skimage(a, b)
    assert s < 0.5


def test_evaluator_test_full_false(tmp_path, rng):
    from instant_nvr_tpu.eval.evaluator import Evaluator
    ev = Evaluator(result_dir=str(tmp_path), save_images=False, test_full=False)
    H = W = 32
    mask = np.zeros(H * W, bool)
    mask[: H * W // 2] = True
    n = int(mask.sum())
    gt = rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32)
    pred = np.clip(gt + 0.05 * rng.normal(size=gt.shape), 0, 1).astype(np.float32)
    ev.evaluate(pred, gt, mask, H, W)
    out = ev.summarize()
    assert np.isfinite(out["psnr"]) and out["psnr"] > 15
    assert 0 <= out["ssim"] <= 1
