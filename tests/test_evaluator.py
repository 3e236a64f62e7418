"""Evaluator branch coverage: eval_part masking and test_full=False.

Reference semantics: ``lib/evaluators/if_nerf.py`` — eval_part zeroes both
pred and GT outside the semantic part mask before computing metrics
(if_nerf.py:96-110); test_full=False computes PSNR on the masked rays and
SSIM on the bbox crop (if_nerf.py:133-144).
"""
import numpy as np
import pytest

from instant_nvr_tpu.eval.evaluator import Evaluator, fill_image, psnr_metric

H = W = 24
PARTS = ["body", "leg", "head", "larm", "rarm"]


def _rays(rng):
    mask = np.zeros(H * W, bool)
    mask[: H * W // 2] = True
    n = int(mask.sum())
    return (rng.uniform(size=(n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32), mask)


def test_eval_part_masks_both_images(tmp_path):
    rng = np.random.default_rng(0)
    pred, gt, mask = _rays(rng)
    sem = np.zeros((len(PARTS), H, W), np.float32)
    sem[2, :8, :8] = 1.0  # "head" occupies a corner

    ev = Evaluator(result_dir=str(tmp_path), save_images=False,
                   eval_part="head", partnames=PARTS)
    ev.evaluate(pred, gt, mask, H, W, sem_mask=sem)

    ip = fill_image(pred, mask, H, W)
    ig = fill_image(gt, mask, H, W)
    pm = sem[2].astype(bool)
    ip[~pm] = 0
    ig[~pm] = 0
    assert ev.mse[0] == pytest.approx(float(np.mean((ip - ig) ** 2)))
    assert ev.psnr[0] == pytest.approx(
        psnr_metric(ip.reshape(-1, 3), ig.reshape(-1, 3)))

    # different part -> different metric (mask actually matters)
    ev2 = Evaluator(result_dir="", save_images=False,
                    eval_part="body", partnames=PARTS)
    sem2 = sem.copy()
    sem2[0] = 1.0 - sem[2]
    ev2.evaluate(pred, gt, mask, H, W, sem_mask=sem2)
    assert ev2.mse[0] != pytest.approx(ev.mse[0])


def test_test_full_false_branch(tmp_path):
    rng = np.random.default_rng(1)
    pred, gt, mask = _rays(rng)
    ev = Evaluator(result_dir=str(tmp_path), save_images=False,
                   test_full=False)
    ev.evaluate(pred, gt, mask, H, W)
    # ray-space PSNR, not canvas PSNR
    assert ev.psnr[0] == pytest.approx(psnr_metric(pred, gt))
    assert len(ev.ssim) == 1 and np.isfinite(ev.ssim[0])

    # all-zero GT rays are skipped entirely (reference guard)
    ev.evaluate(pred, np.zeros_like(gt), mask, H, W)
    assert len(ev.psnr) == 1

    out = ev.summarize()
    assert np.isfinite(out["psnr"])
    import os
    assert os.path.exists(tmp_path / "metrics.npy")
