"""Evaluator: PSNR / SSIM / LPIPS on reassembled full images.

Rebuild of ``lib/evaluators/if_nerf.py``: per view, scatter the rendered
rays back into an (H, W) canvas via ``mask_at_box``, optionally restrict to
a semantic part (``cfg.eval_part``), dump pred/GT pngs, accumulate metrics;
``summarize`` writes ``metrics.npy`` with the same dict layout
({'mse','psnr','ssim','lpips'}) and returns/prints the means.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..models.lpips import lpips_distance_jit
from ..ops.ssim import ssim_skimage


def psnr_metric(img_pred: np.ndarray, img_gt: np.ndarray) -> float:
    mse = np.mean((img_pred - img_gt) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def fill_image(rgb: np.ndarray, mask_at_box: np.ndarray, H: int, W: int) -> np.ndarray:
    img = np.zeros((H, W, 3), rgb.dtype)
    img[mask_at_box.reshape(H, W)] = rgb
    return img


class Evaluator:
    def __init__(self, result_dir: str = "", lpips_weights: str = "",
                 save_images: bool = True, eval_part: str = "",
                 partnames=None, test_full: bool = True):
        self.result_dir = result_dir
        self.lpips_weights = lpips_weights
        self.save_images = save_images and bool(result_dir)
        self.eval_part = eval_part
        self.partnames = partnames or []
        self.test_full = test_full
        self.mse, self.psnr, self.ssim, self.lpips = [], [], [], []

    def evaluate(self, rgb_pred: np.ndarray, rgb_gt: np.ndarray,
                 mask_at_box: np.ndarray, H: int, W: int,
                 frame_index: int = 0, view_index: int = 0,
                 sem_mask: Optional[np.ndarray] = None, epoch: int = -1):
        if not self.test_full:
            # masked-pixels-only metrics (reference test_full=False branch,
            # lib/evaluators/if_nerf.py:133-144): PSNR on the rays, SSIM on
            # the bbox crop of the reassembled image
            if rgb_gt.sum() == 0:
                return
            self.mse.append(float(np.mean((rgb_pred - rgb_gt) ** 2)))
            self.psnr.append(psnr_metric(rgb_pred, rgb_gt))
            import cv2
            mb = mask_at_box.reshape(H, W)
            ip = fill_image(rgb_pred, mask_at_box, H, W)
            ig = fill_image(rgb_gt, mask_at_box, H, W)
            x, y, w, h = cv2.boundingRect(mb.astype(np.uint8))
            self.ssim.append(ssim_skimage(ip[y:y + h, x:x + w],
                                          ig[y:y + h, x:x + w]))
            # full-canvas LPIPS (like the reference's test_full=False branch)
            # so the jit cache sees ONE shape per split
            self.lpips.append(lpips_distance_jit(ip, ig, self.lpips_weights))
            return

        img_pred = fill_image(rgb_pred, mask_at_box, H, W)
        img_gt = fill_image(rgb_gt, mask_at_box, H, W)

        if self.eval_part and sem_mask is not None:
            pm = sem_mask[self.partnames.index(self.eval_part)].astype(bool)
            img_pred[~pm] = 0
            img_gt[~pm] = 0

        if self.save_images:
            import cv2
            sub = "comparison" if epoch == -1 else f"comparison_epoch{epoch}"
            d = os.path.join(self.result_dir, sub)
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(f"{d}/frame{frame_index:04d}_view{view_index:04d}.png",
                        (img_pred[..., ::-1] * 255).clip(0, 255).astype(np.uint8))
            cv2.imwrite(f"{d}/frame{frame_index:04d}_view{view_index:04d}_gt.png",
                        (img_gt[..., ::-1] * 255).clip(0, 255).astype(np.uint8))
            err = np.abs(img_pred - img_gt).sum(-1)
            cv2.imwrite(f"{d}/frame{frame_index:04d}_view{view_index:04d}_error.png",
                        (err / max(err.max(), 1e-8) * 255).astype(np.uint8))

        self.mse.append(float(np.mean((img_pred - img_gt) ** 2)))
        self.psnr.append(psnr_metric(img_pred.reshape(-1, 3), img_gt.reshape(-1, 3)))
        self.ssim.append(ssim_skimage(img_pred, img_gt))
        self.lpips.append(lpips_distance_jit(img_pred, img_gt,
                                             self.lpips_weights))

    def summarize(self, epoch: int = -1) -> Dict[str, float]:
        if self.result_dir:
            name = "metrics.npy" if epoch == -1 else f"metrics_epoch{epoch}.npy"
            os.makedirs(self.result_dir, exist_ok=True)
            np.save(os.path.join(self.result_dir, name),
                    {"mse": self.mse, "psnr": self.psnr,
                     "ssim": self.ssim, "lpips": self.lpips})
        ret = {"mse": float(np.mean(self.mse)) if self.mse else float("nan"),
               "psnr": float(np.mean(self.psnr)) if self.psnr else float("nan"),
               "ssim": float(np.mean(self.ssim)) if self.ssim else float("nan"),
               "lpips": float(np.mean(self.lpips)) if self.lpips else float("nan")}
        print(" ".join(f"{k}: {v:.4f}" for k, v in ret.items()))
        self.mse, self.psnr, self.ssim, self.lpips = [], [], [], []
        return ret
