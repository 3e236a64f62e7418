"""Novel-view ("bullet-time") rendering + video assembly.

Rebuild of the reference demo path: spiral camera path generation
(``render_utils.py:29-107``), per-camera full-image rendering
(``lib/datasets/h36m/tpose_novel_view_dataset.py``), frame dump + ffmpeg
merge (``lib/visualizers/if_nerf_demo.py:57-66``).
"""
from __future__ import annotations

import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from ..datasets.tpose_dataset import TPoseDataset
from ..ops.ray import get_near_far_np, get_rays_np
from ..renderer.inb_renderer import make_render_spec
from .runner import META_KEYS, make_chunked_renderer, render_full_image


def normalize(v):
    return v / np.linalg.norm(v)


def look_at_pose(eye: np.ndarray, center: np.ndarray, up: np.ndarray):
    """World->camera R, T with z forward (OpenCV convention)."""
    z = normalize(center - eye)
    x = normalize(np.cross(up, z))
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    T = (-R @ eye)[:, None]
    return R, T


def gen_spiral_path(center: np.ndarray, up: np.ndarray, radius: float,
                    height: float, n_views: int) -> List[Dict[str, np.ndarray]]:
    """Circular path around the subject (reference gen_path, render_utils.py:61-107)."""
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        offset = np.array([radius * np.cos(ang), height, radius * np.sin(ang)])
        eye = center + offset
        R, T = look_at_pose(eye, center, -up if up[1] < 0 else up)
        cams.append({"R": R, "T": T})
    return cams


def render_novel_views(cfg, mspec, params, n_views: Optional[int] = None,
                       frame_index: int = 0, fps: int = 24):
    ds = TPoseDataset(cfg, "test")
    item = ds.get_item(frame_index)
    n_views = n_views or cfg.get("render_views", 50)
    H, W = int(item["H"]), int(item["W"])
    K = np.array(ds.cams["K"][int(item["cam_ind"])]).astype(np.float64).copy()
    K[:2] *= cfg.eval_ratio

    wb = np.asarray(item["wbounds"]) if "wbounds" in item else None
    if wb is None:
        wb = np.asarray(item["pbounds"])
    center = wb.mean(0)
    radius = 1.2 * float(np.linalg.norm(wb[1] - wb[0]))
    cams = gen_spiral_path(center, np.array([0.0, -1.0, 0.0]), radius,
                           -0.2 * radius, n_views)

    rspec = make_render_spec(cfg)
    chunk = cfg.render_chunk
    render_fn = make_chunked_renderer(mspec, rspec, chunk)

    out_dir = os.path.join(cfg.result_dir, "novel_views")
    os.makedirs(out_dir, exist_ok=True)
    import cv2
    frames = []
    for vi, cam in enumerate(cams):
        ro, rd = get_rays_np(H, W, K, cam["R"], cam["T"])
        ro = ro.reshape(-1, 3).astype(np.float32)
        rd = rd.reshape(-1, 3).astype(np.float32)
        near, far, hit = get_near_far_np(wb, ro, rd)
        sub = {"ray_o": ro[hit], "ray_d": rd[hit],
               "near": near.astype(np.float32), "far": far.astype(np.float32)}
        sub.update({k: item[k] for k in META_KEYS if k in item})
        out = render_full_image(render_fn, params, sub, META_KEYS, chunk)
        img = np.zeros((H * W, 3), np.float32)
        img[hit] = out["rgb_map"]
        img = (img.reshape(H, W, 3) * 255).clip(0, 255).astype(np.uint8)
        path = os.path.join(out_dir, f"frame_{vi:04d}.png")
        cv2.imwrite(path, img[..., ::-1])
        frames.append(path)
        print(f"novel view {vi + 1}/{n_views}")

    merge_into_video(out_dir, os.path.join(cfg.result_dir, "novel_view.mp4"), fps)
    return frames


def merge_into_video(frame_dir: str, out_path: str, fps: int = 24):
    """ffmpeg merge (if_nerf_demo.py:57-66); silently skips if ffmpeg absent."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i",
             os.path.join(frame_dir, "frame_%04d.png"),
             "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path],
            check=True, capture_output=True)
        print(f"wrote {out_path}")
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        print(f"ffmpeg unavailable/failed ({e}); frames left in {frame_dir}")
