"""Novel-view rendering (bullet-time) smoke test on the fake dataset."""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.eval.visualizer import (gen_path_from_cams, look_at_pose,
                                             normalize)

TINY = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=10,
            base_resolution=4, b=1.38)


def test_look_at_pose_geometry():
    eye = np.array([0.0, 0.0, -2.0])
    center = np.zeros(3)
    R, T = look_at_pose(eye, center, np.array([0.0, 1.0, 0.0]))
    # camera center recovered: C = -R^T T
    C = -R.T @ T.ravel()
    np.testing.assert_allclose(C, eye, atol=1e-6)
    # center projects onto the +z axis in camera coords
    cam = R @ center + T.ravel()
    assert cam[2] > 0 and abs(cam[0]) < 1e-6 and abs(cam[1]) < 1e-6


def test_gen_path_derives_from_input_cams():
    """The orbit's radius, height and up-vector come from the dataset cams."""
    center = np.array([0.5, -0.2, 3.0])
    up_true = normalize(np.array([0.1, -1.0, 0.05]))
    # 6 input cameras on a radius-2 ring at height 0.4 above center
    e1 = normalize(np.cross(up_true, [0.0, 0.0, 1.0]))
    e2 = np.cross(up_true, e1)
    Rs, Ts = [], []
    for ang in np.linspace(0, 2 * np.pi, 6, endpoint=False):
        eye = center + 2.0 * (np.cos(ang) * e1 + np.sin(ang) * e2) + 0.4 * up_true
        R, T = look_at_pose(eye, center, up_true)
        Rs.append(R), Ts.append(T)
    cams = gen_path_from_cams(np.stack(Rs), np.stack(Ts), center, n_views=12)
    assert len(cams) == 12
    pos = np.stack([-c["R"].T @ c["T"].ravel() for c in cams])
    rel = pos - center
    h = rel @ up_true
    np.testing.assert_allclose(h, 0.4, atol=0.05)          # smoothed height kept
    r = np.linalg.norm(rel - np.outer(h, up_true), axis=1)
    assert (r > 1.5).all() and (r < 3.5).all()             # ~input ring x1.3
    # every generated view looks at the subject center
    for c in cams:
        cam_pt = c["R"] @ center + c["T"].ravel()
        assert cam_pt[2] > 0 and abs(cam_pt[0]) < 1e-6 and abs(cam_pt[1]) < 1e-6


def test_render_novel_views(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=64, W=64)
    exp = str(tmp_path_factory.mktemp("exp"))
    cfg = default_config().merged(fake_cfg_overrides(root, n_frames=2)).merged({
        "partnet": {p: {"embedder": {"kwargs": TINY}} for p in
                    ("body", "leg", "head", "larm", "rarm")},
        "tpose_deformer": {"embedder": {"kwargs": dict(TINY, sum=False)}},
        "network": {"occ": {"d_hidden": 16, "n_layers": 1},
                    "color": {"d_hidden": 16, "n_layers": 1}},
        "N_samples": 8, "render_chunk": 512, "render_views": 2,
        "result_dir": exp, "geo_feature_dim": 8, "latent_code_dim": 8,
        "num_latent_code": 1, "eval_ratio": 0.5, "ratio": 0.5,
    })
    import jax
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.eval.visualizer import render_novel_views
    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(0), mspec)
    # render_frame=-1 (default): the body animates — views 0/1 render body
    # frames 0/1 while the camera orbits
    frames = render_novel_views(cfg, mspec, params, n_views=2)
    assert len(frames) == 2
    assert all(os.path.exists(f) for f in frames)
