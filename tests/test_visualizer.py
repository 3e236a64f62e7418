"""Novel-view rendering (bullet-time) smoke test on the fake dataset."""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.eval.visualizer import gen_spiral_path, look_at_pose

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


def test_spiral_path_orbits():
    cams = gen_spiral_path(np.zeros(3), np.array([0.0, 1.0, 0.0]),
                           radius=2.0, height=0.3, n_views=8)
    assert len(cams) == 8
    centers = np.stack([-c["R"].T @ c["T"].ravel() for c in cams])
    np.testing.assert_allclose(np.linalg.norm(centers[:, [0, 2]], axis=1),
                               2.0, atol=1e-6)


def test_render_novel_views(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=1, n_views=2, H=64, W=64)
    exp = str(tmp_path_factory.mktemp("exp"))
    cfg = default_config().merged(fake_cfg_overrides(root, n_frames=1)).merged({
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
    frames = render_novel_views(cfg, mspec, params, n_views=2)
    assert len(frames) == 2
    assert all(os.path.exists(f) for f in frames)
