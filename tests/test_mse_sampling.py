"""Error-map-guided (MSE) sampling: end-to-end through the training loop."""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset

TINY = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=10,
            base_resolution=4, b=1.38)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    exp = str(tmp_path_factory.mktemp("exps"))
    return default_config().merged(fake_cfg_overrides(root, n_frames=2)).merged({
        "partnet": {p: {"embedder": {"kwargs": TINY}} for p in
                    ("body", "leg", "head", "larm", "rarm")},
        "tpose_deformer": {"embedder": {"kwargs": dict(TINY, sum=False)}},
        "network": {"occ": {"d_hidden": 16, "n_layers": 1},
                    "color": {"d_hidden": 16, "n_layers": 1}},
        "N_samples": 8, "N_rand": 128,
        "sample_using_mse": True,
        "use_lpips": False, "use_pair_reg": False, "use_reg_distortion": False,
        "ep_iter": 3, "train": {"epoch": 1}, "save_latest_ep": 1,
        "eval_ep": 100, "vis_ep": 0, "log_interval": 1,
        "result_dir": os.path.join(exp, "res"),
        "trained_model_dir": os.path.join(exp, "model"),
        "record_dir": os.path.join(exp, "record"),
        "geo_feature_dim": 8, "latent_code_dim": 8, "num_latent_code": 2,
    })


def test_mse_guided_training(cfg):
    from instant_nvr_tpu.train.loop import train
    state = train(cfg, resume=False)
    assert int(state.step) == 3
    # the error map was created, updated and persisted
    p = os.path.join(cfg.result_dir, "latest_error.npy")
    assert os.path.exists(p)
    emap = np.load(p)
    assert (emap != 1000.0).any()  # some pixels got real error values


def test_sample_rays_mse_prefers_error_pixels(rng):
    from instant_nvr_tpu.datasets import sampling
    H = W = 64
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    msk = np.ones((H, W), np.uint8)
    K = np.array([[120, 0, 32], [0, 120, 32], [0, 0, 1]], np.float64)
    R = np.eye(3)
    T = np.array([[0.0], [0.0], [2.0]])
    bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    emap = np.zeros((H, W), np.float32)
    emap[10:20, 10:20] = 5.0  # hot region
    out = sampling.sample_rays_mse(img, msk, emap, K, R, T, bounds,
                                   nrays=256, mse_portion=0.8,
                                   body_ratio=0.5, face_ratio=0.0, rng=rng)
    coords = out["coord"]
    in_hot = ((coords[:, 0] >= 10) & (coords[:, 0] < 20)
              & (coords[:, 1] >= 10) & (coords[:, 1] < 20)).mean()
    assert in_hot > 0.5  # most rays drawn from the hot region
