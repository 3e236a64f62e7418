"""run.py CLI dispatches end-to-end on a tiny CPU config.

Covers the chain the reference drives by hand: train -> prune (writes
result_dir/latest.npy) -> geometry-pruned training sampling -> mesh/export
artifacts (reference run.py type dispatch + tpose_dataset prune_using_geo).
"""
import os

import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset

TINY_EMBED = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=10,
                  base_resolution=4, b=1.38)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    exp = str(tmp_path_factory.mktemp("exps"))
    return default_config().merged(fake_cfg_overrides(root, n_frames=2)).merged({
        "partnet": {p: {"embedder": {"kwargs": TINY_EMBED}} for p in
                    ("body", "leg", "head", "larm", "rarm")},
        "tpose_deformer": {"embedder": {"kwargs": dict(TINY_EMBED, sum=False)}},
        "network": {"occ": {"d_hidden": 32, "n_layers": 1},
                    "color": {"d_hidden": 32, "n_layers": 2}},
        "N_samples": 8, "N_rand": 128, "render_chunk": 512,
        "ep_iter": 2, "train": {"epoch": 1}, "save_latest_ep": 1,
        "eval_ep": 100, "log_interval": 2,
        "use_lpips": False, "use_pair_reg": False, "use_reg_distortion": False,
        "result_dir": os.path.join(exp, "res"),
        "trained_model_dir": os.path.join(exp, "model"),
        "record_dir": os.path.join(exp, "record"),
        "geo_feature_dim": 8, "latent_code_dim": 8, "num_latent_code": 2,
    })


@pytest.fixture(scope="module")
def trained(cfg):
    from instant_nvr_tpu.train.loop import train
    train(cfg, resume=False)
    return cfg


def test_run_dataset(cfg, capsys):
    import run as run_cli
    run_cli.run_dataset(cfg)
    assert "rays=" in capsys.readouterr().out


def test_run_prune_then_train_consumes(trained):
    import run as run_cli
    from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset

    run_cli.run_prune(trained)
    latest = os.path.join(trained.result_dir, "latest.npy")
    assert os.path.exists(latest)
    occ = np.load(latest)
    assert occ.shape == (128, 128, 128)

    pcfg = trained.merged({"prune_using_geo": True})
    ds_free = TPoseDataset(trained, "train")
    ds_pruned = TPoseDataset(pcfg, "train")
    a = ds_free.get_item(0, rng=np.random.default_rng(0))
    b = ds_pruned.get_item(0, rng=np.random.default_rng(0))
    # consumption changes which pixels get sampled (unless the random-init
    # geometry covered the whole box — force distinct by thresholding)
    mask_used = ds_pruned._prune_points() is not None
    assert mask_used
    assert a["coord"].shape == b["coord"].shape


def test_run_exports_and_mesh(trained, capsys):
    import run as run_cli
    run_cli.run_exportdecoder(trained)
    assert os.path.exists(os.path.join(trained.result_dir, "decoders",
                                       "decoders.npz"))
    run_cli.run_exportpart(trained)
    parts = os.path.join(trained.result_dir, "parts")
    assert os.path.exists(os.path.join(parts, "body.npz"))
    run_cli.run_tmesh(trained, deformed=False)
    out = os.path.join(trained.result_dir, "tmesh")
    assert os.path.exists(os.path.join(out, "latest.npy"))
    assert os.path.exists(os.path.join(out, "mesh.obj"))


def test_run_network_timing(trained, capsys):
    import run as run_cli
    run_cli.run_network(trained)
    assert "rays/s" in capsys.readouterr().out


def test_run_vis_dispatch(trained):
    """run.py --type vis renders the test split to pngs (reference
    run_vis, run.py:108-135)."""
    import glob

    import run as run_cli
    run_cli.run_vis(trained)
    pngs = glob.glob(os.path.join(trained.result_dir, "**", "*.png"),
                     recursive=True)
    assert pngs, "run_vis produced no images"


def test_run_bullet_and_video_merge(trained):
    """run.py --type bullet produces orbit frames + an mp4 (reference
    run_other('bullet') -> if_nerf_demo.Visualizer + merge_into_video)."""
    import run as run_cli
    bcfg = trained.merged({"render_views": 3, "render_frame": 0})
    run_cli.run_bullet(bcfg)
    out_dir = os.path.join(trained.result_dir, "novel_views")
    frames = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(frames) == 3
    mp4 = os.path.join(trained.result_dir, "novel_view.mp4")
    assert os.path.exists(mp4) and os.path.getsize(mp4) > 0


def test_merge_into_video_writes_mp4(tmp_path):
    """merge_into_video works without ffmpeg (cv2 mp4v fallback)."""
    import cv2

    from instant_nvr_tpu.eval.visualizer import merge_into_video
    d = str(tmp_path)
    for i in range(4):
        img = np.full((64, 64, 3), i * 40, np.uint8)
        cv2.imwrite(os.path.join(d, f"frame_{i:04d}.png"), img)
    out = os.path.join(d, "out.mp4")
    assert merge_into_video(d, out, fps=8)
    assert os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
