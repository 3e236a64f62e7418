"""Budget auto-tuning: probed budgets cover the survivors with headroom."""
import numpy as np
import pytest

from instant_nvr_tpu.config import default_config
from instant_nvr_tpu.datasets.fake_zju import fake_cfg_overrides, write_fake_dataset
from instant_nvr_tpu.datasets.tpose_dataset import TPoseDataset
from instant_nvr_tpu.models.budget import (_trilinear_last_channel,
                                           apply_auto_budget,
                                           estimate_budgets)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zju"))
    write_fake_dataset(root, n_frames=2, n_views=2, H=96, W=96)
    return default_config().merged(fake_cfg_overrides(root, n_frames=2))


def test_trilinear_matches_device_sampler():
    import jax.numpy as jnp
    from instant_nvr_tpu.ops.grid_sample import pts_sample_volume
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(9, 10, 11, 25)).astype(np.float32)
    bounds = np.array([[-1.0, -2.0, 0.0], [1.0, 0.5, 3.0]], np.float32)
    pts = rng.uniform(size=(64, 3)).astype(np.float32) \
        * (bounds[1] - bounds[0]) + bounds[0]
    got = _trilinear_last_channel(vol, vol.shape[:3], bounds, pts)
    want = np.asarray(pts_sample_volume(jnp.asarray(pts), jnp.asarray(vol),
                                        jnp.asarray(bounds)))[:, -1]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_estimate_budgets_covers_survivors(cfg):
    ds = TPoseDataset(cfg, "train")
    cull, part, scales = estimate_budgets(cfg, ds, n_probe=2, headroom=1.25)
    assert 0.02 <= cull <= 1.0
    assert 0.02 <= part <= 1.0
    assert len(scales) == 5 and max(scales) == 1.0
    # the fake subject is oversized vs the human-tuned 0.25 default:
    # the probe should ask for more
    assert cull > 0.25


def test_apply_auto_budget_rewrites_cfg(cfg):
    acfg = cfg.merged({"auto_budget": True})
    out = apply_auto_budget(acfg)
    assert out.cull_budget != cfg.cull_budget
    assert len(out.part_budget_scales) == 5
    # disabled: untouched
    assert apply_auto_budget(cfg).cull_budget == cfg.cull_budget
