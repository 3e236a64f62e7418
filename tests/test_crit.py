import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.train import crit


def test_elastic_crit_zero_for_rotations(rng):
    import cv2
    jacs = np.stack([cv2.Rodrigues(rng.normal(size=3))[0] for _ in range(8)])
    # rotations have unit singular values -> zero elastic energy
    assert float(crit.elastic_crit(jnp.asarray(jacs))) < 1e-8
    stretched = jacs * 2.0
    assert float(crit.elastic_crit(jnp.asarray(stretched))) > 0.1


def test_sdf_mask_crit_alpha_schedule():
    sdf = jnp.array([0.1, -0.1])
    label = jnp.array([0.0, 1.0])
    early = float(crit.sdf_mask_crit(sdf, label, 0))
    late = float(crit.sdf_mask_crit(sdf, label, 60000))
    assert np.isfinite(early) and np.isfinite(late)
    assert late < early  # alpha grows -> normalized loss shrinks


def test_normal_crit_perfect_match():
    n = jnp.array([[0.0, 0.0, 1.0]])
    gt = n.at[..., 1:].multiply(-1.0)  # account for the yz flip convention
    view = jnp.array([[0.0, 0.0, -1.0]])
    assert float(crit.normal_crit(n, gt, view)) < 1e-4


def test_variant_losses_gated_on_ret_keys(rng):
    """compute_losses' variant branches fire exactly when a model variant
    emits the keys (reference inb_trainer.py:100-148)."""
    from instant_nvr_tpu.train.step import LossWeights, variant_losses

    lw = LossWeights()
    # inb path: no variant keys -> zero contribution
    loss, stats = variant_losses({}, {}, lw, 0)
    assert float(loss) == 0.0 and not stats

    ret = {
        "rgb_res": jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32),
        "fw_resd": jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32),
        "bw_resd": jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32),
        "pred_pbw": jnp.ones((4, 24)), "smpl_tbw": jnp.zeros((4, 24)),
        "msk_sdf": jnp.asarray(rng.normal(size=8), jnp.float32),
        "msk_label": jnp.asarray(rng.integers(0, 2, 8), jnp.float32),
        "gradients": jnp.asarray(2.0 * rng.normal(size=(4, 8, 3)), jnp.float32),
        "resd_jacobian": jnp.asarray(
            np.eye(3) * 2.0 + np.zeros((5, 3, 3)), jnp.float32),
    }
    loss, stats = variant_losses(ret, {}, lw, 0)
    for k in ("rgb_resd_loss", "fwresd_loss", "tbw_loss", "mask_loss",
              "grad_loss", "elas_loss"):
        assert k in stats and np.isfinite(float(stats[k])), k
    assert float(loss) > 0.0
    # weights: rgb_res contributes rgb_resd * norm-mean
    only = {"rgb_res": ret["rgb_res"]}
    l1, s1 = variant_losses(only, {}, lw, 0)
    np.testing.assert_allclose(float(l1), lw.rgb_resd * float(s1["rgb_resd_loss"]),
                               rtol=1e-6)
