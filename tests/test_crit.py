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
