"""Auxiliary criterion functions (reference ``lib/train/trainers/crit.py``).

``pair_reg_loss`` (the reg_raw_crit equivalent) lives in the renderer; this
module carries the remaining criteria — used by SDF/normal model variants in
the reference and exposed here for completeness/extension:

  - :func:`elastic_crit` — log-singular-value elasticity of a deformation
    jacobian (crit.py:36-44)
  - :func:`sdf_mask_crit` — mask BCE on scaled SDF with the alpha schedule
    (crit.py:19-33)
  - :func:`normal_crit` — view-weighted surface-normal agreement
    (crit.py:47-64)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.math import safe_norm


def elastic_crit(jac: jnp.ndarray) -> jnp.ndarray:
    """jac (..., 3, 3) deformation jacobians -> scalar sum of log-singular
    values squared, averaged over points."""
    s = jnp.linalg.svd(jac, compute_uv=False)
    log_s = jnp.log(jnp.clip(s, min=1e-6))
    return jnp.mean(jnp.sum(log_s ** 2, axis=-1))


def sdf_mask_crit(msk_sdf: jnp.ndarray, msk_label: jnp.ndarray,
                  iter_step: int) -> jnp.ndarray:
    """BCE-with-logits on -alpha*sdf; alpha doubles at fixed milestones."""
    alpha = 50.0
    for milestone in (10000, 20000, 30000, 40000, 50000):
        alpha = jnp.where(iter_step > milestone, alpha * 2.0, alpha)
    logits = -alpha * msk_sdf
    bce = jnp.maximum(logits, 0) - logits * msk_label + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(bce) / alpha


def normal_crit(normal_pred: jnp.ndarray, normal_gt: jnp.ndarray,
                viewdir: jnp.ndarray) -> jnp.ndarray:
    """View-facing-weighted normal distance (reference flips yz of pred)."""
    w = jnp.clip(jnp.sum(-normal_pred * viewdir, axis=-1), 0.0, 1.0) ** 2
    gt = normal_gt / jnp.clip(safe_norm(normal_gt, keepdims=True), min=1e-8)
    pred = normal_pred.at[..., 1:].multiply(-1.0)
    return jnp.mean(w * safe_norm(pred - gt))
