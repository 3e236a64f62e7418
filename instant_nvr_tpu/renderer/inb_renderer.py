"""Fused volume renderer for the inb model.

Rebuild of ``lib/networks/renderer/inb_renderer.py`` as ONE jit-able function:
stratified sampling -> network forward -> compositing -> train-time
regularizer tensors.  No Python chunk loop on the training path (the
reference chunks at 4096 rays, inb_renderer.py:217-237); full-image eval
chunks with ``lax.map`` inside jit instead (see eval layer).

Train-time extras mirror the reference:
  - pair regularization points: canonical points whose occupancy is near 0.5
    (|tocc - 0.5| < 0.02, inb_renderer.py:78-94) get their residual compared
    against a jittered neighbor's residual — selected here with a fixed
    budget instead of ``nonzero``.
  - distortion regularizer (inb_renderer.py:96-103).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..models import inb
from ..ops.ray import stratified_z_vals, z_to_points
from ..ops.rendering import distortion_loss, volume_rendering
from ..ops.select import partition_select, topk_select


class RenderSpec(NamedTuple):
    n_samples: int = 64
    perturb: bool = True
    use_pair_reg: bool = True
    pair_budget: int = 1024
    pair_thresh: float = 0.02
    pair_range: float = 0.01
    use_reg_distortion: bool = True
    bg_brightness: float | None = None


def make_render_spec(cfg) -> RenderSpec:
    return RenderSpec(
        n_samples=cfg.N_samples,
        perturb=bool(cfg.perturb),
        use_pair_reg=cfg.use_pair_reg,
        use_reg_distortion=cfg.use_reg_distortion,
        bg_brightness=1.0 if cfg.white_bkgd else None,
    )


def render_rays(mspec: inb.ModelSpec, rspec: RenderSpec, params,
                batch: Dict[str, jnp.ndarray], train: bool,
                rng: jax.Array) -> Dict[str, jnp.ndarray]:
    """batch rays: ray_o/ray_d (R, 3), near/far (R,) -> render outputs."""
    ray_o, ray_d = batch["ray_o"], batch["ray_d"]
    near, far = batch["near"], batch["far"]
    R = ray_o.shape[0]
    S = rspec.n_samples

    k_strat, k_pair = jax.random.split(rng)
    z_vals = stratified_z_vals(k_strat, near, far, S, rspec.perturb and train)
    wpts = z_to_points(ray_o, ray_d, z_vals)            # (R, S, 3)
    viewdir = jnp.broadcast_to(ray_d[:, None, :], (R, S, 3))

    net = inb.forward(mspec, params, wpts.reshape(R * S, 3),
                      viewdir.reshape(R * S, 3), batch, train)

    raw = net["raw"].reshape(R, S, 4)
    rgb = raw[..., :3]
    alpha = raw[..., 3]
    weights, rgb_map, acc_map = volume_rendering(
        rgb, alpha, bg_brightness=rspec.bg_brightness)

    ret = {
        "rgb_map": rgb_map,      # (R, 3)
        "acc_map": acc_map,      # (R,)
        "weights": weights,      # (R, S)
        "raw": raw,
        "occ": net["occ"].reshape(R, S),
    }
    # budget telemetry flows through at train AND eval: the eval runner
    # auto-raises budgets until overflow is exactly 0 (reference eval
    # computes every surviving sample, inb_renderer.py:217-237)
    for k in ("cull_overflow", "part_overflow", "cull_need", "part_need"):
        if k in net:
            ret[k] = net[k]

    if train:
        ret["resd"] = net["resd"]

        if rspec.use_pair_reg:
            tocc = net["tocc"][..., 0]                       # (K, P)
            tflag = net["tflag"]
            score = jnp.where(tflag, jnp.abs(tocc - 0.5), jnp.inf).reshape(-1)
            budget = min(rspec.pair_budget, score.shape[0])
            sel = (partition_select if mspec.select_mode == "partition"
                   else topk_select)
            idx, valid = sel(score, budget, rspec.pair_thresh)
            tpts = net["tpts"].reshape(-1, 3)[idx]           # (B, 3)
            resd0 = net["resd"].reshape(-1, 3)[idx]
            noise = (jax.random.uniform(k_pair, tpts.shape, tpts.dtype) - 0.5) \
                * rspec.pair_range
            resd1 = inb.resd_fn(mspec, params, tpts + noise, batch)
            ret["pair_resd0"] = resd0
            ret["pair_resd1"] = resd1
            ret["pair_valid"] = valid

        if rspec.use_reg_distortion:
            ret["reg_distortion"] = distortion_loss(weights, z_vals)  # (R,)

    return ret


def pair_reg_loss(resd0: jnp.ndarray, resd1: jnp.ndarray,
                  valid: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Direction-consistency of residuals at neighboring points.

    Reference ``crit.reg_raw_crit`` (lib/train/trainers/crit.py:8-17): unit
    directions of the two residuals should agree; masked mean over the valid
    budget slots.
    """
    from ..ops.math import safe_norm
    v0 = resd0 / (safe_norm(resd0, axis=-1, keepdims=True) + eps)
    v1 = resd1 / (safe_norm(resd1, axis=-1, keepdims=True) + eps)
    per_pt = safe_norm(v1 - v0, axis=-1)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(jnp.where(valid, per_pt, 0.0)) / denom
