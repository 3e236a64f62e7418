"""Loss assembly + the fused train step.

Rebuild of the reference loss wrapper (``lib/train/trainers/inb_trainer.py``)
and the optimizer step (``lib/train/trainers/trainer.py:140-149``) as one
jitted function: render -> losses -> grad -> adam update.  Under a device
mesh the ray axis of the batch is sharded and parameters are replicated;
XLA inserts the gradient all-reduce (the DDP/NCCL replacement).
"""
from __future__ import annotations


from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import inb
from ..renderer.inb_renderer import RenderSpec, pair_reg_loss, render_rays
from .state import TrainState


class LossWeights(NamedTuple):
    """Static loss gates/weights (stage-scheduled values are traced)."""
    pair: float = 10.0
    resd: float = 0.1
    use_pair: bool = True
    use_distortion: bool = True
    use_patch: bool = False       # LPIPS/SSIM/... patch losses (see losses.py)
    patch_kind: str = "lpips"
    use_freespace: bool = False   # BCE(occ, 0) on mask-background rays
    free_weight: float = 1e-4
    use_occ: bool = False         # BCE(max occ, 1) on mask-foreground rays
    occ_weight: float = 1e-4
    rgb_resd: float = 0.01        # rgb residual coefficient (rgb_resd_loss_coe)
    num_trained_mask: int = 2 ** 30   # msk_sdf loss only for latents below this
    remat: bool = False           # checkpoint the render forward (trade ~30%
    # step time for ~half the activation HBM; needed for big budgets in
    # patch mode — 4096 rays x 64 samples at cull 0.6 OOMs a 16G chip)


def make_loss_weights(cfg) -> LossWeights:
    patch_kind = ""
    for k in ("lpips", "ssim", "fourier", "tv_image"):
        if cfg.get(f"use_{k}", False):
            patch_kind = k
            break
    return LossWeights(
        pair=cfg.pair_loss_weight,
        resd=cfg.resd_loss_weight,
        use_pair=cfg.use_pair_reg,
        use_distortion=cfg.use_reg_distortion,
        use_patch=bool(patch_kind),
        patch_kind=patch_kind or "lpips",
        use_freespace=cfg.get("use_freespace_loss", False),
        free_weight=cfg.get("free_loss_weight", 1e-4),
        use_occ=cfg.get("use_occ_loss", False),
        occ_weight=cfg.get("occ_loss_weight", 1e-4),
        rgb_resd=cfg.get("rgb_resd_loss_coe", 0.01),
        num_trained_mask=int(cfg.get("num_trained_mask", 2 ** 30)),
        remat=cfg.get("remat", False),
    )


def variant_losses(ret: Dict, batch: Dict, lw: LossWeights,
                   step) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Model-variant loss branches, gated on ret keys like the reference.

    Mirrors inb_trainer.py:100-148: the inb part-model emits none of these
    keys (so they are inert on the flagship path, same as the reference);
    SDF/normal/residual model variants that do emit them get the same
    objectives.  Returns (loss contribution, stats).
    """
    from ..ops.math import safe_norm
    from .crit import elastic_crit, normal_crit, sdf_mask_crit

    stats: Dict[str, jnp.ndarray] = {}
    loss = jnp.zeros((), jnp.float32)

    if "rgb_res" in ret:
        l = jnp.mean(safe_norm(ret["rgb_res"], axis=-1))
        stats["rgb_resd_loss"] = l
        loss = loss + lw.rgb_resd * l
    if "fw_resd" in ret:
        l = jnp.mean(safe_norm(ret["fw_resd"] + ret["bw_resd"], axis=-1))
        stats["fwresd_loss"] = l
        loss = loss + l
    if "pred_pbw" in ret:
        l = jnp.mean((ret["pred_pbw"] - ret["smpl_tbw"]) ** 2)
        stats["tbw_loss"] = l
        loss = loss + l
    if "msk_sdf" in ret:
        # reference gates mask supervision to early latent codes
        # (inb_trainer.py:115: latent_index < cfg.num_trained_mask)
        gate = (batch.get("latent_index", 0) < lw.num_trained_mask)
        l = sdf_mask_crit(ret["msk_sdf"], ret["msk_label"], step) \
            * jnp.asarray(gate, jnp.float32)
        stats["mask_loss"] = l
        loss = loss + l
    if "surf_normal" in ret and "normal" in batch:
        l = normal_crit(ret["surf_normal"], batch["normal"], batch["ray_d"])
        stats["normal_loss"] = l
        loss = loss + 0.01 * l
    for key, name in (("gradients", "grad_loss"),
                      ("observed_gradients", "ograd_loss")):
        if key in ret:  # eikonal
            l = jnp.mean((safe_norm(ret[key], axis=-1) - 1.0) ** 2)
            stats[name] = l
            loss = loss + 0.1 * l
    if "resd_jacobian" in ret:
        l = elastic_crit(ret["resd_jacobian"])
        stats["elas_loss"] = l
        loss = loss + 0.1 * l
    return loss, stats


def compute_losses(mspec: inb.ModelSpec, rspec: RenderSpec, lw: LossWeights,
                   params, batch: Dict[str, jnp.ndarray], rng: jax.Array,
                   patch_loss_fn=None,
                   step=0) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, scalar_stats).  ``batch['rgb']`` is GT per ray.

    Loss terms and weights follow inb_trainer.py:40-240:
      - image MSE (or the patch perceptual loss when patch sampling is on —
        the reference's lpips branch replaces plain MSE, inb_trainer.py:211-214)
      - pair reg * pair_loss_weight
      - distortion * reg_dist_weight (traced, stage-scheduled)
      - residual magnitude * resd_loss_weight
    """
    if lw.remat:
        ret = jax.checkpoint(
            lambda p, b, r: render_rays(mspec, rspec, p, b, train=True,
                                        rng=r))(params, batch, rng)
    else:
        ret = render_rays(mspec, rspec, params, batch, train=True, rng=rng)
    stats: Dict[str, jnp.ndarray] = {}
    loss = jnp.zeros((), jnp.float32)

    # image loss
    rgb_gt = batch["rgb"]
    ray_mask = batch.get("ray_mask")          # (R,) 1 for real rays, 0 for pad
    diff2 = jnp.sum((ret["rgb_map"] - rgb_gt) ** 2, axis=-1) / 3.0
    if ray_mask is not None:
        img_loss = jnp.sum(diff2 * ray_mask) / jnp.maximum(jnp.sum(ray_mask), 1.0)
    else:
        img_loss = jnp.mean(diff2)
    stats["img_loss"] = img_loss
    stats["psnr"] = -10.0 * jnp.log(img_loss) / jnp.log(10.0)

    if lw.use_patch and patch_loss_fn is not None:
        ploss = patch_loss_fn(ret, batch)
        stats["patch_loss"] = ploss
        loss = loss + ploss
    else:
        loss = loss + img_loss

    if lw.use_pair and "pair_resd0" in ret:
        pl = pair_reg_loss(ret["pair_resd0"], ret["pair_resd1"], ret["pair_valid"])
        stats["pair_loss"] = pl
        loss = loss + lw.pair * pl

    if lw.use_distortion and "reg_distortion" in ret:
        dl = jnp.mean(ret["reg_distortion"])
        stats["reg_dist"] = dl
        loss = loss + batch.get("reg_dist_weight", 0.1) * dl

    if "resd" in ret:
        from ..ops.math import safe_norm
        ol = jnp.mean(safe_norm(ret["resd"], axis=-1))
        stats["offset_loss"] = ol
        loss = loss + lw.resd * ol

    # mask-supervision losses (reference inb_renderer.py:117-129 +
    # inb_trainer.py:72-88; off by default like the reference)
    if (lw.use_freespace or lw.use_occ) and "occupancy" in batch:
        occ_s = jnp.clip(ret["occ"], 1e-6, 1.0 - 1e-6)       # (R, S)
        is_bg = (batch["occupancy"] < 0.5)
        if lw.use_freespace:
            bce0 = -jnp.log(1.0 - occ_s)
            denom = jnp.maximum(jnp.sum(is_bg) * occ_s.shape[-1], 1)
            fl = jnp.sum(jnp.where(is_bg[:, None], bce0, 0.0)) / denom
            stats["free_loss"] = fl
            loss = loss + lw.free_weight * fl
        if lw.use_occ:
            max_occ = jnp.max(occ_s, axis=-1)                # (R,)
            # only penalize foreground rays whose max occ is < 0.5
            pen = (~is_bg) & (max_occ < 0.5)
            bce1 = -jnp.log(max_occ)
            ol2 = jnp.sum(jnp.where(pen, bce1, 0.0)) / occ_s.shape[0]
            stats["occ_loss"] = ol2
            loss = loss + lw.occ_weight * ol2

    vloss, vstats = variant_losses(ret, batch, lw, step)
    loss = loss + vloss
    stats.update(vstats)

    for k in ("cull_overflow", "part_overflow"):
        if k in ret:
            stats[k] = ret[k]

    stats["loss"] = loss
    # per-ray error for MSE-guided sampling (reference inb_trainer.py:183,
    # consumed by tpose_dataset.update_global) — non-scalar, host strips it
    stats["ray_error"] = jax.lax.stop_gradient(
        jnp.sum(jnp.abs(ret["rgb_map"] - rgb_gt), axis=-1))
    return loss, stats


def make_train_step(mspec: inb.ModelSpec, rspec: RenderSpec, lw: LossWeights,
                    opt, patch_loss_fn=None):
    """Build the single fused (loss+grad+update) step; caller jits/shards it."""

    def train_step(state: TrainState, batch, rng):
        def loss_fn(p):
            return compute_losses(mspec, rspec, lw, p, batch, rng,
                                  patch_loss_fn, step=state.step)

        # differentiate through the bf16 table shadow (when present): the
        # table cotangents come out bf16 and are converted once for Adam —
        # the same convert the in-forward cast's backward paid
        p_eff = inb.with_grid_shadow(state.params, state.grid_bf16)
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_eff)
        if state.grid_bf16 is not None:
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32)
                if g.dtype == jnp.bfloat16 else g, grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # refresh the shadow from the new params: XLA fuses the bf16 convert
        # into the Adam sweep (a standalone cast cost ~3 ms/step)
        shadow = (inb.grid_shadow(mspec, params)
                  if state.grid_bf16 is not None else None)
        return TrainState(state.step + 1, params, opt_state, shadow), stats

    return train_step
