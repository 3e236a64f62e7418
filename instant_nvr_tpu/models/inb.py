"""The flagship model: part-wise hash-grid dynamic-human NeRF.

TPU-native rebuild of the reference network stack
(``lib/networks/bw_deform/inb_part_network_multiassign.py`` +
``part_base_network.py``).  One fused, jit-able forward:

  world pts -> pose space -> SMPL-distance cull (fixed-budget top-k, replaces
  the reference's ``nonzero`` sync at inb_part_network_multiassign.py:137)
  -> per-part KNN blend weights (MXU matmul, replaces pytorch3d CUDA KNN)
  -> inverse LBS to bigpose -> UV-deformer residual -> per-part hash-grid
  embed + stacked/vmapped occ & color MLPs (replaces the serial Python part
  loop at TPoseHuman.forward:222-227) -> max-occupancy aggregation
  -> scatter back to the full sample set.

Everything is shape-static; validity masks carry the reference's dynamic
sparsity.  The five "experts" share stacked parameters where architectures
agree and are grouped by architecture otherwise (leg/larm/rarm use a 1-layer
color head per the reference config, body/head a 2-layer one).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lbs
from ..ops.grid_sample import pts_sample_volume
from ..ops.hashgrid import (HashGridSpec, hashgrid_encode, hashgrid_init,
                            make_hashgrid_spec, multi_hashgrid_encode)
from ..ops.knn import knn_blend_weights_multiassign
from ..ops.select import scatter_back, topk_select
from .deformer import DeformerSpec, deformer_apply, deformer_init, make_deformer_spec
from .embedders import freq_encode, freq_out_dim
from .nn import kaiming_normal, mlp_apply, mlp_apply_stacked, mlp_init


def _round_budget(n: int, mult: int = 128) -> int:
    return max(mult, ((int(n) + mult - 1) // mult) * mult)


class ModelSpec(NamedTuple):
    """Static (hashable) model description; safe as a jit static arg."""
    partnames: Tuple[str, ...]
    part_embeds: Tuple[HashGridSpec, ...]
    rgb_archs: Tuple[Tuple[int, int], ...]   # per part (d_hidden, n_layers)
    occ_arch: Tuple[int, int]
    geo_feature_dim: int
    latent_dim: int
    num_latent: int
    viewdir_res: int
    deformer: DeformerSpec
    aggr: str
    smpl_thresh: float
    knn_k: int
    knn_radius: float
    knn_chunk: int
    knn_backend: str            # 'auto' | 'pallas' | 'xla'
    cull_frac: float
    part_frac: float
    part_budget_scales: Tuple[float, ...]   # per-part multiplier on part_frac
    tpose_viewdir: bool
    compute_dtype: str          # 'bfloat16' | 'float32' for MLP matmuls
    grid_compute_dtype: str     # table gather/grad-scatter dtype (master
                                # params stay f32; Adam runs in f32)
    select_mode: str = "topk"   # 'topk' (farthest-dropped-first overflow)
                                # | 'partition' (sort-free cumsum compaction
                                # — measured SLOWER on the flagship: 78.3 vs
                                # 75.4 ms/step, the scatter-compaction costs
                                # more than the bitonic sort it avoids)

    @property
    def num_parts(self) -> int:
        return len(self.partnames)

    @property
    def embed_dim(self) -> int:
        return self.part_embeds[0].out_dim

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def rgb_groups(self) -> List[Tuple[Tuple[int, int], Tuple[int, ...]]]:
        """[(arch, part_ids)] grouped by identical color-head architecture."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, arch in enumerate(self.rgb_archs):
            groups.setdefault(arch, []).append(i)
        return [(arch, tuple(ids)) for arch, ids in groups.items()]


def build_model_spec(cfg) -> ModelSpec:
    """Assemble the spec from a ported inb YAML config."""
    primes = tuple(cfg.ps)
    partnames = tuple(lbs.PARTNAMES)
    part_embeds = []
    rgb_archs = []
    default_color = (cfg.network.color.d_hidden, cfg.network.color.n_layers)
    # the scalar-grid reparameterization (ops/hashgrid.py) is exact for
    # Adam's scale-invariant update with zero weight decay — the reference
    # setup.  SGD would see an F x effective-lr shift and decayed weights
    # act per-feature, so gate it on the optimizer config.
    scalar_ok = (cfg.train.get("optim", "adam") == "adam"
                 and not cfg.train.get("weight_decay", 0.0)
                 and cfg.get("scalar_tables", True))
    # full-precision runs must not round table gradients to bf16 in the
    # one-hot scatter backward (ADVICE r4; ops/hashgrid._table_gather_bwd)
    exact = cfg.get("grid_compute_dtype", "bfloat16") == "float32"
    for p in partnames:
        node = cfg.partnet[p]
        part_embeds.append(make_hashgrid_spec(primes=primes,
                                              scalar_tables=scalar_ok,
                                              exact_grads=exact,
                                              **node.embedder.kwargs.to_dict()))
        if "color_network" in node and "kwargs" in node.color_network:
            kw = node.color_network.kwargs
            rgb_archs.append((kw.d_hidden, kw.n_layers))
        else:
            rgb_archs.append(default_color)
    deformer = make_deformer_spec(cfg.tpose_deformer.embedder.kwargs.to_dict(),
                                  primes, scalar_ok=scalar_ok,
                                  exact_grads=exact)
    return ModelSpec(
        partnames=partnames,
        part_embeds=tuple(part_embeds),
        rgb_archs=tuple(rgb_archs),
        occ_arch=(cfg.network.occ.d_hidden, cfg.network.occ.n_layers),
        geo_feature_dim=cfg.geo_feature_dim,
        latent_dim=cfg.latent_code_dim,
        num_latent=cfg.num_latent_code,
        viewdir_res=cfg.viewdir_embedder.kwargs.res,
        deformer=deformer,
        aggr=cfg.aggr,
        smpl_thresh=cfg.smpl_thresh,
        knn_k=cfg.knn_k,
        knn_radius=cfg.knn_radius,
        knn_chunk=cfg.knn_chunk,
        knn_backend=cfg.get("knn_backend", "auto"),
        cull_frac=cfg.cull_budget,
        part_frac=cfg.part_budget,
        part_budget_scales=tuple(cfg.get("part_budget_scales",
                                         [1.0, 0.75, 0.5, 0.25, 0.25])),
        tpose_viewdir=cfg.tpose_viewdir,
        compute_dtype=cfg.mlp_dtype,
        grid_compute_dtype=cfg.get("grid_compute_dtype", "bfloat16"),
        select_mode=cfg.get("select_mode", "topk"),
    )


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_params(key: jax.Array, spec: ModelSpec) -> Dict[str, Any]:
    P = spec.num_parts
    E = spec.embed_dim
    keys = jax.random.split(key, 8)

    embed = {}
    for i, name in enumerate(spec.partnames):
        embed[name] = hashgrid_init(jax.random.fold_in(keys[0], i), spec.part_embeds[i])

    # occ MLPs: same arch everywhere -> stack leaves over the part axis
    dh, nl = spec.occ_arch
    occ_list = [mlp_init(jax.random.fold_in(keys[1], i), E,
                         1 + spec.geo_feature_dim, dh, nl) for i in range(P)]
    # NEGATIVE occupancy-logit bias: with 1-exp(-softplus(h)) a zero init
    # puts occ ~0.5 EVERYWHERE, and unlike the reference (which supervises
    # every threshold-passing sample) the fixed budgets can leave far
    # points untrained — at occ 0.5 those render as phantom haze (measured
    # -2.8 dB at eval, round 2).  Start near-transparent (occ ~0.05)
    # so anything the budgets never supervise stays invisible.
    for layers in occ_list:
        layers[-1]["b"] = layers[-1]["b"].at[0].set(-3.0)
    occ = jax.tree.map(lambda *xs: jnp.stack(xs), *occ_list)

    # rgb heads grouped by arch
    rgb_in = E + freq_out_dim(spec.viewdir_res) + spec.geo_feature_dim + spec.latent_dim
    rgb_groups = {}
    for (arch, ids) in spec.rgb_groups():
        dh_g, nl_g = arch
        ls = [mlp_init(jax.random.fold_in(keys[2], i), rgb_in, 3, dh_g, nl_g)
              for i in ids]
        rgb_groups[f"h{dh_g}_l{nl_g}"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ls)

    latent = kaiming_normal(keys[3], (P, spec.num_latent, spec.latent_dim))
    deformer = deformer_init(keys[4], spec.deformer)
    return {"embed": embed, "occ": occ, "rgb": rgb_groups,
            "latent": latent, "deformer": deformer}


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def grid_shadow(spec: ModelSpec, params):
    """bf16 copies of the PART hash-table leaves (None when tables compute
    f32).  The train step refreshes this from the just-updated master params
    so the convert fuses into the Adam sweep; forward then skips its own
    cast.

    The deformer tables stay f32 on purpose: they are tiny (~100 KB — the
    uvt grid caps at 2^14 rows/level) so their gathers are row-latency
    bound, not bandwidth bound, and a bf16 gather output forced a standalone
    full-record-stream bf16->f32 convert before the f32 lerp (5.4 ms/step
    in the round-4 patch trace, docs/PERF.md)."""
    if spec.grid_compute_dtype != "bfloat16":
        return None
    gd = jnp.bfloat16
    return {"embed": jax.tree.map(lambda x: x.astype(gd), params["embed"])}


def with_grid_shadow(params, shadow):
    """Replace table leaves with their bf16 shadow (no-op when shadow=None)."""
    if shadow is None:
        return params
    p = dict(params)
    p["embed"] = shadow["embed"]
    return p


def _cast_tables(spec: ModelSpec, params):
    """In-forward bf16 table cast (part grids only — see grid_shadow);
    skipped when a shadow already applied."""
    if spec.grid_compute_dtype != "bfloat16":
        return params
    if jax.tree.leaves(params["embed"])[0].dtype == jnp.bfloat16:
        return params
    gd = jnp.bfloat16
    params = dict(params)
    params["embed"] = jax.tree.map(lambda x: x.astype(gd), params["embed"])
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def resd_fn(spec: ModelSpec, params, pts: jnp.ndarray, batch) -> jnp.ndarray:
    """Residual field at arbitrary canonical points (for pair regularization;
    reference ``Network.resd``, inb_part_network_multiassign.py:122-124)."""
    return deformer_apply(spec.deformer, params["deformer"], pts,
                          batch["tuv"], batch["tbounds"], batch["frame_dim"],
                          tuv_sizes=batch.get("tuv_sizes"),
                          compute_dtype=spec.cdtype)


def forward_parts(spec: ModelSpec, params, wpts: jnp.ndarray, viewdir: jnp.ndarray,
                  batch: Dict[str, jnp.ndarray], train: bool) -> Dict[str, jnp.ndarray]:
    """Reference implementation: statically-unrolled per-part pipeline.

    Numerically equivalent to :func:`forward` (which batches the five parts
    into stacked/fused ops); kept as the oracle for the equivalence test
    (tests/test_model.py::test_forward_matches_parts_reference) — the
    per-part unroll costs ~25 ms/step in smal-op dispatch overhead on TPU.
    """
    N = wpts.shape[0]
    P = spec.num_parts
    cd = spec.cdtype

    # bf16 table COMPUTE: gathers/grad-scatters move half the bytes (-25%
    # gather, -34% scatter measured); master params stay f32 (train passes a
    # pre-cast shadow via with_grid_shadow, eval casts here)
    params = _cast_tables(spec, params)

    # 1. world -> pose space (blend_utils.py:366-382)
    pose_pts = lbs.world_points_to_pose_points(wpts, batch["R"], batch["Th"])
    pose_dirs = lbs.world_dirs_to_pose_dirs(viewdir, batch["R"])

    # 2. SMPL-distance cull via the pose bw volume's distance channel
    #    (inb_part_network_multiassign.py:133-140) — fixed-budget top-k
    pnorm = pts_sample_volume(jax.lax.stop_gradient(pose_pts), batch["pbw"],
                              batch["pbounds"], sizes=batch.get("pbw_sizes"))[:, -1]
    K = _round_budget(spec.cull_frac * N)
    K = min(K, _round_budget(N))
    cidx, cvalid = topk_select(pnorm, K, spec.smpl_thresh)
    cpts = pose_pts[cidx]                      # (K, 3)
    cdirs = pose_dirs[cidx]

    # 3. per-part KNN blend weights (blend_utils.py:817-825), no grad
    backend = spec.knn_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        from ..ops.knn import knn_blend_weights_multiassign_pallas
        knn = knn_blend_weights_multiassign_pallas(
            jax.lax.stop_gradient(cpts), batch["part_pts"], batch["part_pbw"],
            batch["lengths2"], K=spec.knn_k, radius=spec.knn_radius)
    else:
        knn = knn_blend_weights_multiassign(
            jax.lax.stop_gradient(cpts), batch["part_pts"], batch["part_pbw"],
            batch["lengths2"], K=spec.knn_k, radius=spec.knn_radius,
            chunk=spec.knn_chunk)              # (K, P, 25)
    pred_pbw = jax.lax.stop_gradient(knn[..., :24])
    part_dist = jax.lax.stop_gradient(knn[..., 24])          # (K, P)
    pflag = (part_dist < spec.smpl_thresh) & cvalid[:, None]  # (K, P)

    # 4.-9. per-part pipeline, statically unrolled with PER-PART budgets.
    #    Selection comes FIRST so LBS / deformation / embedding run only on
    #    each part's budgeted points (the reference expands every culled
    #    point to every part, TPoseHuman.forward:204-234).  Budgets scale
    #    per part: the body needs far more slots than an arm, and embed
    #    gather/grad-scatter rows are the step's dominant cost on TPU.
    tmid = jnp.mean(batch["tbounds"], axis=0)
    part_bounds = batch["part_bounds"]         # (P, 2, 3)
    A1 = batch["A"][None]
    bigA1 = batch["big_A"][None]

    raws = jnp.zeros((K, P, 4), jnp.float32)
    occs = jnp.zeros((K, P, 1), jnp.float32)
    resd_list, tpts_list, tocc_list, tflag_list = [], [], [], []

    # pass 1: selection + LBS per part (collect for one fused deformer call)
    sel = []
    for p in range(P):
        Kp = min(_round_budget(spec.part_frac * spec.part_budget_scales[p] * K), K)
        score = jnp.where(pflag[:, p], part_dist[:, p], jnp.inf)
        idx_p, valid_p = topk_select(score, Kp, spec.smpl_thresh)

        sel_pts = cpts[idx_p]                  # (Kp, 3)
        sel_dirs = cdirs[idx_p]
        sel_bw = pred_pbw[:, p, :][idx_p]      # (Kp, 24)
        # sanitize invalid slots: all-zero blend weights make A_bw singular
        # and garbage propagates NaN gradients through masked `where`
        sel_bw = jnp.where(valid_p[:, None], sel_bw, 1.0 / 24.0)

        # inverse LBS pose -> tpose -> bigpose (inb_part_network.py:98-102)
        A_bw, R_inv = lbs.inverse_blend_params(sel_bw[None], A1)
        big_A_bw = lbs.blend_transforms(sel_bw[None], bigA1)
        init_tpose = lbs.pose_points_to_tpose_points(sel_pts[None], A_bw, R_inv)
        init_bigpose = lbs.tpose_points_to_pose_points(init_tpose, big_A_bw)[0]
        if spec.tpose_viewdir:
            init_tdirs = lbs.pose_dirs_to_tpose_dirs(sel_dirs[None], R_inv)
            dirs_p = lbs.tpose_dirs_to_pose_dirs(init_tdirs, big_A_bw)[0]
        else:
            dirs_p = sel_dirs

        # sanitize invalid canonical positions (finite, in-range)
        init_bigpose = jnp.where(valid_p[:, None], init_bigpose, tmid)
        sel.append(dict(idx=idx_p, valid=valid_p, bigpose=init_bigpose,
                        dirs=dirs_p))

    # ONE deformer call over all parts' points (one gather/scatter set into
    # the deformer tables instead of five)
    all_big = jnp.concatenate([s["bigpose"] for s in sel], axis=0)
    all_valid = jnp.concatenate([s["valid"] for s in sel], axis=0)
    all_resd = deformer_apply(spec.deformer, params["deformer"], all_big,
                              batch["tuv"], batch["tbounds"],
                              batch["frame_dim"], flag=all_valid,
                              tuv_sizes=batch.get("tuv_sizes"),
                              compute_dtype=cd)
    offsets = np.cumsum([0] + [s["bigpose"].shape[0] for s in sel])

    # pass 2: embed + heads per part
    for p, name in enumerate(spec.partnames):
        s = sel[p]
        idx_p, valid_p = s["idx"], s["valid"]
        init_bigpose, dirs_p = s["bigpose"], s["dirs"]
        resd_p = all_resd[offsets[p]:offsets[p + 1]]
        tpose_p = init_bigpose + resd_p        # (Kp, 3)

        # hash embed + occ head (part_base_network.py:44-53)
        emb = hashgrid_encode(spec.part_embeds[p], params["embed"][name],
                              tpose_p, part_bounds[p])
        occ_layers = [jax.tree.map(lambda a: a[p], layer)
                      for layer in params["occ"]]
        hidden = mlp_apply(occ_layers, emb, cd)
        occ_v = 1.0 - jnp.exp(-jax.nn.softplus(hidden[..., :1]))  # (Kp, 1)
        feature = hidden[..., 1:]

        # color head (part_base_network.py:54-58)
        dir_embed = freq_encode(dirs_p, spec.viewdir_res)
        latent = params["latent"][p, batch["latent_index"], :]
        latent = jnp.broadcast_to(latent[None, :], (emb.shape[0], spec.latent_dim))
        rgb_in = jnp.concatenate([emb, dir_embed, feature, latent], axis=-1)
        dh_g, nl_g = spec.rgb_archs[p]
        gkey = f"h{dh_g}_l{nl_g}"
        slot = [ids for arch, ids in spec.rgb_groups() if arch == (dh_g, nl_g)][0].index(p)
        rgb_layers = [jax.tree.map(lambda a: a[slot], layer)
                      for layer in params["rgb"][gkey]]
        rgb_v = jax.nn.sigmoid(mlp_apply(rgb_layers, rgb_in, cd))  # (Kp, 3)

        raw_v = jnp.concatenate([rgb_v, occ_v], axis=-1).astype(jnp.float32)
        raws = raws.at[idx_p, p].set(
            jnp.where(valid_p[:, None], raw_v, 0.0), mode="drop")
        occs = occs.at[idx_p, p].set(
            jnp.where(valid_p[:, None], occ_v.astype(jnp.float32), 0.0),
            mode="drop")

        resd_list.append(resd_p)
        tpts_list.append(init_bigpose)
        tocc_list.append(occ_v)
        tflag_list.append(valid_p)

    # 10. aggregation across parts (TPoseHuman.forward:236-256)
    if spec.aggr == "mean":
        raw = jnp.mean(raws, axis=1)
        occ = jnp.mean(occs, axis=1)
    elif spec.aggr == "dist":
        inv = 1.0 / (part_dist + 1e-5)
        inv = inv / jnp.maximum(jnp.linalg.norm(inv, axis=-1, keepdims=True), 1e-12)
        raw = jnp.sum(raws * inv[..., None], axis=1)
        occ = jnp.sum(occs * inv[..., None], axis=1)
    else:  # default: argmax-occupancy winner takes the color, max occ
        win = jnp.argmax(occs[..., 0], axis=1)                 # (K,)
        raw = jnp.take_along_axis(raws, win[:, None, None], axis=1)[:, 0]
        occ = jnp.max(occs, axis=1)

    # 11. scatter back to the full sample set (inb_part_network_multiassign.py:154-161)
    raw_full = scatter_back(jnp.zeros((N, 4), raw.dtype), cidx, raw, cvalid)
    occ_full = scatter_back(jnp.zeros((N, 1), occ.dtype), cidx, occ, cvalid)

    # budget-overflow telemetry, train AND eval (see forward's step 11 note):
    # tune cull_budget / part_budget[_scales] until ~0 on the target dataset;
    # the eval runner auto-raises budgets from the *_need signals
    true_surv = jnp.sum(pnorm < spec.smpl_thresh)
    sel_surv = jnp.sum(cvalid)
    flag_total = jnp.sum(pflag)
    sel_total = sum(jnp.sum(s["valid"]) for s in sel)
    ret = {
        "raw": raw_full, "occ": occ_full,
        "cull_overflow": (true_surv - sel_surv) / jnp.maximum(true_surv, 1),
        "part_overflow": (flag_total - sel_total) / jnp.maximum(flag_total, 1),
        "cull_need": true_surv / N,
        "part_need": jnp.sum(pflag, axis=0) / K,
    }
    if train:
        ret.update({
            # flat selected-point tensors (sum of per-part budgets), masked
            "resd": jnp.concatenate(resd_list, axis=0),    # (SKp, 3)
            "tpts": jnp.concatenate(tpts_list, axis=0),    # (SKp, 3)
            "tocc": jnp.concatenate(tocc_list, axis=0),    # (SKp, 1)
            "tflag": jnp.concatenate(tflag_list, axis=0),  # (SKp,)
            "cull_valid": cvalid,
        })
    return ret


def forward(spec: ModelSpec, params, wpts: jnp.ndarray, viewdir: jnp.ndarray,
            batch: Dict[str, jnp.ndarray], train: bool) -> Dict[str, jnp.ndarray]:
    """wpts/viewdir: (N, 3) flattened ray samples -> dict with raw (N, 4).

    ``batch`` carries the per-frame SMPL metadata (see datasets layer):
    R (3,3), Th (1,3), A/big_A (24,4,4), pbw (X,Y,Z,25)+pbw_sizes+pbounds,
    part_pts/part_pbw/lengths2, part_bounds (P,2,3), tuv+tuv_sizes+tbounds,
    latent_index (int32 scalar), frame_dim (f32 scalar).

    The five part "experts" run as ONE batched pipeline (round 3): a single
    batched top_k selects every part's budget at once, LBS runs on the
    part-major concatenation (the bone transforms are shared — the per-part
    LBS unroll was pure op-count waste), the hash encoding is the fused
    multi-table path (ops/hashgrid.multi_hashgrid_encode), and the MLP heads
    are stacked-expert einsums.  Numerically equivalent to
    :func:`forward_parts` (tested); the reference executes the same model as
    five serial python-loop iterations (TPoseHuman.forward:222-227).
    """
    N = wpts.shape[0]
    P = spec.num_parts
    cd = spec.cdtype

    # bf16 table COMPUTE: gathers/grad-scatters move half the bytes (-25%
    # gather, -34% scatter measured); master params stay f32 (train passes a
    # pre-cast shadow via with_grid_shadow, eval casts here)
    params = _cast_tables(spec, params)

    # 1. world -> pose space (blend_utils.py:366-382)
    pose_pts = lbs.world_points_to_pose_points(wpts, batch["R"], batch["Th"])
    pose_dirs = lbs.world_dirs_to_pose_dirs(viewdir, batch["R"])

    # 2. SMPL-distance cull (fixed-budget top-k; inb_part_network.py:133-140)
    pnorm = pts_sample_volume(jax.lax.stop_gradient(pose_pts), batch["pbw"],
                              batch["pbounds"], sizes=batch.get("pbw_sizes"))[:, -1]
    K = _round_budget(spec.cull_frac * N)
    K = min(K, _round_budget(N))
    if spec.select_mode == "partition":
        from ..ops.select import partition_select
        cidx, cvalid = partition_select(pnorm, K, spec.smpl_thresh)
    else:
        cidx, cvalid = topk_select(pnorm, K, spec.smpl_thresh)
    cpts = pose_pts[cidx]                      # (K, 3)
    cdirs = pose_dirs[cidx]

    # 3. per-part KNN blend weights (blend_utils.py:817-825), no grad
    backend = spec.knn_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        from ..ops.knn import knn_blend_weights_multiassign_pallas
        knn = knn_blend_weights_multiassign_pallas(
            jax.lax.stop_gradient(cpts), batch["part_pts"], batch["part_pbw"],
            batch["lengths2"], K=spec.knn_k, radius=spec.knn_radius)
    else:
        knn = knn_blend_weights_multiassign(
            jax.lax.stop_gradient(cpts), batch["part_pts"], batch["part_pbw"],
            batch["lengths2"], K=spec.knn_k, radius=spec.knn_radius,
            chunk=spec.knn_chunk)              # (K, P, 25)
    pred_pbw = jax.lax.stop_gradient(knn[..., :24])
    part_dist = jax.lax.stop_gradient(knn[..., 24])          # (K, P)
    pflag = (part_dist < spec.smpl_thresh) & cvalid[:, None]  # (K, P)

    # 4. batched per-part selection into the (P, Kmax) padded layout.
    #    'partition': one cumsum compaction (sort-free).  'topk': ONE
    #    batched top_k — part p's budget Kp is the leading slice ([:Kp] of a
    #    Kmax top_k IS the per-part top_k — exact, not approximate).
    Kps = tuple(min(_round_budget(spec.part_frac * spec.part_budget_scales[p] * K), K)
                for p in range(P))
    Kmax = max(Kps)
    offs = np.cumsum((0,) + Kps)
    M = int(offs[-1])
    pid = np.repeat(np.arange(P), Kps)         # (M,) host constant
    kp_arr = jnp.asarray(Kps, jnp.int32)
    if spec.select_mode == "partition":
        from ..ops.select import _fixed_perm
        perm = _fixed_perm(K)      # random drop order under overflow
        valid_pk = pflag.T[:, perm]                          # (P, K)
        pos = jnp.cumsum(valid_pk.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(valid_pk & (pos < kp_arr[:, None]), pos, Kmax)
        flat_slot = slot + (jnp.arange(P, dtype=jnp.int32) * (Kmax + 1))[:, None]
        idx_b = jnp.zeros((P * (Kmax + 1),), jnp.int32).at[
            flat_slot.reshape(-1)].set(
            jnp.broadcast_to(perm[None, :], (P, K)).reshape(-1),
            mode="drop").reshape(P, Kmax + 1)[:, :Kmax]
        count = jnp.minimum(pos[:, -1] + 1, kp_arr)
        valid_pad = jnp.arange(Kmax, dtype=jnp.int32)[None, :] < count[:, None]
        valid_b = valid_pad
    else:
        score = jnp.where(pflag, part_dist, jnp.inf).T       # (P, K)
        neg, idx_b = jax.lax.top_k(-score, Kmax)             # (P, Kmax)
        valid_b = (-neg) < spec.smpl_thresh
        valid_pad = valid_b & (jnp.arange(Kmax, dtype=jnp.int32)[None, :]
                               < kp_arr[:, None])

    all_idx = jnp.concatenate([idx_b[p, :Kps[p]] for p in range(P)])   # (M,)
    all_valid = jnp.concatenate([valid_b[p, :Kps[p]] for p in range(P)])
    sel_pts = cpts[all_idx]
    sel_dirs = cdirs[all_idx]
    # blend weights for (point, its part): flat gather into (K*P, 24)
    flat_bw = all_idx * P + jnp.asarray(pid, jnp.int32)
    sel_bw = pred_pbw.reshape(K * P, lbs.NUM_BONES)[flat_bw]
    # sanitize invalid slots: all-zero blend weights make A_bw singular
    sel_bw = jnp.where(all_valid[:, None], sel_bw, 1.0 / lbs.NUM_BONES)

    # 5. inverse LBS pose -> tpose -> bigpose ONCE on the concat (the bone
    #    transforms are per-frame, not per-part; inb_part_network.py:98-102)
    tmid = jnp.mean(batch["tbounds"], axis=0)
    A1 = batch["A"][None]
    bigA1 = batch["big_A"][None]
    A_bw, R_inv = lbs.inverse_blend_params(sel_bw[None], A1)
    big_A_bw = lbs.blend_transforms(sel_bw[None], bigA1)
    init_tpose = lbs.pose_points_to_tpose_points(sel_pts[None], A_bw, R_inv)
    init_bigpose = lbs.tpose_points_to_pose_points(init_tpose, big_A_bw)[0]
    if spec.tpose_viewdir:
        init_tdirs = lbs.pose_dirs_to_tpose_dirs(sel_dirs[None], R_inv)
        all_dirs = lbs.tpose_dirs_to_pose_dirs(init_tdirs, big_A_bw)[0]
    else:
        all_dirs = sel_dirs
    init_bigpose = jnp.where(all_valid[:, None], init_bigpose, tmid)

    # 6. deformer residual on the concat (one gather/scatter set)
    all_resd = deformer_apply(spec.deformer, params["deformer"], init_bigpose,
                              batch["tuv"], batch["tbounds"],
                              batch["frame_dim"], flag=all_valid,
                              tuv_sizes=batch.get("tuv_sizes"),
                              compute_dtype=cd)
    tpose = init_bigpose + all_resd            # (M, 3)

    # 7. fused multi-part hash encoding (one record stream for all tables)
    emb = multi_hashgrid_encode(spec.part_embeds,
                                [params["embed"][n] for n in spec.partnames],
                                tpose, batch["part_bounds"], Kps)  # (M, E)

    # 8. stacked-expert heads on the (P, Kmax) padded view
    E = emb.shape[-1]
    def pad_parts(x):
        out = jnp.zeros((P, Kmax) + x.shape[1:], x.dtype)
        for p in range(P):
            out = jax.lax.dynamic_update_slice(
                out, x[offs[p]:offs[p + 1]][None], (p, 0) + (0,) * (x.ndim - 1))
        return out

    emb_pad = pad_parts(emb)
    hidden = mlp_apply_stacked(params["occ"], emb_pad, cd)   # (P, Kmax, 1+geo)
    occ_v = 1.0 - jnp.exp(-jax.nn.softplus(hidden[..., :1]))
    feature = hidden[..., 1:]

    dir_pad = pad_parts(freq_encode(all_dirs, spec.viewdir_res))
    latent = params["latent"][:, batch["latent_index"], :]   # (P, D)
    latent = jnp.broadcast_to(latent[:, None, :], (P, Kmax, spec.latent_dim))
    rgb_in = jnp.concatenate([emb_pad, dir_pad, feature, latent], axis=-1)

    rgb_v = jnp.zeros((P, Kmax, 3), jnp.float32)
    for (arch, ids) in spec.rgb_groups():
        gkey = f"h{arch[0]}_l{arch[1]}"
        sub = rgb_in[jnp.asarray(ids, jnp.int32)]
        out = jax.nn.sigmoid(mlp_apply_stacked(params["rgb"][gkey], sub, cd))
        rgb_v = rgb_v.at[jnp.asarray(ids, jnp.int32)].set(out.astype(jnp.float32))

    raw_v = jnp.concatenate([rgb_v, occ_v.astype(jnp.float32)], axis=-1)  # (P, Kmax, 4)

    # 9. ONE flat scatter back to the (K, P) per-part slots
    flat_idx = jnp.where(valid_pad,
                         idx_b * P + jnp.arange(P, dtype=jnp.int32)[:, None],
                         K * P)
    raws = jnp.zeros((K * P, 4), jnp.float32).at[flat_idx.reshape(-1)].set(
        jnp.where(valid_pad[..., None], raw_v, 0.0).reshape(-1, 4),
        mode="drop").reshape(K, P, 4)
    occs = raws[..., 3:]                       # (K, P, 1)

    # 10. aggregation across parts (TPoseHuman.forward:236-256)
    if spec.aggr == "mean":
        raw = jnp.mean(raws, axis=1)
        occ = jnp.mean(occs, axis=1)
    elif spec.aggr == "dist":
        inv = 1.0 / (part_dist + 1e-5)
        inv = inv / jnp.maximum(jnp.linalg.norm(inv, axis=-1, keepdims=True), 1e-12)
        raw = jnp.sum(raws * inv[..., None], axis=1)
        occ = jnp.sum(occs * inv[..., None], axis=1)
    else:  # default: argmax-occupancy winner takes the color, max occ
        win = jnp.argmax(occs[..., 0], axis=1)                 # (K,)
        raw = jnp.take_along_axis(raws, win[:, None, None], axis=1)[:, 0]
        occ = jnp.max(occs, axis=1)

    # 11. scatter back to the full sample set (inb_part_network.py:154-161)
    raw_full = scatter_back(jnp.zeros((N, 4), raw.dtype), cidx, raw, cvalid)
    occ_full = scatter_back(jnp.zeros((N, 1), occ.dtype), cidx, occ, cvalid)

    # budget telemetry, train AND eval: overflow = fraction of
    # threshold-passing points the fixed budgets dropped; *_need = observed
    # demand as a fraction of the enclosing budget, used by the eval runner
    # to auto-raise budgets until overflow is exactly 0 (the reference
    # computes every threshold-surviving sample at eval,
    # inb_renderer.py:217-237 — fixed budgets must not silently drop any)
    true_surv = jnp.sum(pnorm < spec.smpl_thresh)
    sel_surv = jnp.sum(cvalid)
    flag_total = jnp.sum(pflag)
    sel_total = jnp.sum(all_valid)
    ret = {
        "raw": raw_full, "occ": occ_full,
        "cull_overflow": (true_surv - sel_surv) / jnp.maximum(true_surv, 1),
        "part_overflow": (flag_total - sel_total) / jnp.maximum(flag_total, 1),
        "cull_need": true_surv / N,                      # needed cull_frac
        "part_need": jnp.sum(pflag, axis=0) / K,         # (P,) needed Kp/K
    }
    if train:
        # flat (M, 1) occupancies for pair reg: constant-index gather from
        # the padded (P, Kmax) view
        tocc_idx = jnp.asarray(
            np.concatenate([p * Kmax + np.arange(Kps[p]) for p in range(P)]),
            jnp.int32)
        ret.update({
            "resd": all_resd,                  # (M, 3)
            "tpts": init_bigpose,              # (M, 3)
            "tocc": occ_v.reshape(P * Kmax, 1)[tocc_idx],  # (M, 1)
            "tflag": all_valid,                # (M,)
            "cull_valid": cvalid,
        })
    return ret
