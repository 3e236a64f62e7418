#!/usr/bin/env python
"""Import a reference (zju3dv/instant-nvr) torch checkpoint into this framework.

Maps the reference ``latest.pth`` state dict onto our parameter pytree so a
user can evaluate / fine-tune a model trained with the reference code:

    python tools/import_torch_ckpt.py --cfg_file configs/inb/inb_377.yaml \
        --ckpt path/to/latest.pth --out exps/inb/inb_377/trained_model

Key correspondences (reference module path -> our pytree path):
  tpose_human.part_networks.<i>.embedder.{dense,hash}  -> embed[<part>]
  tpose_human.part_networks.<i>.occ.linears.<j>.{weight,bias}
        -> occ[<j>]{w,b}[i]   (torch Linear weight is (out,in) -> transpose)
  tpose_human.part_networks.<i>.rgb.linears.<j>        -> rgb[<group>][<j>][slot]
  tpose_human.part_networks.<i>.rgb_latent             -> latent[i]
  tpose_deformer.embedder.{dense,hash}                 -> deformer.embed
  tpose_deformer.mlp.{0,2,4}.{weight,bias}             -> deformer.mlp[<j>]

NOTE: hash-level *indices* hash differently (uint32 vs int64 spatial hash,
see README deviations), so imported hash tables reproduce the reference only
approximately on hashed levels; dense levels and all MLPs map exactly.
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert(state_dict, mspec, params):
    import numpy as np
    import jax.numpy as jnp
    import jax

    from instant_nvr_tpu.ops.hashgrid import pack_table

    sd = {k.replace("net.", "", 1) if k.startswith("net.") else k: v
          for k, v in state_dict.items()}

    def t2n(t):
        return np.asarray(t.detach().cpu().numpy())

    new = jax.tree.map(lambda x: x, params)  # shallow copy structure

    # part networks
    occ_stack = {j: {"w": [], "b": []} for j in range(len(params["occ"]))}
    latent = []
    rgb_groups = {k: None for k in params["rgb"]}
    group_slots = {}
    for (arch, ids) in mspec.rgb_groups():
        key = f"h{arch[0]}_l{arch[1]}"
        group_slots[key] = list(ids)

    rgb_accum = {k: [[] for _ in range(len(v))] for k, v in params["rgb"].items()}

    for i, name in enumerate(mspec.partnames):
        pre = f"tpose_human.part_networks.{i}."
        # embedder tables (scalar grids import as the per-row feature MEAN —
        # exact for the sum_over_features aggregation, see ops/hashgrid.py)
        sc = mspec.part_embeds[i].scalar
        emb = dict(params["embed"][name])
        if pre + "embedder.dense" in sd:
            emb["dense"] = pack_table(
                jnp.asarray(t2n(sd[pre + "embedder.dense"])), scalar=sc)
        if pre + "embedder.hash" in sd:
            h = t2n(sd[pre + "embedder.hash"])  # (H, T, F) -> flat (H*T, F)
            emb["hash"] = pack_table(
                jnp.asarray(h.reshape(-1, h.shape[-1])), scalar=sc)
        new["embed"][name] = emb
        # occ MLP
        for j in range(len(params["occ"])):
            occ_stack[j]["w"].append(t2n(sd[pre + f"occ.linears.{j}.weight"]).T)
            occ_stack[j]["b"].append(t2n(sd[pre + f"occ.linears.{j}.bias"]))
        # latent codes
        latent.append(t2n(sd[pre + "rgb_latent"]))
        # rgb MLP -> its group slot
        for key, ids in group_slots.items():
            if i in ids:
                slot = ids.index(i)
                for j in range(len(params["rgb"][key])):
                    w = t2n(sd[pre + f"rgb.linears.{j}.weight"]).T
                    b = t2n(sd[pre + f"rgb.linears.{j}.bias"])
                    rgb_accum[key][j].append((slot, w, b))

    import numpy as _np
    new["occ"] = [{"w": jnp.asarray(_np.stack(occ_stack[j]["w"])),
                   "b": jnp.asarray(_np.stack(occ_stack[j]["b"]))}
                  for j in range(len(params["occ"]))]
    new["latent"] = jnp.asarray(_np.stack(latent))
    for key in rgb_accum:
        layers = []
        for j, entries in enumerate(rgb_accum[key]):
            entries.sort()
            layers.append({"w": jnp.asarray(_np.stack([e[1] for e in entries])),
                           "b": jnp.asarray(_np.stack([e[2] for e in entries]))})
        new["rgb"][key] = layers

    # deformer
    dfm = dict(params["deformer"])
    demb = dict(dfm["embed"])
    dsc = mspec.deformer.embed.scalar
    if "tpose_deformer.embedder.dense" in sd:
        demb["dense"] = pack_table(
            jnp.asarray(t2n(sd["tpose_deformer.embedder.dense"])), scalar=dsc)
    if "tpose_deformer.embedder.hash" in sd:
        h = t2n(sd["tpose_deformer.embedder.hash"])
        demb["hash"] = pack_table(
            jnp.asarray(h.reshape(-1, h.shape[-1])), scalar=dsc)
    dfm["embed"] = demb
    mlp = []
    for j, li in enumerate([0, 2, 4]):
        mlp.append({"w": jnp.asarray(t2n(sd[f"tpose_deformer.mlp.{li}.weight"]).T),
                    "b": jnp.asarray(t2n(sd[f"tpose_deformer.mlp.{li}.bias"]))})
    dfm["mlp"] = mlp
    new["deformer"] = dfm
    return new


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epoch", type=int, default=0)
    args = p.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from instant_nvr_tpu.config import make_cfg
    from instant_nvr_tpu.models import inb
    from instant_nvr_tpu.train.checkpoint import save_checkpoint
    from instant_nvr_tpu.train.state import TrainState

    cfg = make_cfg(args.cfg_file)
    mspec = inb.build_model_spec(cfg)
    params = inb.init_params(jax.random.key(0), mspec)

    ckpt = torch.load(args.ckpt, map_location="cpu")
    sd = ckpt["net"] if "net" in ckpt else ckpt
    new_params = convert(sd, mspec, params)

    opt = optax.adam(cfg.train.lr, eps=cfg.train.eps)
    state = TrainState(jnp.asarray(0, jnp.int32), new_params, opt.init(new_params))
    save_checkpoint(args.out, args.epoch, state, {"step": 0, "epoch": args.epoch})
    print(f"imported {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
