"""Torch-checkpoint importer: fabricate a reference-style state dict, import."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_model import tiny_spec
from instant_nvr_tpu.models import inb

sys_path_added = True
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from import_torch_ckpt import convert  # noqa: E402


def _fake_reference_sd(spec, params):
    """Build a torch state dict shaped like the reference's, filled randomly."""
    sd = {}
    g = torch.Generator().manual_seed(0)
    for i, name in enumerate(spec.partnames):
        pre = f"tpose_human.part_networks.{i}."
        es = spec.part_embeds[i]
        # reference tables have LOGICAL shapes (rows, F) / (H, T, F) — the
        # importer tile-pads (and feature-means, for scalar grids) itself
        sd[pre + "embedder.dense"] = torch.randn(
            (es.dense_total, es.n_features), generator=g)
        H, T, F = es.n_hash_levels, es.table_size, es.n_features
        sd[pre + "embedder.hash"] = torch.randn((max(H, 1), T, F), generator=g)
        for j, layer in enumerate(params["occ"]):
            w = layer["w"][i]
            sd[pre + f"occ.linears.{j}.weight"] = torch.randn((w.shape[1], w.shape[0]), generator=g)
            sd[pre + f"occ.linears.{j}.bias"] = torch.randn((w.shape[1],), generator=g)
        dh, nl = spec.rgb_archs[i]
        key = f"h{dh}_l{nl}"
        for j, layer in enumerate(params["rgb"][key]):
            w = layer["w"][0]
            sd[pre + f"rgb.linears.{j}.weight"] = torch.randn((w.shape[1], w.shape[0]), generator=g)
            sd[pre + f"rgb.linears.{j}.bias"] = torch.randn((w.shape[1],), generator=g)
        sd[pre + "rgb_latent"] = torch.randn((spec.num_latent, spec.latent_dim), generator=g)
    dspec = spec.deformer.embed
    sd["tpose_deformer.embedder.dense"] = torch.randn(
        (dspec.dense_total, dspec.n_features), generator=g)
    sd["tpose_deformer.embedder.hash"] = torch.randn(
        (max(dspec.n_hash_levels, 1), dspec.table_size, dspec.n_features), generator=g)
    for j, li in enumerate([0, 2, 4]):
        w = params["deformer"]["mlp"][j]["w"]
        sd[f"tpose_deformer.mlp.{li}.weight"] = torch.randn((w.shape[1], w.shape[0]), generator=g)
        sd[f"tpose_deformer.mlp.{li}.bias"] = torch.randn((w.shape[1],), generator=g)
    return sd


def test_convert_roundtrip():
    spec = tiny_spec()
    params = inb.init_params(jax.random.key(0), spec)
    sd = _fake_reference_sd(spec, params)
    new = convert(sd, spec, params)

    # shapes preserved
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new)):
        assert a.shape == b.shape, (a.shape, b.shape)

    # weight transposition: occ layer 0, part 2
    w_t = sd["tpose_human.part_networks.2.occ.linears.0.weight"].numpy()
    np.testing.assert_allclose(np.asarray(new["occ"][0]["w"][2]), w_t.T)
    # latent mapping
    np.testing.assert_allclose(np.asarray(new["latent"][1]),
                               sd["tpose_human.part_networks.1.rgb_latent"].numpy())
    # hash flattening; scalar grids import the per-row feature mean
    h = sd["tpose_human.part_networks.0.embedder.hash"].numpy()
    flat = h.reshape(-1, h.shape[-1])
    got = np.asarray(new["embed"]["body"]["hash"])
    if spec.part_embeds[0].scalar:
        np.testing.assert_allclose(got[:flat.shape[0]], flat.mean(-1),
                                   rtol=1e-6)
    else:
        np.testing.assert_allclose(got[:flat.shape[0]], flat)
    # rgb group slots: part 3 (larm) is the 2nd member of the small group
    dh, nl = spec.rgb_archs[3]
    ids = [i for i, a in enumerate(spec.rgb_archs) if a == (dh, nl)]
    slot = ids.index(3)
    w_t = sd["tpose_human.part_networks.3.rgb.linears.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(new["rgb"][f"h{dh}_l{nl}"][0]["w"][slot]), w_t.T)
