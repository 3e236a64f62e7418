"""Round-trip the VGG weight exporter's layout against real torch convs.

tools/export_vgg_weights.py converts torchvision state (Cout,Cin,kh,kw) to
the npz layout models/lpips.vgg_load_npz reads (kh,kw,Cin,Cout).  The
mapping is factored to operate on plain numpy arrays, so this test proves —
without torchvision — that a stack synthesized in torch's layout, exported,
loaded, and run through the JAX feature extractor reproduces torch's own
conv/relu/maxpool outputs.  Dropping in a real torchvision export therefore
provably yields official-formula features (reference metric:
``lib/evaluators/if_nerf.py:118-122``, lpips net='vgg').
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from export_vgg_weights import convert_conv_stack, convert_lpips_lins  # noqa: E402

from instant_nvr_tpu.models.lpips import vgg_features, vgg_load_npz  # noqa: E402

torch = pytest.importorskip("torch")

# tiny channel plan (n_convs per stage mirrors VGG16's first 3 stages)
_PLAN = [(4, 2), (6, 2), (8, 3)]


def _torch_stack(seed=0):
    rng = np.random.default_rng(seed)
    convs, c_in = [], 3
    for c_out, n_convs in _PLAN:
        for _ in range(n_convs):
            w = rng.standard_normal((c_out, c_in, 3, 3)).astype(np.float32) * 0.25
            b = rng.standard_normal(c_out).astype(np.float32) * 0.05
            convs.append((w, b))
            c_in = c_out
    return convs


def _torch_features(convs, img):
    """img (H,W,3) -> per-stage relu outputs via torch (NCHW, padding=1)."""
    import torch.nn.functional as F
    x = torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))[None]
    feats, ci = [], 0
    for s, (_, n_convs) in enumerate(_PLAN):
        for _ in range(n_convs):
            w, b = convs[ci]
            x = F.relu(F.conv2d(x, torch.from_numpy(w),
                                torch.from_numpy(b), padding=1))
            ci += 1
        feats.append(x[0].numpy().transpose(1, 2, 0))  # back to HWC
        if s < len(_PLAN) - 1:
            x = F.max_pool2d(x, 2)
    return feats


def test_exported_layout_reproduces_torch_features(tmp_path):
    convs = _torch_stack(seed=3)
    npz = convert_conv_stack(convs, _PLAN, len(_PLAN))
    # every conv mapped, with the documented shape
    assert len(npz) == 2 * sum(n for _, n in _PLAN)
    assert npz["w_0_0"].shape == (3, 3, 3, 4)
    assert npz["w_2_2"].shape == (3, 3, 8, 8)

    p = str(tmp_path / "stack.npz")
    np.savez(p, **npz)
    params = vgg_load_npz(p, _PLAN, len(_PLAN))

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    got = vgg_features(params, img[None])
    want = _torch_features(convs, img)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[0], w, rtol=2e-4, atol=1e-5)


def test_lpips_lin_mapping():
    lins = [np.arange(c, dtype=np.float32).reshape(1, c, 1, 1)
            for c in (4, 6, 8)]
    out = convert_lpips_lins(lins)
    assert set(out) == {"lin_0", "lin_1", "lin_2"}
    np.testing.assert_array_equal(out["lin_1"], np.arange(6, dtype=np.float32))
