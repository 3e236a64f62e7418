"""Import the torch reference implementation (/root/reference) on CPU.

The reference is CUDA-only at import time (module-level ``device='cuda'``
tensors in ``lib/utils/blend_utils.py:248-290``, a missing ``pytorch3d``
dependency, ``colored_traceback``, and an argparse-at-import config,
SURVEY.md Q4/Q5).  This loader neuters exactly those four things so the
reference modules run on CPU torch and can serve as *golden oracles* for
the rebuild's numerics (VERDICT r4 "Next round" #1):

  - ``torch.tensor`` is wrapped to map ``device='cuda*'`` -> cpu (covers the
    module-level constant tensors; nothing else in the oracle-tested code
    constructs cuda tensors).
  - ``pytorch3d.ops.knn.knn_points`` is stubbed with an exact brute-force
    torch implementation honoring ``lengths2`` padding (the only pytorch3d
    API the reference touches, blend_utils.py:5,732-738).
  - ``colored_traceback`` is stubbed (pure cosmetics).
  - ``sys.argv``/cwd are staged so ``lib.config`` parses
    ``configs/inb/inb_377.yaml`` — the flagship config.

Nothing from the reference is copied; it is *imported* and executed as a
test oracle only.
"""
from __future__ import annotations

import os
import sys
import types
from collections import namedtuple

REFERENCE_ROOT = "/root/reference"

_cache = None


def _stub_colored_traceback():
    ct = types.ModuleType("colored_traceback")
    ct_auto = types.ModuleType("colored_traceback.auto")
    ct.auto = ct_auto
    sys.modules.setdefault("colored_traceback", ct)
    sys.modules.setdefault("colored_traceback.auto", ct_auto)


def _patch_torch_cuda_factories(torch):
    if getattr(torch, "_nvr_oracle_patched", False):
        return
    orig = torch.tensor

    def tensor(*a, **k):
        d = k.get("device")
        if isinstance(d, str) and "cuda" in d:
            k["device"] = "cpu"
        return orig(*a, **k)

    torch.tensor = tensor
    torch._nvr_oracle_patched = True


def _stub_pytorch3d(torch):
    KNN = namedtuple("KNN", ["dists", "idx", "knn"])

    def knn_points(p1, p2, K=1, lengths1=None, lengths2=None,
                   return_nn=False, return_sorted=True, **_kw):
        B, N, _ = p1.shape
        M = p2.shape[1]
        d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)  # B,N,M
        if lengths2 is not None:
            ar = torch.arange(M, device=p1.device)[None, None, :]
            d = d.masked_fill(ar >= lengths2[:, None, None], float("inf"))
        dists, idx = torch.topk(d, K, dim=-1, largest=False)
        nn = None
        if return_nn:
            nn = torch.gather(p2[:, None].expand(B, N, M, p2.shape[-1]), 2,
                              idx[..., None].expand(B, N, K, p2.shape[-1]))
        return KNN(dists=dists, idx=idx, knn=nn)

    p3d = types.ModuleType("pytorch3d")
    p3d_ops = types.ModuleType("pytorch3d.ops")
    p3d_knn = types.ModuleType("pytorch3d.ops.knn")
    p3d_knn.knn_points = knn_points
    p3d.ops = p3d_ops
    p3d_ops.knn = p3d_knn
    sys.modules.setdefault("pytorch3d", p3d)
    sys.modules.setdefault("pytorch3d.ops", p3d_ops)
    sys.modules.setdefault("pytorch3d.ops.knn", p3d_knn)


def _stub_torchsearchsorted(torch):
    """The reference's sample_pdf imports the vendored CUDA extension at call
    time; on CPU, torch.searchsorted(right=True) has identical semantics."""
    mod = types.ModuleType("torchsearchsorted")

    def searchsorted(a, v, side="right"):
        return torch.searchsorted(a, v, right=(side == "right")).int()

    mod.searchsorted = searchsorted
    sys.modules.setdefault("torchsearchsorted", mod)


def load_reference():
    """Import and return a namespace of reference modules (cached)."""
    global _cache
    if _cache is not None:
        return _cache
    if not os.path.isdir(REFERENCE_ROOT):
        return None

    import torch

    _stub_colored_traceback()
    _patch_torch_cuda_factories(torch)
    _stub_pytorch3d(torch)
    _stub_torchsearchsorted(torch)
    # trimesh is imported at module scope by if_nerf_data_utils but only
    # used by a ply-loading helper the oracle tests never touch
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))

    old_cwd = os.getcwd()
    old_argv = sys.argv
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        os.chdir(REFERENCE_ROOT)
        sys.argv = ["oracle", "--cfg_file", "configs/inb/inb_377.yaml",
                    "--type", "vis"]
        from lib.config import cfg  # noqa: F401  (argparse happens here)
        import lib.utils.blend_utils as blend_utils
        import lib.utils.net_utils as net_utils
        import lib.networks.renderer.nerf_net_utils as nerf_net_utils
        import lib.utils.loss_utils as loss_utils
        import lib.train.trainers.crit as crit
        from lib.networks.embedders.part_base_embedder import Embedder as HashEmbedder
        from lib.networks.embedders.freq_embedder import PosEnc
        import lib.utils.if_nerf.if_nerf_data_utils as if_nerf_dutils
        import lib.utils.optimizer.lr_scheduler as lr_scheduler
    finally:
        os.chdir(old_cwd)
        sys.argv = old_argv
        # demote the reference root to the END of sys.path: with it at the
        # front, a later `import run` in the suite resolves to the
        # REFERENCE's run.py (0-arg functions over a global cfg) instead of
        # the repo's — the test_run_cli failures under full-suite ordering.
        # Lazy reference imports (lib.*) still resolve from the tail.
        while REFERENCE_ROOT in sys.path:
            sys.path.remove(REFERENCE_ROOT)
        sys.path.append(REFERENCE_ROOT)

    _cache = types.SimpleNamespace(
        torch=torch, cfg=cfg, blend_utils=blend_utils, net_utils=net_utils,
        nerf_net_utils=nerf_net_utils, loss_utils=loss_utils, crit=crit,
        HashEmbedder=HashEmbedder, PosEnc=PosEnc,
        if_nerf_dutils=if_nerf_dutils, lr_scheduler=lr_scheduler)
    return _cache
