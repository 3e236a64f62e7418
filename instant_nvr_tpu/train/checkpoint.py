"""Checkpoint save/restore via orbax.

Rebuild of ``lib/utils/net_utils.py:423-528`` (save_model / load_model /
load_network): bundles {params, opt_state, step, epoch, recorder}, writes
``<epoch>`` plus a ``latest`` alias, garbage-collects old checkpoints, and
supports weights-only loads for eval.  Directory layout mirrors the
reference's ``trained_model_dir`` so scripts port over.
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

MAX_KEPT = 20  # reference keeps 20 (net_utils.py:478-483)


def _ckpt_dir(model_dir: str, tag) -> str:
    return os.path.join(os.path.abspath(model_dir), str(tag))


def save_checkpoint(model_dir: str, epoch: int, state, recorder_state: Dict,
                    latest: bool = True) -> None:
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "meta": {"epoch": epoch, **{k: int(v) for k, v in recorder_state.items()}},
    }
    ckptr = ocp.StandardCheckpointer()
    path = _ckpt_dir(model_dir, epoch)
    if os.path.isdir(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if latest:
        # atomic alias: stage a copy then rename, so concurrent readers
        # (e.g. an eval started right after training) never see a half copy
        lpath = _ckpt_dir(model_dir, "latest")
        tmp = lpath + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(path, tmp)
        shutil.rmtree(lpath, ignore_errors=True)
        os.replace(tmp, lpath)
    _gc(model_dir)


def _gc(model_dir: str) -> None:
    epochs = sorted(int(d) for d in os.listdir(model_dir) if d.isdigit())
    for e in epochs[:-MAX_KEPT]:
        shutil.rmtree(_ckpt_dir(model_dir, e), ignore_errors=True)


def latest_epoch(model_dir: str) -> Optional[int]:
    if not os.path.isdir(model_dir):
        return None
    epochs = [int(d) for d in os.listdir(model_dir) if d.isdigit()]
    return max(epochs) if epochs else None


def load_checkpoint(model_dir: str, state_template, epoch=None):
    """Restore (state, meta) from epoch or 'latest'; None if absent.

    ``state_template`` provides the pytree structure/shapes (like the
    reference loading into an already-built model+optimizer).
    """
    tag = epoch if epoch is not None and int(epoch) >= 0 else "latest"
    path = _ckpt_dir(model_dir, tag)
    if not os.path.isdir(path):
        e = latest_epoch(model_dir)
        if e is None:
            return None, None
        path = _ckpt_dir(model_dir, e)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "step": np.asarray(state_template.step),
        "meta": {"epoch": 0, "step": 0},
    }
    try:
        restored = ckptr.restore(path, template)
    except Exception as e:
        # Incompatible checkpoint (different model build / table layout):
        # an unattended resilient driver must start fresh rather than
        # crash-loop on resume.  Weights-only eval loads (load_weights)
        # stay strict — evaluating the wrong checkpoint is meaningless.
        print(f"WARNING: checkpoint at {path} is incompatible with the "
              f"current model build ({type(e).__name__}: {e}); starting "
              f"from scratch")
        return None, None
    new_state = state_template._replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]))
    return new_state, restored["meta"]


def load_weights(model_dir: str, params_template, epoch=None):
    """Weights-only restore (reference ``load_network``)."""
    tag = epoch if epoch is not None and int(epoch) >= 0 else "latest"
    path = _ckpt_dir(model_dir, tag)
    if not os.path.isdir(path):
        e = latest_epoch(model_dir)
        if e is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}")
        path = _ckpt_dir(model_dir, e)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r),
                        params_template, restored["params"])
