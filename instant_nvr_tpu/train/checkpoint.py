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


def _restore_numpy(path: str):
    """Restore a checkpoint tree as host numpy arrays, ignoring the sharding
    recorded at save time.

    Orbax's default restore re-creates each array on the device named in the
    checkpoint's sharding file; a checkpoint written on the TPU then fails to
    load in a CPU process ("Device TPU v5 lite0 was not found") — but the
    reference's ``load_network`` loads anywhere via ``map_location``
    (``lib/utils/net_utils.py:499-528``).  Restoring to numpy is
    topology-agnostic; callers ``jnp.asarray`` onto local devices.
    """
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    args = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                        tree)
    return ckptr.restore(path, restore_args=args)


def _reattach(t, r, place):
    """Rebuild restored tree ``r`` (orbax's plain dict/list containers) in
    the container types of template ``t`` (optax NamedTuples, tuples),
    placing each leaf via ``place(template_leaf, restored_leaf)``.  Raises
    on any structural mismatch."""
    if isinstance(r, dict):
        if hasattr(t, "_fields"):          # NamedTuple state
            if set(r) != set(t._fields):
                raise ValueError(f"fields {sorted(r)} != {sorted(t._fields)}")
            return type(t)(**{k: _reattach(getattr(t, k), r[k], place)
                              for k in r})
        if set(r) != set(t):
            raise ValueError(f"keys {sorted(r)} != {sorted(t)}")
        return {k: _reattach(t[k], r[k], place) for k in r}
    if isinstance(r, (list, tuple)):
        if not isinstance(t, (list, tuple)) or len(t) != len(r):
            raise ValueError(f"sequence mismatch: {type(t).__name__}"
                             f"[{len(t) if hasattr(t, '__len__') else '?'}]"
                             f" vs restored [{len(r)}]")
        seq = [_reattach(a, b, place) for a, b in zip(t, r)]
        if hasattr(t, "_fields"):
            return type(t)(*seq)
        return type(t)(seq)
    if r is None:
        # orbax serializes zero-leaf subtrees (optax EmptyState, None) as
        # None; the template already holds the exact empty container
        if len(jax.tree.leaves(t)) != 0:
            raise ValueError("restored None where template has leaves")
        return t
    return place(t, r)


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
    try:
        restored = _restore_numpy(path)
        # structure/shape compatibility check + device placement in one
        # sweep: _reattach raises on any structural mismatch and rebuilds
        # orbax's dict/list containers as the template's NamedTuples/tuples
        def place(t, r):
            a = jax.numpy.asarray(r, dtype=getattr(t, "dtype", None))
            if hasattr(t, "shape") and tuple(a.shape) != tuple(t.shape):
                raise ValueError(f"shape {a.shape} != template {t.shape}")
            return a
        params = _reattach(state_template.params, restored["params"], place)
        opt_state = _reattach(state_template.opt_state,
                              restored["opt_state"], place)
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
        params=params, opt_state=opt_state,
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
    restored = _restore_numpy(path)
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r),
                        params_template, restored["params"])
