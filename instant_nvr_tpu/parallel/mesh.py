"""Device mesh + sharding layout.

The TPU-native replacement for the reference's NCCL/DDP data parallelism
(``train_net.py:211-216``, ``lib/train/trainers/trainer.py:21-26``,
``lib/datasets/samplers.py:75-131``).  Since the reference trains one image
per step, the parallel axis here is the RAY axis (SURVEY.md §2.10): rays and
their per-ray tensors are sharded over the ``data`` mesh axis, parameters
and per-frame SMPL metadata are replicated, and XLA inserts the gradient
all-reduce over ICI.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys whose leading axis is the ray axis
RAY_KEYS = ("ray_o", "ray_d", "near", "far", "rgb", "occupancy", "ray_mask",
            "coord")


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_shardings(mesh: Mesh, batch: Dict, axis: str = "data") -> Dict:
    """Sharding tree for a batch dict: ray tensors sharded, rest replicated."""
    out = {}
    for k, v in batch.items():
        if k in RAY_KEYS and getattr(v, "ndim", 0) >= 1:
            out[k] = NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_global(v, sharding: NamedSharding):
    """Place one host value onto a (possibly multi-host) sharding.

    Multi-host contract: every process holds the SAME logical batch (the
    reference trains one image per step, so all hosts cooperate on one
    image's rays).  Single-process: plain ``device_put``.  Multi-process:
    ray-sharded leading axes are sliced to the process-local portion and
    assembled with ``make_array_from_process_local_data`` — ``device_put``
    to a sharding with non-addressable devices would fail, and per-process
    *different* batches would contradict the global ray sharding.
    """
    v = np.asarray(v)
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    spec = sharding.spec
    if len(spec) and spec[0] is not None:
        if v.shape[0] % jax.process_count():
            raise ValueError(
                f"ray axis ({v.shape[0]}) must divide process_count "
                f"({jax.process_count()}); pad with pad_rays_to_multiple "
                "before put_global")
        per = v.shape[0] // jax.process_count()
        lo = jax.process_index() * per
        local = v[lo:lo + per]
    else:
        local = v
    return jax.make_array_from_process_local_data(sharding, local, v.shape)


def shard_batch(mesh: Mesh, batch: Dict, axis: str = "data") -> Dict:
    """Place a host batch onto the mesh with ray-axis sharding."""
    sh = batch_shardings(mesh, batch, axis)
    return {k: put_global(v, sh[k]) for k, v in batch.items()}


def pad_rays_to_multiple(batch: Dict, mult: int) -> Dict:
    """Pad the ray axis so it divides the mesh; pad rays get ray_mask=0."""
    n = batch["ray_o"].shape[0]
    pad = (-n) % mult
    if pad == 0:
        return batch
    out = dict(batch)
    for k in RAY_KEYS:
        if k in out and getattr(out[k], "ndim", 0) >= 1:
            widths = [(0, pad)] + [(0, 0)] * (out[k].ndim - 1)
            out[k] = np.pad(np.asarray(out[k]), widths, mode="edge")
    mask = np.ones(n + pad, np.float32)
    mask[n:] = 0.0
    if "ray_mask" in batch:
        mask[:n] = np.asarray(batch["ray_mask"], np.float32)
    out["ray_mask"] = mask
    return out
