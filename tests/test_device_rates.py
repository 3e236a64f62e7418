"""Device-rate registry: probe, cache, overrides, and routing sanity."""
import json

import numpy as np

from instant_nvr_tpu.ops import device_rates as dr


def test_cpu_defaults_no_probe(monkeypatch):
    dr.set_rates(None)
    r = dr.get_rates()
    # CPU never probes; kernel_min_rows must match the TPU default so packed
    # STORAGE (baked into checkpoints) agrees across backends
    assert r.kernel_min_rows == dr._TPU_DEFAULT.kernel_min_rows
    assert np.isfinite(r.matmul_tflops) and r.matmul_tflops > 0
    assert r.xla_scatter_ns_per_row > 0


def test_probe_runs_and_is_sane():
    """The probe itself must execute (CPU here) and return finite rates."""
    r = dr._probe()
    assert 1e9 < r.matmul_tflops < 1e16
    assert 1e-11 < r.xla_scatter_ns_per_row < 1e-5
    assert r.kernel_min_rows == dr._TPU_DEFAULT.kernel_min_rows


def test_set_rates_overrides_routing():
    from instant_nvr_tpu.ops.pallas.onehot_scatter import \
        onehot_scatter_profitable
    offs = (0, 4096, 8192)
    args = dict(n_rows=1024, F=16, R=200_000, level_offsets=offs)
    try:
        dr.set_rates(dr.Rates(1e15, 1e-6, 190_000))   # scatter "slow"
        fast_kernel = onehot_scatter_profitable(**args)
        dr.set_rates(dr.Rates(1e9, 1e-12, 190_000))   # scatter "instant"
        slow_kernel = onehot_scatter_profitable(**args)
    finally:
        dr.set_rates(None)
    assert fast_kernel and not slow_kernel


def test_rates_file_cache_roundtrip(tmp_path, monkeypatch):
    p = tmp_path / "rates.json"
    want = dr.Rates(12e12, 9e-9, 190_000)
    p.write_text(json.dumps(want._asdict()))
    monkeypatch.setenv("NVR_RATES_FILE", str(p))
    monkeypatch.setattr(dr, "_cached", None)
    # force the file path: pretend we're not on cpu
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert dr.get_rates() == want
    dr.set_rates(None)


def test_hashgrid_min_rows_pin(monkeypatch):
    from instant_nvr_tpu.ops import hashgrid as hg
    assert hg._min_rows() == dr.get_rates().kernel_min_rows
    monkeypatch.setattr(hg, "KERNEL_MIN_ROWS", 64)
    assert hg._min_rows() == 64
