"""One-hot-matmul small-table scatter-add vs the XLA oracle (interpret)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instant_nvr_tpu.ops.pallas.onehot_scatter import (
    CHUNK, onehot_scatter_add, onehot_scatter_profitable)


def oracle(keys, payload, n_rows):
    acc = jnp.zeros((n_rows, payload.shape[1]), jnp.float32)
    return acc.at[keys].add(payload.astype(jnp.float32)).astype(jnp.bfloat16)


@pytest.mark.parametrize("n_rows,F,offsets,r_l", [
    (12276, 2, (0, 12276), 24576),               # deformer hash: 1 level
    (12276, 2, (0, 12276), 20000),               # non-CHUNK-multiple records
    (25186, 2, (0, 64, 189, 532, 1532, 3729, 9561, 25186), CHUNK),  # dense
    (28143, 16, (0, 8, 35, 28143), CHUNK // 2),  # F=16 windows
    (25186, 1, (0, 64, 189, 532, 1532, 3729, 9561, 25186), CHUNK),  # scalar
])
def test_matches_oracle(n_rows, F, offsets, r_l):
    rng = np.random.default_rng(0)
    L = len(offsets) - 1
    keys = np.concatenate([
        rng.integers(offsets[l], offsets[l + 1], r_l) for l in range(L)
    ]).astype(np.int32)
    pay = rng.normal(size=(L * r_l, F)).astype(np.float32)
    pay = jnp.asarray(pay).astype(jnp.bfloat16)
    got = onehot_scatter_add(jnp.asarray(keys), pay, n_rows, offsets,
                             interpret=True)
    want = oracle(jnp.asarray(keys), pay, n_rows)
    # bf16 accumulation-order noise: compare in f32 with a loose-but-tight
    # bound relative to the typical accumulated magnitude
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    assert g.shape == w.shape == (n_rows, F)
    scale = np.abs(w).max() + 1e-3
    assert np.abs(g - w).max() / scale < 0.05


def test_profitability_gate():
    # pin the measured TPU rates: the gate reads the device-rate registry,
    # which returns CPU defaults under the test platform
    from instant_nvr_tpu.ops import device_rates as dr
    dr.set_rates(dr._TPU_DEFAULT)
    try:
        # deformer-hash shape: strongly profitable
        assert onehot_scatter_profitable(12276, 2, 1_081_344, (0, 12276))
        # big F=16 table with huge level windows: not profitable
        assert not onehot_scatter_profitable(229_397, 16, 114_688,
                                             (0, 100_000, 229_397))
        # records not divisible by levels: rejected
        assert not onehot_scatter_profitable(1000, 2, 999, (0, 500, 1000))
    finally:
        dr.set_rates(None)
