"""Sorted-segment scatter-add kernel (ops/pallas/segmented_scatter.py).

Strategy mirrors the reference's torchsearchsorted tests (SURVEY.md §4):
kernel vs a numpy/XLA oracle across index distributions, in interpret mode
on CPU.  The compiled Mosaic kernel is additionally exercised on real
hardware by tools/tpu_selfcheck.py (interpret passing while silicon is
wrong has happened before — see CLAUDE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nvr_tpu.ops import hashgrid
from instant_nvr_tpu.ops.pallas.segmented_scatter import (
    CAP, TILE_ROWS, segmented_scatter_add)


def _oracle(keys, payload, T_pad):
    ref = np.zeros((T_pad, payload.shape[1]), np.float32)
    np.add.at(ref, np.asarray(keys), np.asarray(payload, np.float32))
    return ref


def _check(keys, payload, T_pad, n_levels=1):
    got = np.asarray(
        segmented_scatter_add(jnp.asarray(keys), jnp.asarray(payload),
                              T_pad, n_levels=n_levels, interpret=True),
        np.float32)
    ref = _oracle(keys, payload, T_pad)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)


@pytest.mark.parametrize("n_levels", [1, 4])
@pytest.mark.parametrize("F", [1, 16])
def test_uniform(rng, n_levels, F):
    # F=1 is the scalar-table mode (single bf16 sort passenger)
    R = 4096 + 128
    T_pad = 2 * TILE_ROWS
    lo = np.arange(n_levels) * (T_pad // n_levels)
    keys = np.concatenate([
        rng.integers(lo[i], lo[i] + T_pad // n_levels, R // n_levels)
        for i in range(n_levels)]).astype(np.int32)
    payload = rng.standard_normal((R, F)).astype(np.float32)
    payload = jnp.asarray(payload, jnp.bfloat16)
    _check(keys, payload, T_pad, n_levels)


@pytest.mark.parametrize("F", [1, 16])
def test_pileup_exceeding_refill_cap(rng, F):
    """More records on one macro tile than one VMEM refill holds.

    F=1 exercises the scalar kernel's own refill/window/lane-slot logic
    (_scatter_kernel_f1), which shares none of the F>1 path's code.
    """
    R = 3 * CAP
    T_pad = 2 * TILE_ROWS
    keys = np.where(rng.random(R) < 0.9, 777,
                    rng.integers(0, T_pad, R)).astype(np.int32)
    payload = jnp.asarray(rng.standard_normal((R, F)), jnp.bfloat16)
    _check(keys, payload, T_pad)


@pytest.mark.parametrize("F", [1, 16])
def test_all_one_key(rng, F):
    R = 2048
    keys = np.full(R, TILE_ROWS + 5, np.int32)
    payload = jnp.asarray(rng.standard_normal((R, F)), jnp.bfloat16)
    _check(keys, payload, 2 * TILE_ROWS)


def test_empty_tiles(rng):
    """All records on one tile; other tiles must come out exactly zero."""
    R, F = 1024, 16
    T_pad = 4 * TILE_ROWS
    keys = rng.integers(TILE_ROWS, 2 * TILE_ROWS, R).astype(np.int32)
    payload = jnp.asarray(rng.standard_normal((R, F)), jnp.bfloat16)
    got = np.asarray(segmented_scatter_add(
        jnp.asarray(keys), payload, T_pad, interpret=True), np.float32)
    assert np.all(got[:TILE_ROWS] == 0)
    assert np.all(got[2 * TILE_ROWS:] == 0)
    ref = _oracle(keys, payload, T_pad)
    np.testing.assert_allclose(got, ref, atol=0.02 * np.abs(ref).max())


def test_table_gather_grad_matches_xla(rng):
    """custom-vjp plumbing: grad of a table_gather-based loss == grad of the
    plain-indexing loss (CPU takes the XLA scatter branch)."""
    T, F, R = 512, 8, 300
    table = jnp.asarray(rng.standard_normal((T, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, R).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((R, F)), jnp.float32)

    g1 = jax.grad(lambda t: jnp.sum(hashgrid.table_gather(t, idx, 1, F) * w))(table)
    g2 = jax.grad(lambda t: jnp.sum(t[idx] * w))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_padded_init_rows_never_read(rng):
    """Tables padded to the kernel tile multiple must not change encodings."""
    spec = hashgrid.make_hashgrid_spec(n_levels=4, n_features_per_level=4,
                                       log2_hashmap_size=10,
                                       base_resolution=4, b=1.38)
    params = hashgrid.hashgrid_init(jax.random.key(0), spec)
    xyz = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    bounds = jnp.asarray([[-1.0, -1, -1], [1, 1, 1]])
    out = hashgrid.hashgrid_encode(spec, params, xyz, bounds)
    # grow the tables with poison rows: output must be identical
    poisoned = {k: jnp.concatenate(
        [v, jnp.full((128,) + v.shape[1:], 1e9, v.dtype)])
        for k, v in params.items()}
    out2 = hashgrid.hashgrid_encode(spec, poisoned, xyz, bounds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
