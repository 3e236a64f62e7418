"""Pallas KNN kernel vs the jnp oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nvr_tpu.ops.knn import (knn_blend_weights_multiassign,
                                     knn_blend_weights_multiassign_pallas)
from instant_nvr_tpu.ops.pallas.knn_pallas import knn_topk_pallas


def test_topk_kernel_vs_oracle(rng):
    P, M, C = 3, 700, 300
    lengths = np.array([700, 500, 123], np.int32)
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    query = rng.normal(size=(C, 3)).astype(np.float32)

    d2, idx = knn_topk_pallas(jnp.array(query), jnp.array(part_pts),
                              jnp.array(lengths), K=4, TQ=128, TV=256,
                              interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)

    for p in range(P):
        ref_d2 = ((query[:, None] - part_pts[p, None, :lengths[p]]) ** 2).sum(-1)
        ref_sorted = np.sort(ref_d2, axis=-1)[:, :4]
        got_sorted = np.sort(d2[p], axis=-1)
        np.testing.assert_allclose(got_sorted, ref_sorted, rtol=1e-3, atol=1e-4)
        # indices actually point at the right vertices
        gathered = ((query[:, None] - part_pts[p][idx[p]]) ** 2).sum(-1)
        np.testing.assert_allclose(np.sort(gathered, -1), ref_sorted,
                                   rtol=1e-3, atol=1e-4)


def test_empty_and_heavily_padded_parts(rng):
    """The dynamic tile bound skips tiles beyond each part's length —
    empty parts run zero tiles and must come out as 'no neighbor'
    (reference-scale fixture: lengths [2297, 4593, 0, 0, 0] with M=4593,
    where the static bound scanned 3.3x more tiles than exist)."""
    P, M, C = 5, 1100, 256
    lengths = np.array([300, 1100, 0, 0, 17], np.int32)
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    query = rng.normal(size=(C, 3)).astype(np.float32)

    d2, idx = knn_topk_pallas(jnp.array(query), jnp.array(part_pts),
                              jnp.array(lengths), K=4, TQ=128, TV=256,
                              interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for p in (2, 3):
        assert (d2[p] >= 1e9).all()            # untouched init = no neighbor
    for p in (0, 1, 4):
        ref_d2 = ((query[:, None] - part_pts[p, None, :lengths[p]]) ** 2).sum(-1)
        k = min(4, lengths[p])
        np.testing.assert_allclose(
            np.sort(d2[p], -1)[:, :k], np.sort(ref_d2, -1)[:, :k],
            rtol=1e-3, atol=1e-4)

    # aggregated blend weights agree with the XLA path (which masks padded
    # slots rather than skipping tiles — different raw d2 for dead parts,
    # same weights after the gaussian)
    ref = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=128))
    got = np.asarray(knn_blend_weights_multiassign_pallas(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("fused", [False, True])
def test_full_pallas_path_matches_xla(rng, fused):
    P, M, C = 5, 300, 256
    lengths = np.array([300, 200, 100, 150, 50], np.int32)
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    query = rng.normal(size=(C, 3)).astype(np.float32)

    ref = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=128))
    got = np.asarray(knn_blend_weights_multiassign_pallas(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), interpret=True, fused=fused))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_fused_blend_kernel_vs_oracle(rng):
    """Fused KNN+blend kernel against the jnp oracle, including empty and
    heavily padded parts (the dynamic tile bound must zero the blend for
    parts whose tiles never run) and non-tile-aligned C."""
    P, M, C = 5, 1100, 300
    lengths = np.array([300, 1100, 0, 0, 17], np.int32)
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    query = rng.normal(size=(C, 3)).astype(np.float32)

    ref = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=128))
    got = np.asarray(knn_blend_weights_multiassign_pallas(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), interpret=True, fused=True))
    assert got.shape == ref.shape == (C, P, 25)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    # empty parts: zero blend, far distance
    for p in (2, 3):
        np.testing.assert_allclose(got[:, p, :24], 0.0, atol=1e-7)
        np.testing.assert_allclose(got[:, p, 24], 1e6)
