"""KNN blend weights vs a scipy/numpy brute-force oracle."""
import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.ops.knn import knn_blend_weights_multiassign


def np_oracle(query, part_pts, part_pbw, lengths, K=4, radius=0.075, eps=1e-8):
    N = query.shape[0]
    P = part_pts.shape[0]
    out = np.zeros((N, P, 25), np.float32)
    for p in range(P):
        verts = part_pts[p, :lengths[p]]
        vals = part_pbw[p, :lengths[p]]
        d2 = ((query[:, None] - verts[None]) ** 2).sum(-1)  # (N, M)
        idx = np.argsort(d2, axis=-1)[:, :K]
        d = np.sqrt(np.take_along_axis(d2, idx, -1))
        w = np.exp(-d ** 2 / (2 * radius ** 2))
        w = w / (w.sum(-1, keepdims=True) + eps)
        out[:, p, :24] = np.einsum("nkd,nk->nd", vals[idx], w)
        # same "far" rule as the implementation: nearest neighbor beyond
        # 8*radius -> large distance (deviation from the reference's
        # underflow-to-zero quirk, see ops/knn.py)
        out[:, p, 24] = np.where(d[:, 0] <= 8 * radius, (d * w).sum(-1), 1e6)
    return out


def test_knn_vs_oracle(rng):
    P, M, N = 5, 200, 300
    lengths = np.array([200, 150, 80, 120, 60])
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    # zero the padding like the dataset does
    for p in range(P):
        part_pts[p, lengths[p]:] = 0
        part_pbw[p, lengths[p]:] = 0
    query = rng.normal(size=(N, 3)).astype(np.float32)

    got = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), K=4, radius=0.075, chunk=128, exact=True))
    want = np_oracle(query, part_pts, part_pbw, lengths)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # the TPU-fast approx path must agree on nearly all entries
    approx = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), K=4, radius=0.075, chunk=128, exact=False))
    agree = np.isclose(approx, want, rtol=1e-2, atol=1e-3).mean()
    assert agree > 0.97, agree


def test_knn_chunking_invariance(rng):
    P, M, N = 2, 64, 100  # N not divisible by chunk
    lengths = np.array([64, 32])
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32)
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    query = rng.normal(size=(N, 3)).astype(np.float32)
    a = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=32))
    b = np.asarray(knn_blend_weights_multiassign(
        jnp.array(query), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=256))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_knn_exact_on_vertex(rng):
    """A query exactly on a vertex gets that vertex's weights (dist ~ 0)."""
    P, M = 1, 50
    part_pts = rng.normal(size=(P, M, 3)).astype(np.float32) * 5  # spread out
    part_pbw = rng.uniform(size=(P, M, 24)).astype(np.float32)
    lengths = np.array([M])
    q = part_pts[0, 7:8]
    got = np.asarray(knn_blend_weights_multiassign(
        jnp.array(q), jnp.array(part_pts), jnp.array(part_pbw),
        jnp.array(lengths), chunk=8))
    # nearest neighbor dominates the gaussian weights
    np.testing.assert_allclose(got[0, 0, :24], part_pbw[0, 7], atol=0.05)
    assert got[0, 0, 24] < 0.05
