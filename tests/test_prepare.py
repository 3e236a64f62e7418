"""Preprocessing tool: closest-point-on-mesh + volume generation oracles."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from prepare_dataset import (blend_weight_volume, closest_points_on_mesh,
                             grid_points, rigid_transform_chain)


def _icosphere(radius=1.0, n=2):
    """Simple subdivided octahedron sphere mesh."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], float)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(n):
        new_faces = []
        verts = list(verts)
        cache = {}

        def mid(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2
                m = m / np.linalg.norm(m)
                cache[k] = len(verts)
                verts.append(m)
            return cache[k]

        for (a, b, c) in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        faces = np.array(new_faces)
    return radius * np.array(verts), faces


def test_closest_point_on_sphere_mesh(rng):
    verts, faces = _icosphere(radius=0.5, n=3)
    pts = rng.normal(size=(200, 3)).astype(np.float64)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * \
        rng.uniform(0.1, 1.0, size=(200, 1))
    proj, fid, bar = closest_points_on_mesh(pts, verts, faces)
    # projection lies (approximately) on the sphere surface
    r = np.linalg.norm(proj, axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.01)
    # distance agrees with analytic |(|p| - 0.5)| within mesh tolerance
    d = np.linalg.norm(pts - proj, axis=-1)
    np.testing.assert_allclose(d, np.abs(np.linalg.norm(pts, axis=-1) - 0.5),
                               atol=0.02)
    # barycentrics valid
    assert (bar >= -1e-6).all() and np.allclose(bar.sum(-1), 1, atol=1e-5)


def test_blend_weight_volume_contract(rng):
    verts, faces = _icosphere(radius=0.3, n=2)
    weights = rng.uniform(size=(len(verts), 24)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    vol = blend_weight_volume(verts.astype(np.float32), faces, weights,
                              voxel=np.array([0.05] * 3), padding=0.05)
    assert vol.ndim == 4 and vol.shape[-1] == 25
    # bw channels near-normalized (barycentric mix of normalized weights)
    s = vol[..., :24].sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)
    # every voxel's distance channel ~ |dist(|p|) - mesh surface radius|
    pts = grid_points(np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05]),
                      np.array([0.05] * 3)).reshape(-1, 3)
    r = np.linalg.norm(pts, axis=-1)
    expected = np.abs(r - 0.3)
    got = vol[..., 24].reshape(-1)
    # mesh is a coarse sphere: allow chord-depth tolerance
    np.testing.assert_allclose(got, expected, atol=0.03)


def test_rigid_chain_matches_ops(rng):
    import jax.numpy as jnp
    from instant_nvr_tpu.ops.math import rigid_transform_chain as jax_chain
    J = 24
    parents = np.concatenate([[0], rng.integers(0, np.arange(1, J))])
    rots = np.stack([np.eye(3)] * J)
    joints = rng.normal(size=(J, 3)).astype(np.float32)
    A_np = rigid_transform_chain(rots, joints, parents)
    A_jax = np.asarray(jax_chain(jnp.zeros((J, 3)), jnp.asarray(joints), parents))
    np.testing.assert_allclose(A_np, A_jax, atol=1e-4)
