"""Golden tests for kinematics / LBS against independent numpy oracles."""
import numpy as np
import jax.numpy as jnp

from instant_nvr_tpu.ops import math as m
from instant_nvr_tpu.ops import lbs


def np_rodrigues(p):
    import cv2
    return cv2.Rodrigues(p.astype(np.float64))[0]


def test_batch_rodrigues_vs_cv2(rng):
    poses = rng.normal(size=(10, 3)).astype(np.float32)
    ours = np.asarray(m.batch_rodrigues(jnp.array(poses)))
    for i in range(10):
        ref = np_rodrigues(poses[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_rodrigues_zero_pose():
    # zero rotation -> identity (the +1e-8 eps must not blow up)
    R = np.asarray(m.batch_rodrigues(jnp.zeros((1, 3))))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-5)


def _np_rigid_transform_chain(poses, joints, parents):
    """Independent numpy oracle (same contract as the SMPL A-matrix chain)."""
    J = joints.shape[0]
    rots = np.stack([np_rodrigues(p) for p in poses])
    rel = joints.copy()
    rel[1:] -= joints[parents[1:]]
    T = np.zeros((J, 4, 4))
    T[:, :3, :3] = rots
    T[:, :3, 3] = rel
    T[:, 3, 3] = 1
    chain = [T[0]]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ T[i])
    A = np.stack(chain)
    jh = np.concatenate([joints, np.zeros((J, 1))], axis=1)
    A[:, :, 3] -= np.einsum("jab,jb->ja", A, jh)
    return A


def test_rigid_transform_chain(rng):
    J = 24
    parents = np.zeros(J, dtype=int)
    parents[1:] = rng.integers(0, np.arange(1, J))  # valid topological parents
    poses = 0.3 * rng.normal(size=(J, 3)).astype(np.float32)
    joints = rng.normal(size=(J, 3)).astype(np.float32)
    A = np.asarray(m.rigid_transform_chain(jnp.array(poses), jnp.array(joints), parents))
    A_ref = _np_rigid_transform_chain(poses, joints, parents)
    np.testing.assert_allclose(A, A_ref, atol=2e-4)

    # rest pose must map every joint to itself: A @ [j, 1] == [j, *]
    A0 = np.asarray(m.rigid_transform_chain(jnp.zeros((J, 3)), jnp.array(joints), parents))
    jh = np.concatenate([joints, np.ones((J, 1))], axis=1)
    mapped = np.einsum("jab,jb->ja", A0, jh)
    np.testing.assert_allclose(mapped[:, :3], joints, atol=1e-4)


def test_inverse_3x3(rng):
    mats = rng.normal(size=(50, 3, 3)).astype(np.float32)
    mats += np.eye(3) * 2  # keep well-conditioned
    inv = np.asarray(m.inverse_3x3(jnp.array(mats)))
    np.testing.assert_allclose(inv, np.linalg.inv(mats), rtol=1e-3, atol=1e-4)


def test_lbs_roundtrip(rng):
    """pose->tpose->pose with the same blended transform is identity."""
    B, N, K = 1, 128, 24
    bw = rng.uniform(size=(B, N, K)).astype(np.float32)
    bw /= bw.sum(-1, keepdims=True)
    A = np.asarray(m.rigid_transform_chain(
        jnp.array(0.3 * rng.normal(size=(K, 3)).astype(np.float32)),
        jnp.array(rng.normal(size=(K, 3)).astype(np.float32)),
        np.concatenate([[0], np.arange(K - 1)]),
    ))[None]
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)

    A_bw, R_inv = lbs.inverse_blend_params(jnp.array(bw), jnp.array(A))
    tpts = lbs.pose_points_to_tpose_points(jnp.array(pts), A_bw, R_inv)
    back = lbs.tpose_points_to_pose_points(tpts, A_bw)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_world_pose_roundtrip(rng):
    B, N = 1, 64
    Rh = np.asarray(m.batch_rodrigues(jnp.array(rng.normal(size=(B, 3)).astype(np.float32))))
    Th = rng.normal(size=(B, 1, 3)).astype(np.float32)
    wpts = rng.normal(size=(B, N, 3)).astype(np.float32)
    ppts = lbs.world_points_to_pose_points(jnp.array(wpts), jnp.array(Rh), jnp.array(Th))
    back = lbs.pose_points_to_world_points(ppts, jnp.array(Rh), jnp.array(Th))
    np.testing.assert_allclose(np.asarray(back), wpts, atol=1e-4)


def test_blend_transforms_matches_manual(rng):
    B, N, K = 1, 32, 24
    bw = rng.uniform(size=(B, N, K)).astype(np.float32)
    A = rng.normal(size=(B, K, 4, 4)).astype(np.float32)
    got = np.asarray(lbs.blend_transforms(jnp.array(bw), jnp.array(A)))
    want = np.einsum("bnk,bkij->bnij", bw, A)
    np.testing.assert_allclose(got, want, atol=1e-4)
