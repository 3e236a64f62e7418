"""Golden-parity suite: the rebuild vs the ACTUAL torch reference code.

Every test below runs the installed CPU torch reference implementation
(imported via ``ref_loader``, see its docstring for the neutered CUDA
quirks) on the same random inputs as the rebuild's JAX ops and asserts
numeric agreement with pinned tolerances.  This converts "faithful
re-derivation" into *proven parity* (VERDICT r4, "Next round" #1).

Coverage (reference file:line -> rebuild symbol):
  - blend_utils.py:366-487 space transforms / LBS  -> ops/lbs.py
  - blend_utils.py:293-317 torch_inverse_3x3        -> ops/math.inverse_3x3
  - if_nerf_data_utils.py:523-577 rodrigues + chain -> ops/math
  - net_utils.py:12-44 compositing                  -> ops/rendering.py
  - nerf_net_utils.py:93-128 sample_pdf             -> ops/searchsorted.py
  - blend_utils.py:501-555 volume sampling          -> ops/grid_sample.py
  - blend_utils.py:741-825 KNN blend weights        -> ops/knn.py
  - part_base_embedder.py:12-174 hash embedder      -> ops/hashgrid.py
  - freq_embedder.py PosEnc                         -> models/embedders.py
  - loss_utils.py:39-63 SSIM                        -> ops/ssim.py
  - crit.py reg_raw/elastic/sdf_mask/normal         -> renderer + train/crit.py
  - optimizer.py + lr_scheduler.py:66-75            -> train/state.py

Known, documented deviations exercised around (not hidden by) these tests:
  - hash levels with grid coords >= 52 use u32 wraparound (ops/hashgrid.py
    docstring) — tested distributionally; low-res hashed levels (coords
    < 52) never wrap and are tested EXACTLY.
  - KNN "far" rule: points whose nearest neighbor is beyond 8*radius get
    distance 1e6 instead of the reference's underflow artifact
    (ops/knn.py:70-75) — the distance channel is compared only below that.
  - points outside the hash bbox: torch's ``(flt+1).long()`` truncates
    toward zero, the rebuild floors — inputs here stay inside the bbox
    (the use_batch_bounds operating regime).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference absent")

if ref is not None:
    torch = ref.torch


def t(x):
    return torch.from_numpy(np.asarray(x))


def n(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# geometry / LBS
# ---------------------------------------------------------------------------

SMPL_PARENTS = np.array([0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                         12, 13, 14, 16, 17, 18, 19, 20, 21])


def _random_pose_setup(rng, B=2, N=64):
    from instant_nvr_tpu.ops import math as m
    poses = rng.normal(size=(24, 3)).astype(np.float32) * 0.3
    joints = rng.normal(size=(24, 3)).astype(np.float32) * 0.4
    A = n(m.rigid_transform_chain(jnp.asarray(poses), jnp.asarray(joints),
                                  SMPL_PARENTS))
    A = np.broadcast_to(A, (B, 24, 4, 4)).copy()
    bw = rng.uniform(0.01, 1.0, size=(B, 24, N)).astype(np.float32)
    bw /= bw.sum(axis=1, keepdims=True)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    return A, bw, pts


def test_rodrigues_and_rigid_chain(rng):
    from instant_nvr_tpu.ops import math as m
    poses = rng.normal(size=(24, 3)).astype(np.float32) * 0.5
    joints = rng.normal(size=(24, 3)).astype(np.float32) * 0.4

    rot_ref = ref.if_nerf_dutils.batch_rodrigues(poses)
    rot = n(m.batch_rodrigues(jnp.asarray(poses)))
    np.testing.assert_allclose(rot, rot_ref, rtol=1e-5, atol=1e-6)

    A_ref = ref.if_nerf_dutils.get_rigid_transformation(
        poses, joints, SMPL_PARENTS)
    A = n(m.rigid_transform_chain(jnp.asarray(poses), jnp.asarray(joints),
                                  SMPL_PARENTS))
    np.testing.assert_allclose(A, A_ref, rtol=1e-5, atol=2e-6)


def test_space_transforms(rng):
    from instant_nvr_tpu.ops import lbs, math as m
    B, N = 2, 128
    wpts = rng.normal(size=(B, N, 3)).astype(np.float32)
    Rh = n(m.batch_rodrigues(
        jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))))
    Th = rng.normal(size=(B, 1, 3)).astype(np.float32)

    out = n(lbs.world_points_to_pose_points(
        jnp.asarray(wpts), jnp.asarray(Rh), jnp.asarray(Th)))
    out_ref = ref.blend_utils.world_points_to_pose_points(
        t(wpts), t(Rh), t(Th)).numpy()
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)

    out = n(lbs.world_dirs_to_pose_dirs(jnp.asarray(wpts), jnp.asarray(Rh)))
    out_ref = ref.blend_utils.world_dirs_to_pose_dirs(t(wpts), t(Rh)).numpy()
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)

    out = n(lbs.pose_points_to_world_points(
        jnp.asarray(wpts), jnp.asarray(Rh), jnp.asarray(Th)))
    out_ref = ref.blend_utils.pose_points_to_world_points(
        t(wpts), t(Rh), t(Th)).numpy()
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


def test_lbs_blend_and_inverse(rng):
    from instant_nvr_tpu.ops import lbs
    A, bw, ppts = _random_pose_setup(rng)
    bw_nm = np.swapaxes(bw, 1, 2)  # ours is points-major (B, N, 24)

    A_bw = n(lbs.blend_transforms(jnp.asarray(bw_nm), jnp.asarray(A)))
    A_bw_ref = ref.blend_utils.get_blend_params(t(bw), t(A)).numpy()
    np.testing.assert_allclose(A_bw, A_bw_ref, rtol=1e-5, atol=1e-6)

    A_bw2, R_inv = lbs.inverse_blend_params(jnp.asarray(bw_nm), jnp.asarray(A))
    A_bw_ref2, R_inv_ref = ref.blend_utils.get_inverse_blend_params(t(bw), t(A))
    np.testing.assert_allclose(n(R_inv), R_inv_ref.numpy(),
                               rtol=1e-4, atol=1e-5)

    # pose -> tpose (inverse LBS), points and dirs
    tp = n(lbs.pose_points_to_tpose_points(jnp.asarray(ppts), A_bw2, R_inv))
    tp_ref = ref.blend_utils.pose_points_to_tpose_points(
        t(ppts), A_bw=A_bw_ref2, R_inv=R_inv_ref).numpy()
    np.testing.assert_allclose(tp, tp_ref, rtol=1e-4, atol=1e-5)

    td = n(lbs.pose_dirs_to_tpose_dirs(jnp.asarray(ppts), R_inv))
    td_ref = ref.blend_utils.pose_dirs_to_tpose_dirs(
        t(ppts), A_bw=A_bw_ref2, R_inv=R_inv_ref).numpy()
    np.testing.assert_allclose(td, td_ref, rtol=1e-4, atol=1e-5)

    # tpose -> pose (forward LBS)
    pp = n(lbs.tpose_points_to_pose_points(jnp.asarray(ppts), A_bw2))
    pp_ref = ref.blend_utils.tpose_points_to_pose_points(
        t(ppts), A_bw=A_bw_ref2).numpy()
    np.testing.assert_allclose(pp, pp_ref, rtol=1e-5, atol=1e-6)

    pd = n(lbs.tpose_dirs_to_pose_dirs(jnp.asarray(ppts), A_bw2))
    pd_ref = ref.blend_utils.tpose_dirs_to_pose_dirs(
        t(ppts), A_bw=A_bw_ref2).numpy()
    np.testing.assert_allclose(pd, pd_ref, rtol=1e-5, atol=1e-6)


def test_inverse_3x3(rng):
    from instant_nvr_tpu.ops.math import inverse_3x3
    m = rng.normal(size=(2, 32, 3, 3)).astype(np.float32)
    m += np.eye(3, dtype=np.float32) * 2.0  # well-conditioned
    eps = float(torch.finfo(torch.float).eps)
    out = n(inverse_3x3(jnp.asarray(m), eps=eps))
    out_ref = ref.blend_utils.torch_inverse_3x3(t(m)).numpy()
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_part_scheme_matches():
    from instant_nvr_tpu.ops import lbs
    assert lbs.PARTNAMES == ref.blend_utils.partnames
    assert lbs.NUM_PARTS == ref.blend_utils.NUM_PARTS
    assert lbs.PART_BW_MAP == ref.blend_utils.part_bw_map


# ---------------------------------------------------------------------------
# compositing / sample_pdf / searchsorted
# ---------------------------------------------------------------------------

def test_compositing(rng):
    from instant_nvr_tpu.ops import rendering
    B, R, S = 1, 64, 32
    alpha = rng.uniform(0, 1, size=(B, R, S)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(B, R, S, 3)).astype(np.float32)

    w = n(rendering.render_weights(jnp.asarray(alpha)))
    w_ref = ref.net_utils.render_weights(t(alpha)).numpy()
    np.testing.assert_allclose(w, w_ref, rtol=1e-5, atol=1e-6)

    for bg in (None, 1.0):
        w, rgb_map, acc = rendering.volume_rendering(
            jnp.asarray(rgb), jnp.asarray(alpha), bg_brightness=bg)
        w_ref, rgb_ref, acc_ref = ref.net_utils.volume_rendering(
            t(rgb), t(alpha), bg_brightness=bg)
        np.testing.assert_allclose(n(rgb_map), rgb_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(n(acc), acc_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_sample_pdf_det(rng):
    from instant_nvr_tpu.ops.searchsorted import sample_pdf
    R, S = 16, 64
    bins = np.sort(rng.uniform(0, 4, size=(R, S - 1)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, size=(R, S - 2)).astype(np.float32)

    out = n(sample_pdf(jax.random.key(0), jnp.asarray(bins),
                       jnp.asarray(weights), 32, det=True))
    out_ref = ref.nerf_net_utils.sample_pdf(t(bins), t(weights), 32,
                                            det=True).numpy()
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_searchsorted_vs_torch(rng):
    from instant_nvr_tpu.ops.searchsorted import searchsorted
    a = np.sort(rng.normal(size=(8, 100)).astype(np.float32), axis=-1)
    v = rng.normal(size=(8, 40)).astype(np.float32)
    v[0, :5] = a[0, :5]  # exercise exact ties
    for side in ("left", "right"):
        out = n(searchsorted(jnp.asarray(a), jnp.asarray(v), side=side))
        out_ref = torch.searchsorted(t(a), t(v), right=(side == "right")).numpy()
        np.testing.assert_array_equal(out, out_ref)


# ---------------------------------------------------------------------------
# grid sampling
# ---------------------------------------------------------------------------

def test_pts_sample_volume(rng):
    from instant_nvr_tpu.ops.grid_sample import pts_sample_volume
    X, Y, Z, C = 7, 9, 11, 25
    vol = rng.normal(size=(X, Y, Z, C)).astype(np.float32)
    bounds = np.array([[-0.4, -0.5, -0.6], [0.7, 0.8, 0.9]], np.float32)
    pts = rng.uniform(-0.7, 1.2, size=(200, 3)).astype(np.float32)  # some outside

    out = n(pts_sample_volume(jnp.asarray(pts), jnp.asarray(vol),
                              jnp.asarray(bounds)))
    out_ref = ref.blend_utils.pts_sample_blend_weights(
        t(pts)[None], t(vol)[None], t(bounds)[None]).numpy()[0].T  # (N, C)
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_gradients(rng):
    from instant_nvr_tpu.ops.grid_sample import pts_sample_volume
    X, Y, Z, C = 5, 6, 7, 4
    vol = rng.normal(size=(X, Y, Z, C)).astype(np.float32)
    bounds = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    pts = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    cot = rng.normal(size=(64, C)).astype(np.float32)

    def f(v, p):
        return jnp.sum(pts_sample_volume(p, v, jnp.asarray(bounds))
                       * jnp.asarray(cot))

    g_vol, g_pts = jax.grad(f, argnums=(0, 1))(jnp.asarray(vol),
                                               jnp.asarray(pts))

    vol_t = t(vol)[None].requires_grad_(True)
    pts_t = t(pts)[None].requires_grad_(True)
    out_ref = ref.blend_utils.pts_sample_blend_weights(
        pts_t, vol_t, t(bounds)[None])  # (1, C, N)
    (out_ref[0].T * t(cot)).sum().backward()
    np.testing.assert_allclose(n(g_vol), vol_t.grad.numpy()[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(n(g_pts), pts_t.grad.numpy()[0],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# KNN blend weights
# ---------------------------------------------------------------------------

def test_knn_blend_weights_multiassign(rng):
    from instant_nvr_tpu.ops.knn import knn_blend_weights_multiassign
    P, M, N, D = 5, 96, 200, 24
    lengths = np.array([96, 80, 64, 48, 32], np.int64)
    part_pts = np.zeros((P, M, 3), np.float32)
    part_pbw = np.zeros((P, M, D), np.float32)
    for p in range(P):
        L = lengths[p]
        part_pts[p, :L] = rng.normal(size=(L, 3)).astype(np.float32) * 0.2 \
            + np.array([p * 0.1, 0, 0], np.float32)
        w = rng.uniform(0.01, 1, size=(L, D)).astype(np.float32)
        part_pbw[p, :L] = w / w.sum(-1, keepdims=True)
    # queries near the clouds so every part distance stays < the 8*radius
    # far-rule boundary where the rebuild deviates (documented)
    base = part_pts[rng.integers(0, P, N), rng.integers(0, 32, N)]
    query = (base + rng.normal(size=(N, 3)).astype(np.float32) * 0.05).astype(np.float32)

    out = n(knn_blend_weights_multiassign(
        jnp.asarray(query), jnp.asarray(part_pts), jnp.asarray(part_pbw),
        jnp.asarray(lengths), chunk=128))  # (N, P, 25)

    out_ref = ref.blend_utils.pts_knn_blend_weights_multiassign_batch(
        t(query)[None], t(part_pts), t(part_pbw), t(lengths)).numpy()[0]

    near = out_ref[..., 24] < 0.55  # inside both implementations' far rule
    assert near.mean() > 0.5
    np.testing.assert_allclose(out[..., :24], out_ref[..., :24],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[..., 24][near], out_ref[..., 24][near],
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# hash-grid embedder
# ---------------------------------------------------------------------------

@pytest.fixture
def small_tables():
    """Pin the packed/kernel thresholds so CPU uses plain (rows, F) tables."""
    from instant_nvr_tpu.ops import hashgrid
    old = hashgrid.KERNEL_MIN_ROWS
    hashgrid.KERNEL_MIN_ROWS = 10 ** 9
    yield
    hashgrid.KERNEL_MIN_ROWS = old


def _ref_embedder(**kw):
    defaults = dict(pid=0, partname='body',
                    bbox=np.array([[-0.3, -0.2, -0.1], [0.4, 0.5, 0.6]]),
                    n_levels=6, n_features_per_level=2, b=1.38,
                    log2_hashmap_size=10, base_resolution=8,
                    use_batch_bounds=False)
    defaults.update(kw)
    torch.manual_seed(0)
    return ref.HashEmbedder(**defaults), defaults


def _transplant(e, spec):
    """Copy the torch embedder's tables into the rebuild's param layout."""
    from instant_nvr_tpu.ops.hashgrid import pack_table
    dense = e.dense.detach().numpy() if hasattr(e, 'dense') else \
        np.zeros((1, spec.n_features), np.float32)
    hash_t = e.hash.detach().numpy()
    if hash_t.ndim == 3:
        hash_t = hash_t.reshape(-1, hash_t.shape[-1])
    return {"dense": pack_table(jnp.asarray(dense), scalar=spec.scalar),
            "hash": pack_table(jnp.asarray(hash_t), scalar=spec.scalar)}


@pytest.mark.parametrize("sum_over_features,include_input,scalar", [
    (True, True, False),
    (True, True, True),    # the scalar-grid reparameterization, exact too
    (True, False, False),
    (False, True, False),  # sum over levels
])
def test_hashgrid_exact_parity(rng, small_tables, sum_over_features,
                               include_input, scalar):
    """Low-res config: every level's grid coords stay < 52, so even the
    hashed levels' u32 prime-xor hash equals the reference's int64 one
    exactly (no wraparound).  Dense + hashed levels both exact."""
    from instant_nvr_tpu.ops.hashgrid import make_hashgrid_spec, hashgrid_encode
    e, d = _ref_embedder(sum_over_features=sum_over_features,
                         include_input=include_input)
    assert e.start_hash == 1 and e.n_levels == 6  # both table kinds exercised
    assert max(int(x) for x in e.entries_num) < 52  # no u32 wraparound

    spec = make_hashgrid_spec(
        n_levels=d['n_levels'], n_features_per_level=d['n_features_per_level'],
        log2_hashmap_size=d['log2_hashmap_size'],
        base_resolution=d['base_resolution'], b=d['b'],
        sum_over_features=sum_over_features, include_input=include_input,
        scalar_tables=scalar)
    assert spec.start_hash == e.start_hash
    assert spec.table_size == e.n_entries_per_level
    params = _transplant(e, spec)
    bounds = jnp.asarray(d['bbox'], jnp.float32)

    lo, hi = d['bbox'][0], d['bbox'][1]
    xyz = (lo + (hi - lo) * rng.uniform(0.01, 0.99, size=(128, 3))
           ).astype(np.float32)

    out = n(hashgrid_encode(spec, params, jnp.asarray(xyz), bounds))
    out_ref = e(t(xyz), {}).detach().numpy()
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=2e-5)


def test_hashgrid_gradient_parity(rng, small_tables):
    """Table gradients through the custom VJP vs torch autograd."""
    from instant_nvr_tpu.ops.hashgrid import make_hashgrid_spec, hashgrid_encode
    e, d = _ref_embedder()
    spec = make_hashgrid_spec(
        n_levels=d['n_levels'], n_features_per_level=d['n_features_per_level'],
        log2_hashmap_size=d['log2_hashmap_size'],
        base_resolution=d['base_resolution'], b=d['b'], scalar_tables=False)
    params = _transplant(e, spec)
    bounds = jnp.asarray(d['bbox'], jnp.float32)
    lo, hi = d['bbox'][0], d['bbox'][1]
    xyz = (lo + (hi - lo) * rng.uniform(0.01, 0.99, size=(64, 3))
           ).astype(np.float32)
    cot = rng.normal(size=(64, spec.out_dim)).astype(np.float32)

    def f(p, x):
        return jnp.sum(hashgrid_encode(spec, p, x, bounds) * jnp.asarray(cot))

    grads, g_xyz = jax.grad(f, argnums=(0, 1))(params, jnp.asarray(xyz))

    e.dense.requires_grad_(True)
    e.hash.requires_grad_(True)
    xyz_t = t(xyz).requires_grad_(True)
    (e(xyz_t, {}) * t(cot)).sum().backward()

    np.testing.assert_allclose(n(grads['dense']), e.dense.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        n(grads['hash']), e.hash.grad.numpy().reshape(-1, spec.n_features),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(n(g_xyz), xyz_t.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_hashgrid_wraparound_distributional(rng, small_tables):
    """High-res levels where the documented u32-vs-i64 hash deviation IS
    active: indices differ, so assert statistical equivalence (same table,
    same points -> per-level output moments match within 25%)."""
    from instant_nvr_tpu.ops.hashgrid import make_hashgrid_spec, hashgrid_encode
    e, d = _ref_embedder(n_levels=8, base_resolution=16,
                         log2_hashmap_size=12, include_input=False)
    assert max(int(x) for x in e.entries_num) > 52  # wraparound active
    spec = make_hashgrid_spec(
        n_levels=8, n_features_per_level=2, log2_hashmap_size=12,
        base_resolution=16, b=d['b'], include_input=False,
        scalar_tables=False)
    params = _transplant(e, spec)
    bounds = jnp.asarray(d['bbox'], jnp.float32)
    lo, hi = d['bbox'][0], d['bbox'][1]
    xyz = (lo + (hi - lo) * rng.uniform(0.01, 0.99, size=(4096, 3))
           ).astype(np.float32)

    out = n(hashgrid_encode(spec, params, jnp.asarray(xyz), bounds))
    out_ref = e(t(xyz), {}).detach().numpy()
    # dense levels are exact regardless
    np.testing.assert_allclose(out[:, :spec.start_hash],
                               out_ref[:, :spec.start_hash],
                               rtol=1e-4, atol=2e-5)
    std = out[:, spec.start_hash:].std(axis=0)
    std_ref = out_ref[:, spec.start_hash:].std(axis=0)
    np.testing.assert_allclose(std, std_ref, rtol=0.25)


def test_freq_encode(rng):
    from instant_nvr_tpu.models.embedders import freq_encode, freq_out_dim
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    enc = ref.PosEnc(multires=4)
    out_ref = enc(t(x)).numpy()
    out = n(freq_encode(jnp.asarray(x), 4))
    assert out.shape[-1] == freq_out_dim(4) == out_ref.shape[-1]
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# losses / criteria
# ---------------------------------------------------------------------------

def test_ssim_loss(rng):
    from instant_nvr_tpu.ops.ssim import ssim_loss
    H, W, C = 48, 40, 3
    img1 = rng.uniform(0, 1, size=(H, W, C)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(size=(H, W, C)).astype(np.float32) * 0.1,
                   0, 1).astype(np.float32)
    out = float(ssim_loss(jnp.asarray(img1), jnp.asarray(img2)))
    mod = ref.loss_utils.SSIM(window_size=11)
    out_ref = float(mod(t(np.moveaxis(img1, -1, 0))[None],
                        t(np.moveaxis(img2, -1, 0))[None]))
    assert abs(out - out_ref) < 1e-5


def test_reg_raw_crit(rng):
    from instant_nvr_tpu.renderer.inb_renderer import pair_reg_loss
    N = 64
    resd0 = rng.normal(size=(N, 3)).astype(np.float32) * 0.03
    resd1 = rng.normal(size=(N, 3)).astype(np.float32) * 0.03
    out = float(pair_reg_loss(jnp.asarray(resd0), jnp.asarray(resd1),
                              jnp.ones((N,), bool)))
    x = np.concatenate([resd0, resd1], axis=0)[None]  # (1, 2N, 3)
    out_ref = float(ref.crit.reg_raw_crit(t(x)))
    assert abs(out - out_ref) < 1e-5


def test_elastic_crit(rng):
    from instant_nvr_tpu.train.crit import elastic_crit
    jac = (np.eye(3, dtype=np.float32)
           + rng.normal(size=(1, 32, 3, 3)).astype(np.float32) * 0.2)
    out = float(elastic_crit(jnp.asarray(jac)))
    out_ref = float(ref.crit.elastic_crit({'resd_jacobian': t(jac)}, {}))
    assert abs(out - out_ref) < 1e-5


def test_sdf_mask_crit(rng):
    from instant_nvr_tpu.train.crit import sdf_mask_crit
    sdf = rng.normal(size=(1, 128)).astype(np.float32) * 0.02
    label = (rng.uniform(size=(1, 128)) > 0.5).astype(np.float32)
    for it in (5, 25000):
        out = float(sdf_mask_crit(jnp.asarray(sdf), jnp.asarray(label), it))
        out_ref = float(ref.crit.sdf_mask_crit(
            {'msk_sdf': t(sdf), 'msk_label': t(label)}, {'iter_step': it}))
        assert abs(out - out_ref) < 1e-6


def test_normal_crit(rng):
    from instant_nvr_tpu.train.crit import normal_crit
    N = 64
    pred = rng.normal(size=(N, 3)).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)
    gt = rng.normal(size=(N, 3)).astype(np.float32)
    view = rng.normal(size=(N, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    out = float(normal_crit(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray(view)))
    mask = torch.ones(N, dtype=torch.bool)
    out_ref = float(ref.crit.normal_crit(
        {'surf_normal': t(pred.copy()), 'surf_mask': mask},
        {'normal': t(gt), 'ray_d': t(view)}))
    assert abs(out - out_ref) < 1e-4


# ---------------------------------------------------------------------------
# optimizer / LR schedule
# ---------------------------------------------------------------------------

def test_adam_parity(rng):
    """optax.adam(eps=1e-15) == torch.optim.Adam(eps=1e-15) over 5 steps."""
    import optax
    p0 = rng.normal(size=(32,)).astype(np.float32)
    tgt = rng.normal(size=(32,)).astype(np.float32)
    lr = 5e-3

    opt = optax.adam(lr, eps=1e-15)
    p = jnp.asarray(p0)
    st = opt.init(p)
    for _ in range(5):
        g = jax.grad(lambda q: jnp.sum((q - jnp.asarray(tgt)) ** 2))(p)
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)

    p_t = t(p0.copy()).requires_grad_(True)
    opt_t = torch.optim.Adam([p_t], lr=lr, eps=1e-15)
    for _ in range(5):
        opt_t.zero_grad()
        ((p_t - t(tgt)) ** 2).sum().backward()
        opt_t.step()
    np.testing.assert_allclose(n(p), p_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_exponential_lr_schedule():
    """Fractional exponential decay vs the reference ExponentialLR."""
    from instant_nvr_tpu.train.state import make_lr_schedule
    lr, gamma, decay = 5e-3, 0.1, 1000.0
    sched = make_lr_schedule(lr, gamma, decay, ep_iter=500)

    p = torch.zeros(1, requires_grad=True)
    opt_t = torch.optim.Adam([p], lr=lr)
    ref_sched = ref.lr_scheduler.ExponentialLR(opt_t, decay_epochs=decay,
                                               gamma=gamma)
    for epoch in range(6):
        ours = float(sched(epoch * 500))
        assert abs(ours - opt_t.param_groups[0]['lr']) < 1e-12, epoch
        ref_sched.step()
