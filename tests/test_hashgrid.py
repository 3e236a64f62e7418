"""Hash-grid encoder vs an independent numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from instant_nvr_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                          hashgrid_init, make_hashgrid_spec)


def np_hashgrid_oracle(spec: HashGridSpec, params, xyz, bounds):
    """Straightforward numpy reimplementation of the encoding contract.

    Scalar grids store the per-row feature mean; semantically that is a
    table whose F features all equal the mean (the feature sum — the only
    thing a sum_over_features grid exposes — is then F * mean)."""
    dense = np.asarray(params["dense"])
    hsh = np.asarray(params["hash"])
    if spec.scalar:
        dense = np.repeat(dense[:, None], spec.n_features, axis=1)
        hsh = np.repeat(hsh[:, None], spec.n_features, axis=1)
    x01 = (xyz - bounds[0]) / (bounds[1] - bounds[0])
    N = xyz.shape[0]
    L, F = spec.n_levels, spec.n_features
    out = np.zeros((N, L, F), np.float32)
    corners = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    for lvl in range(L):
        n = spec.entries_num[lvl]
        flt = x01 * (n - 1)
        base = flt.astype(np.int32)  # trunc toward zero
        c000 = np.clip(base, 0, n - 1)
        off = flt - c000
        acc = np.zeros((N, F), np.float32)
        for (ci, cj, ck) in corners:
            idx = np.clip(base + np.array([ci, cj, ck]), 0, n - 1)
            w = np.prod(np.where(np.array([ci, cj, ck]) == 1, off, 1 - off), axis=-1)
            if lvl < spec.start_hash:
                flat = (idx[:, 0] * n * n + idx[:, 1] * n + idx[:, 2]
                        + spec.dense_offsets[lvl])
                v = dense[flat]
            else:
                iu = idx.astype(np.uint32)
                h = ((iu[:, 0] * np.uint32(spec.primes[0]))
                     ^ (iu[:, 1] * np.uint32(spec.primes[1]))
                     ^ (iu[:, 2] * np.uint32(spec.primes[2]))) % np.uint32(spec.table_size)
                # flat table: levels concatenated
                v = hsh[h.astype(np.int64) + (lvl - spec.start_hash) * spec.table_size]
            acc += w[:, None] * v
        out[:, lvl] = acc
    if spec.sum:
        val = out.sum(-1) if spec.sum_over_features else out.sum(-2)
    else:
        val = out.reshape(N, L * F)
    if spec.include_input:
        val = np.concatenate([x01, val], -1)
    return val


def _run_case(spec, seed=0, n=64):
    rng = np.random.default_rng(seed)
    params = hashgrid_init(jax.random.key(seed), spec)
    xyz = rng.uniform(-0.1, 1.1, size=(n, 3)).astype(np.float32)
    bounds = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    got = np.asarray(hashgrid_encode(spec, params, jnp.array(xyz), jnp.array(bounds)))
    want = np_hashgrid_oracle(spec, params, xyz, bounds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (n, spec.out_dim)


def test_part_config_body_small():
    # body-part config shape (downscaled table for test speed)
    spec = make_hashgrid_spec(n_levels=8, n_features_per_level=4,
                              log2_hashmap_size=10, base_resolution=4, b=1.38,
                              sum=True, sum_over_features=True, include_input=True)
    assert spec.start_hash > 0 and spec.n_hash_levels > 0
    _run_case(spec)


def test_all_dense():
    spec = make_hashgrid_spec(n_levels=4, n_features_per_level=2,
                              log2_hashmap_size=14, base_resolution=2, b=1.38)
    assert spec.start_hash == 4  # everything fits dense
    _run_case(spec)


def test_no_separate_dense_all_hashed():
    spec = make_hashgrid_spec(n_levels=4, n_features_per_level=2,
                              log2_hashmap_size=8, base_resolution=2, b=1.38,
                              separate_dense=False)
    assert spec.start_hash == 0
    _run_case(spec)


def test_concat_mode_uvt():
    # deformer embedder config: sum=False -> L*F concat (+3 input)
    spec = make_hashgrid_spec(n_levels=8, n_features_per_level=2,
                              log2_hashmap_size=14, base_resolution=4, b=1.38,
                              sum=False, include_input=True)
    assert spec.out_dim == 8 * 2 + 3
    _run_case(spec)


def test_out_dim_reference_configs():
    body = make_hashgrid_spec(n_levels=16, n_features_per_level=16,
                              log2_hashmap_size=20, base_resolution=16, b=1.38)
    assert body.out_dim == 16 + 3  # sum_over_features -> L, + xyz


def test_grad_flows():
    spec = make_hashgrid_spec(n_levels=4, n_features_per_level=2,
                              log2_hashmap_size=8, base_resolution=2)
    params = hashgrid_init(jax.random.key(0), spec)
    xyz = jnp.array(np.random.default_rng(0).uniform(0, 1, (16, 3)), jnp.float32)
    bounds = jnp.array([[0, 0, 0], [1, 1, 1]], jnp.float32)

    def loss(p):
        return jnp.sum(hashgrid_encode(spec, p, xyz, bounds) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_init_scale_matches_joint_kaiming():
    spec = make_hashgrid_spec(n_levels=8, n_features_per_level=16,
                              log2_hashmap_size=14, base_resolution=4)
    params = hashgrid_init(jax.random.key(0), spec)
    expected_std = np.sqrt(2.0 / (spec.table_size * spec.n_features))
    if spec.scalar:
        # scalar grids hold the per-row feature MEAN: std shrinks by sqrt(F)
        expected_std /= np.sqrt(spec.n_features)
    got_std = float(jnp.std(params["hash"]))
    assert abs(got_std - expected_std) / expected_std < 0.05


def test_packed_storage_matches_plain(monkeypatch):
    """Packed big-table routing (_is_packed/_lane_select + packed backward
    reshape) vs the plain path — the flagship's big tables take the packed
    path on TPU but no CPU test covered it (advisor round-2 finding)."""
    from instant_nvr_tpu.ops import hashgrid as hg

    spec = make_hashgrid_spec(n_levels=4, n_features_per_level=16,
                              log2_hashmap_size=10, base_resolution=2,
                              scalar_tables=False)
    rng = np.random.default_rng(3)
    xyz = jnp.array(rng.uniform(0, 1, (256, 3)), jnp.float32)
    bounds = jnp.array([[0, 0, 0], [1, 1, 1]], jnp.float32)
    cot = jnp.array(rng.normal(size=(256, spec.out_dim)), jnp.float32)

    def encode_and_grad():
        params = hashgrid_init(jax.random.key(7), spec)

        def loss(p):
            return jnp.sum(hashgrid_encode(spec, p, xyz, bounds) * cot)

        out = hashgrid_encode(spec, params, xyz, bounds)
        return params, out, jax.grad(loss)(params)

    plain_params, plain_out, plain_grad = encode_and_grad()
    assert plain_params["hash"].shape[1] == spec.n_features  # plain layout

    # force the packed path (kernel-row threshold far below these tables);
    # keep the TILE_ROWS pad small so the CPU test stays light
    monkeypatch.setattr(hg, "KERNEL_MIN_ROWS", 64)
    monkeypatch.setattr(hg, "TILE_ROWS", 128)
    packed_params, packed_out, packed_grad = encode_and_grad()
    assert packed_params["hash"].shape[1] == 128  # packed layout

    np.testing.assert_allclose(np.asarray(packed_out), np.asarray(plain_out),
                               rtol=1e-5, atol=1e-6)
    for key in ("dense", "hash"):
        rows = plain_grad[key].shape[0]
        unpacked = np.asarray(packed_grad[key]).reshape(-1, spec.n_features)
        np.testing.assert_allclose(unpacked[:rows], np.asarray(plain_grad[key]),
                                   rtol=1e-5, atol=1e-6)
        assert not np.any(unpacked[rows:])  # tile padding stays zero


def test_scalar_padded_storage_matches_plain(monkeypatch):
    """Scalar tables with kernel tile-padding (big-table storage on TPU) vs
    the unpadded default: same encodings, same grads, padding slots zero."""
    from instant_nvr_tpu.ops import hashgrid as hg

    spec = make_hashgrid_spec(n_levels=4, n_features_per_level=16,
                              log2_hashmap_size=10, base_resolution=2)
    assert spec.scalar
    rng = np.random.default_rng(5)
    xyz = jnp.array(rng.uniform(0, 1, (256, 3)), jnp.float32)
    bounds = jnp.array([[0, 0, 0], [1, 1, 1]], jnp.float32)
    cot = jnp.array(rng.normal(size=(256, spec.out_dim)), jnp.float32)

    def encode_and_grad():
        params = hashgrid_init(jax.random.key(7), spec)

        def loss(p):
            return jnp.sum(hashgrid_encode(spec, p, xyz, bounds) * cot)

        out = hashgrid_encode(spec, params, xyz, bounds)
        return params, out, jax.grad(loss)(params)

    p_plain, out_plain, g_plain = encode_and_grad()
    assert p_plain["hash"].ndim == 1  # scalar storage

    monkeypatch.setattr(hg, "KERNEL_MIN_ROWS", 64)
    monkeypatch.setattr(hg, "TILE_ROWS", 128)
    p_pad, out_pad, g_pad = encode_and_grad()
    assert p_pad["hash"].shape[0] % 128 == 0  # tile-padded

    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-6)
    for key in ("dense", "hash"):
        rows = g_plain[key].shape[0]
        np.testing.assert_allclose(np.asarray(g_pad[key])[:rows],
                                   np.asarray(g_plain[key]),
                                   rtol=1e-5, atol=1e-6)
        assert not np.any(np.asarray(g_pad[key])[rows:])  # padding stays zero


def test_scalar_matches_full_table_adam_trajectory():
    """The exactness claim behind scalar storage: a (T,) scalar grid seeded
    with the feature means of a full (T, F) table reproduces the full
    table's ENTIRE Adam training trajectory (sum_over_features forward), up
    to Adam's eps.  Backward hands every feature of a row the identical
    gradient, so per-feature updates stay identical; the scalar grid tracks
    their common trajectory."""
    import optax
    from instant_nvr_tpu.ops.hashgrid import pack_table

    kwargs = dict(n_levels=3, n_features_per_level=8, log2_hashmap_size=9,
                  base_resolution=2, b=1.9)
    spec_f = make_hashgrid_spec(scalar_tables=False, **kwargs)
    spec_s = make_hashgrid_spec(scalar_tables=True, **kwargs)
    assert not spec_f.scalar and spec_s.scalar and spec_f.out_dim == spec_s.out_dim

    rng = np.random.default_rng(11)
    xyz = jnp.array(rng.uniform(0, 1, (512, 3)), jnp.float32)
    bounds = jnp.array([[0, 0, 0], [1, 1, 1]], jnp.float32)
    target = jnp.array(rng.normal(size=(512, spec_f.out_dim)), jnp.float32)

    p_f = hashgrid_init(jax.random.key(3), spec_f)
    p_s = {k: pack_table(v, scalar=True) for k, v in p_f.items()}

    opt = optax.adam(1e-2, eps=1e-15)

    def run(spec, params, n=25):
        ost = opt.init(params)

        @jax.jit
        def step(params, ost):
            def loss(p):
                return jnp.mean((hashgrid_encode(spec, p, xyz, bounds)
                                 - target) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            up, ost = opt.update(g, ost, params)
            return optax.apply_updates(params, up), ost, l

        for _ in range(n):
            params, ost, l = step(params, ost)
        return hashgrid_encode(spec, params, xyz, bounds), l

    out_f, loss_f = run(spec_f, p_f)
    out_s, loss_s = run(spec_s, p_s)
    # trajectories agree to Adam-eps-level noise after 25 steps
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                               rtol=2e-4, atol=2e-4)
    assert abs(float(loss_f) - float(loss_s)) < 1e-5


def test_multi_part_encode_matches_per_part():
    """multi_hashgrid_encode == concat of per-part hashgrid_encode (values
    and table/point gradients)."""
    from instant_nvr_tpu.ops.hashgrid import multi_hashgrid_encode

    specs = tuple(
        make_hashgrid_spec(n_levels=6, n_features_per_level=4,
                           log2_hashmap_size=h, base_resolution=r)
        for (h, r) in ((10, 4), (10, 2), (8, 2), (6, 2), (6, 2)))
    seg_sizes = (40, 24, 16, 8, 8)
    rng = np.random.default_rng(11)
    params = [hashgrid_init(jax.random.key(100 + i), s)
              for i, s in enumerate(specs)]
    pts = jnp.array(rng.uniform(-0.2, 1.2, (sum(seg_sizes), 3)), jnp.float32)
    bounds = jnp.array([[[0, 0, 0], [1, 1, 1]],
                        [[-1, -1, -1], [1, 1, 1]],
                        [[0, 0, 0], [2, 2, 2]],
                        [[-.5, 0, 0], [.5, 1, 1]],
                        [[0, -.5, 0], [1, .5, 1]]], jnp.float32)
    cot_key = jax.random.key(5)

    def multi(params, pts):
        return multi_hashgrid_encode(specs, params, pts, bounds, seg_sizes)

    def per_part(params, pts):
        outs = []
        o = 0
        for i, s in enumerate(specs):
            outs.append(hashgrid_encode(s, params[i], pts[o:o + seg_sizes[i]],
                                        bounds[i]))
            o += seg_sizes[i]
        return jnp.concatenate(outs, axis=0)

    got = multi(params, pts)
    want = per_part(params, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cot = jax.random.normal(cot_key, got.shape)
    g_multi = jax.grad(lambda p, x: jnp.sum(multi(p, x) * cot),
                       argnums=(0, 1))(params, pts)
    g_ref = jax.grad(lambda p, x: jnp.sum(per_part(p, x) * cot),
                     argnums=(0, 1))(params, pts)
    for a, b in zip(jax.tree.leaves(g_multi), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_wide_row_gather_f32_bit_exact():
    """The f32 wide gather goes through the u16 lane-pair recombination
    (compact TPU layout, docs/PERF.md round 5) — it must stay BIT-exact
    vs a plain table[idx], including negatives/denormals/NaN payloads."""
    from instant_nvr_tpu.ops.hashgrid import _wide_row_gather
    rng = np.random.default_rng(3)
    table = rng.standard_normal(1000).astype(np.float32)
    table[:4] = [0.0, -0.0, np.inf, 1e-42]
    idx = rng.integers(0, 1000, size=5000).astype(np.int32)
    got = np.asarray(_wide_row_gather(jnp.array(table), jnp.array(idx)))
    want = table[idx]
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))
