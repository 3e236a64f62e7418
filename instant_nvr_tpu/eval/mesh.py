"""Canonical-pose mesh extraction (tmesh / tdmesh).

Rebuild of the reference mesh path (``run.py:166-227`` + marching cubes in
``lib/visualizers/if_nerf.py:133-175``): sample the part networks' occupancy
on a canonical-space grid (optionally after the UV-deformer residual for
``tdmesh``), then extract an isosurface.

Isosurface extraction is a from-scratch **marching tetrahedra** (mcubes is
not in this environment): each voxel splits into 6 tetrahedra; each tet
contributes 0-2 triangles with vertices linearly interpolated on the
crossing edges.  Self-contained numpy, writes .obj + .npy occupancy grid
(the ``latest.npy`` geometry-pruning artifact of the reference).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

# 6-tet decomposition of a cube (corner indices, bit order x*4+y*2+z)
_TETS = np.array([
    [0, 5, 1, 3], [0, 4, 5, 3], [4, 6, 5, 3],
    [5, 6, 7, 3], [0, 2, 3, 6], [0, 3, 4, 6],
])
_CUBE = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)])


def marching_tetrahedra(grid: np.ndarray, iso: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """grid (X, Y, Z) scalar field -> (verts (V, 3) in index coords, faces)."""
    X, Y, Z = grid.shape
    # cube corner values for every voxel: (X-1, Y-1, Z-1, 8)
    vals = np.empty((X - 1, Y - 1, Z - 1, 8), grid.dtype)
    for c, (dx, dy, dz) in enumerate(_CUBE):
        vals[..., c] = grid[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]

    base = np.stack(np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                                np.arange(Z - 1), indexing="ij"), -1)  # (...,3)

    verts_out = []
    faces_out = []
    n_verts = 0
    for tet in _TETS:
        tv = vals[..., tet]                          # (..., 4)
        inside = tv > iso                            # (..., 4)
        code = (inside * np.array([1, 2, 4, 8])).sum(-1)
        corners = _CUBE[tet]                         # (4, 3)

        # case -> list of triangles, each triangle = 3 edges (pairs of tet verts)
        def tris_for(code_val):
            ins = [i for i in range(4) if code_val >> i & 1]
            outs = [i for i in range(4) if not code_val >> i & 1]
            if len(ins) == 0 or len(ins) == 4:
                return []
            if len(ins) == 1:
                a = ins[0]
                e = [(a, outs[0]), (a, outs[1]), (a, outs[2])]
                return [e]
            if len(ins) == 3:
                a = outs[0]
                e = [(a, ins[0]), (a, ins[1]), (a, ins[2])]
                return [e]
            # 2 in, 2 out -> quad -> 2 triangles
            a, b = ins
            c, d = outs
            e1, e2, e3, e4 = (a, c), (a, d), (b, d), (b, c)
            return [[e1, e2, e3], [e1, e3, e4]]

        for code_val in range(1, 15):
            mask = code == code_val
            if not mask.any():
                continue
            cells = base[mask]                       # (M, 3)
            cvals = tv[mask]                         # (M, 4)
            for tri in tris_for(code_val):
                tri_pts = []
                for (i, j) in tri:
                    vi, vj = cvals[:, i], cvals[:, j]
                    t = (iso - vi) / np.where(np.abs(vj - vi) < 1e-12, 1e-12,
                                              vj - vi)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pi = cells + corners[i]
                    pj = cells + corners[j]
                    tri_pts.append(pi + t * (pj - pi))
                m = len(cells)
                verts_out.extend(tri_pts)
                idx = n_verts + np.arange(m)
                faces_out.append(np.stack([idx, idx + m, idx + 2 * m], -1))
                n_verts += 3 * m

    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_out, axis=0)
    faces = np.concatenate(faces_out, axis=0)
    return verts, faces


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def occupancy_grid(cfg, mspec, params, batch_meta: Dict, deformed: bool,
                   res: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate aggregated part occupancy on a canonical-space grid."""
    import jax
    import jax.numpy as jnp
    from ..models.deformer import deformer_apply
    from ..ops.hashgrid import hashgrid_encode
    from ..models.nn import mlp_apply

    tb = np.asarray(batch_meta["tbounds"])
    axes = [np.linspace(tb[0, d], tb[1, d], res, dtype=np.float32)
            for d in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    # params/meta as jit ARGUMENTS — closing over the big param pytree embeds
    # it as HLO constants and makes (remote) compiles pathologically slow
    @jax.jit
    def occ_chunk(prm, meta, x):
        if deformed:
            x = x + deformer_apply(mspec.deformer, prm["deformer"], x,
                                   meta["tuv"], meta["tbounds"],
                                   meta["frame_dim"])
        occs = []
        for p, name in enumerate(mspec.partnames):
            emb = hashgrid_encode(mspec.part_embeds[p], prm["embed"][name],
                                  x, meta["part_bounds"][p])
            h = mlp_apply(jax.tree.map(lambda a: a[p], prm["occ"]), emb)
            o = 1.0 - jnp.exp(-jax.nn.softplus(h[..., 0]))
            inside = jnp.all((x >= meta["part_bounds"][p, 0])
                             & (x <= meta["part_bounds"][p, 1]), -1)
            occs.append(jnp.where(inside, o, 0.0))
        occ = jnp.max(jnp.stack(occs), axis=0)
        if "tbw" in meta:
            from ..ops.grid_sample import pts_sample_volume
            dist = pts_sample_volume(x, meta["tbw"], meta["tbounds"])[:, -1]
            occ = jnp.where(dist < mesh_thresh, occ, 0.0)
        return occ

    meta = {"tuv": jnp.asarray(batch_meta["tuv"]),
            "tbounds": jnp.asarray(batch_meta["tbounds"]),
            "frame_dim": jnp.asarray(batch_meta.get("frame_dim", 0.0), jnp.float32),
            "part_bounds": jnp.asarray(batch_meta["part_bounds"])}
    # canonical SMPL-distance cull (like the render path): training never
    # supervises points far from the surface, so the raw field is dense there
    tbw = batch_meta.get("tbw")
    use_tbw = tbw is not None and np.asarray(tbw).ndim == 4
    if use_tbw:
        meta["tbw"] = jnp.asarray(tbw)
    mesh_thresh = 2.0 * float(cfg.get("smpl_thresh", 0.05)) if cfg else 0.1
    chunk = 65536
    out = []
    for i in range(0, len(pts), chunk):
        x = pts[i:i + chunk]
        if len(x) < chunk:
            x = np.pad(x, ((0, chunk - len(x)), (0, 0)))
        out.append(np.asarray(occ_chunk(params, meta, jnp.asarray(x))))
    occ = np.concatenate(out)[:len(pts)].reshape(res, res, res)
    return occ, tb


def extract_mesh(cfg, mspec, params, out_dir: str, deformed: bool = False,
                 res: int = 128, iso: float = 0.5):
    from ..datasets.tpose_dataset import TPoseDataset
    os.makedirs(out_dir, exist_ok=True)
    ds = TPoseDataset(cfg, "test")
    item = ds.get_item(0)
    occ, tb = occupancy_grid(cfg, mspec, params, item, deformed, res)
    np.save(os.path.join(out_dir, "latest.npy"), occ)
    verts, faces = marching_tetrahedra(occ, iso)
    verts = tb[0] + verts / (res - 1) * (tb[1] - tb[0])
    path = os.path.join(out_dir, "mesh.obj")
    write_obj(path, verts, faces)
    print(f"wrote {path}: {len(verts)} verts, {len(faces)} faces")
    return verts, faces
