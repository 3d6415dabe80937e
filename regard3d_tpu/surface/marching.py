"""Marching tetrahedra isosurface extraction (host-side, vectorized numpy).

Companion to the FFT Poisson solve in :mod:`regard3d_tpu.surface.poisson`.
Marching *tetrahedra* rather than marching cubes: each cube splits into 6
tets around the 0-6 diagonal and every one of a tet's 16 sign patterns
reduces to three shapes (0, 1 or 2 triangles) that are derived
programmatically below — no hand-maintained 256-case tables, no ambiguous
configurations, and the result is watertight by construction.

Vertices are welded exactly: a crossing vertex is identified by the grid
edge it lies on (unordered pair of flat grid indices), shared by every tet
that touches the edge.  Faces are oriented a posteriori along -grad(chi)
(outward for an indicator that is higher inside).
"""

from __future__ import annotations

import numpy as np

# cube corners (dx, dy, dz), and the 6-tet decomposition around diag 0-6
_CORNERS = np.array([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                     (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
                    np.int64)
_TETS = np.array([(0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
                  (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6)], np.int64)
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _build_case_table():
    """16 sign cases -> up to 2 triangles of tet-edge indices (-1 pad)."""
    eidx = {frozenset(e): i for i, e in enumerate(_TET_EDGES)}
    table = np.full((16, 2, 3), -1, np.int64)
    for case in range(16):
        inside = [k for k in range(4) if case >> k & 1]
        outside = [k for k in range(4) if not case >> k & 1]
        if len(inside) == 1:
            i = inside[0]
            table[case, 0] = [eidx[frozenset((i, o))] for o in outside]
        elif len(inside) == 3:
            o = outside[0]
            table[case, 0] = [eidx[frozenset((i, o))] for i in inside]
        elif len(inside) == 2:
            (i1, i2), (o1, o2) = inside, outside
            a = eidx[frozenset((i1, o1))]
            b = eidx[frozenset((i1, o2))]
            c = eidx[frozenset((i2, o2))]
            d = eidx[frozenset((i2, o1))]
            table[case, 0] = [a, b, c]
            table[case, 1] = [a, c, d]
    return table


_CASES = _build_case_table()


def _slab_triangles(vol: np.ndarray, iso: float, x0: int, x1: int):
    """Edge-key triangle list for cubes with origin x in [x0, x1)."""
    n = vol.shape[0]
    xs = np.arange(x0, x1)
    ys = np.arange(n - 1)
    zs = np.arange(n - 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    X, Y, Z = X.ravel(), Y.ravel(), Z.ravel()

    cvals = np.empty((len(X), 8), vol.dtype)
    cids = np.empty((len(X), 8), np.int64)
    for c, (dx, dy, dz) in enumerate(_CORNERS):
        cvals[:, c] = vol[X + dx, Y + dy, Z + dz]
        cids[:, c] = (X + dx) * n * n + (Y + dy) * n + (Z + dz)

    out = []
    edges = np.asarray(_TET_EDGES, np.int64)
    for t in range(6):
        tv = cvals[:, _TETS[t]]                       # (C, 4)
        ti = cids[:, _TETS[t]]
        case = ((tv > iso) << np.arange(4)).sum(1)
        for k in range(2):
            tri_e = _CASES[case, k]                   # (C, 3) edge idx or -1
            valid = tri_e[:, 0] >= 0
            if not valid.any():
                continue
            te = tri_e[valid]
            va = ti[valid][np.arange(valid.sum())[:, None],
                           edges[te][..., 0]]         # (Cv, 3) grid ids
            vb = ti[valid][np.arange(valid.sum())[:, None],
                           edges[te][..., 1]]
            lo = np.minimum(va, vb)
            hi = np.maximum(va, vb)
            out.append(lo * (n * n * n) + hi)         # (Cv, 3) edge keys
    if not out:
        return np.zeros((0, 3), np.int64)
    return np.concatenate(out)


def marching_tetrahedra(vol: np.ndarray, iso: float, slab: int = 32):
    """Extract the iso-surface of an n^3 volume.

    Returns (verts, faces): verts in unit-cube coordinates (the grid spans
    [0, 1]^3), faces (T, 3) int32 with outward orientation for a field
    that is larger inside."""
    n = vol.shape[0]
    keys = []
    for x0 in range(0, n - 1, slab):
        keys.append(_slab_triangles(vol, iso, x0, min(x0 + slab, n - 1)))
    tri_keys = np.concatenate(keys) if keys else np.zeros((0, 3), np.int64)
    if not len(tri_keys):
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    uniq, inv = np.unique(tri_keys.ravel(), return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)

    # positions: decode the two grid endpoints of each edge, interpolate
    n3 = n * n * n
    ga = uniq // n3
    gb = uniq % n3
    def coords(g):
        return np.stack([g // (n * n), (g // n) % n, g % n], -1)
    pa = coords(ga).astype(np.float64)
    pb = coords(gb).astype(np.float64)
    va = vol.ravel()[ga].astype(np.float64)
    vb = vol.ravel()[gb].astype(np.float64)
    t = np.clip((iso - va) / np.where(np.abs(vb - va) < 1e-30, 1.0, vb - va),
                0.0, 1.0)
    verts = (pa + t[:, None] * (pb - pa)) / (n - 1)

    # drop degenerate faces (two corners welded to the same vertex)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    # orient along -gradient (chi larger inside => outward normals)
    if len(faces):
        cent = verts[faces].mean(1)
        e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
        e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
        nrm = np.cross(e1, e2)
        grad = _sample_gradient(vol, cent)
        flip = (nrm * grad).sum(1) > 0
        faces[flip] = faces[flip][:, [0, 2, 1]]
    return verts.astype(np.float32), faces


def _sample_gradient(vol: np.ndarray, unit_pts: np.ndarray):
    """Central-difference gradient of the volume at unit-cube points."""
    n = vol.shape[0]
    p = np.clip(unit_pts * (n - 1), 1, n - 2)
    i = p.astype(np.int64)
    out = np.empty_like(unit_pts)
    for ax in range(3):
        up = i.copy()
        dn = i.copy()
        up[:, ax] += 1
        dn[:, ax] -= 1
        out[:, ax] = (vol[up[:, 0], up[:, 1], up[:, 2]]
                      - vol[dn[:, 0], dn[:, 1], dn[:, 2]])
    return out


def compact_mesh(verts: np.ndarray, faces: np.ndarray):
    """Drop unreferenced vertices after face filtering; reindex faces."""
    if not len(faces):
        return verts[:0], faces
    used, inv = np.unique(faces.ravel(), return_inverse=True)
    return verts[used], inv.reshape(-1, 3).astype(np.int32)
