"""Compute-matches stage driver — the hottest pipeline path.

Rebuilds ``R3DComputeMatches::computeMatches`` (src/R3DComputeMatches.cpp:
1667-2256): features -> exhaustive pairs -> putative matching (ratio test)
-> geometric filtering (ACRANSAC F, then E with the overlap prune, then H)
-> match files + adjacency SVGs + statistics.

TPU mapping:
* the ANN matcher menu (FLANN/KGraph/MRPT/HNSW/brute, :2035-2062) collapses
  into the fused MXU distance/top-2 kernel (kernels/match.py) — presets
  remain accepted and map onto the exact matcher;
* pairs are matched in fixed-size blocks (P2 pair-block parallelism):
  descriptors are stacked per pair block and the kernel is vmapped;
* geometric filters run as the vectorized AC-RANSAC with 2048-iteration /
  4.0 px parity defaults (:2088-2101);
* the E-matrix overlap prune keeps a pair only if >=50 geometric matches or
  >=30% putative survival (:2173-2191).

Artifacts (contract parity, SURVEY.md §A.4): matches.putative.txt,
matches.f.txt, matches.e.txt, matches.h.txt (OpenMVG text format:
``I J\\nN\\ni j`` per pair), Putative/GeometricAdjacencyMatrix.svg.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core import cameras
from regard3d_tpu.kernels import match as match_mod
from regard3d_tpu.kernels import ransac
from regard3d_tpu.pipeline import features as feat_mod

# matcher menu parity (src/res/Regard3dMainFrameBase.fbp:9300); every preset
# maps onto the exact MXU matcher — kept for API compatibility
MATCHER_PRESETS = ("flann", "kgraph-fast", "kgraph-medium", "kgraph-precise",
                   "brute-force", "mrpt", "hnsw-fast", "hnsw-medium",
                   "hnsw-precise")


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    ratio: float = 0.8                # presets 0.6/0.7/0.8/0.9
    matcher: str = "brute-force"
    mutual: bool = False
    ransac_iters: int = 1024          # reference default 2048 (:2100)
    max_err_px: float = 4.0
    e_min_matches: int = 50           # overlap prune (:2173-2191)
    e_min_survival: float = 0.3
    compute_homography: bool = True


def exhaustive_pairs(n: int) -> List[Tuple[int, int]]:
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def save_matches_txt(path: str, matches: Dict[Tuple[int, int], np.ndarray]):
    with open(path, "w") as f:
        for (i, j), m in sorted(matches.items()):
            if len(m) == 0:
                continue
            f.write(f"{i} {j}\n{len(m)}\n")
            for a, b in m:
                f.write(f"{a} {b}\n")


def load_matches_txt(path: str) -> Dict[Tuple[int, int], np.ndarray]:
    out = {}
    with open(path) as f:
        lines = f.read().split()
    pos = 0
    while pos < len(lines):
        i, j = int(lines[pos]), int(lines[pos + 1])
        n = int(lines[pos + 2])
        pos += 3
        arr = np.asarray(lines[pos:pos + 2 * n], np.int64).reshape(n, 2)
        pos += 2 * n
        out[(i, j)] = arr
    return out


def adjacency_svg(path: str, n: int,
                  counts: Dict[Tuple[int, int], int], cell: int = 12):
    """Adjacency-matrix SVG (PutativeAdjacencyMatrix.svg parity)."""
    size = (n + 1) * cell
    mx = max(counts.values(), default=1) or 1
    rects = []
    for (i, j), c in counts.items():
        if c <= 0:
            continue
        o = int(255 * (1.0 - min(c / mx, 1.0)))
        for (a, b) in ((i, j), (j, i)):
            rects.append(
                f'<rect x="{(b + 1) * cell}" y="{(a + 1) * cell}" '
                f'width="{cell - 1}" height="{cell - 1}" '
                f'fill="rgb({o},{o},255)"><title>({a},{b}): {c}</title>'
                f'</rect>')
    svg = (f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
           f'height="{size}">' + "".join(rects) + "</svg>")
    with open(path, "w") as f:
        f.write(svg)


def match_all_pairs(kps, descs, cfg: MatchConfig,
                    pairs: Optional[List[Tuple[int, int]]] = None,
                    progress=None) -> Dict[Tuple[int, int], np.ndarray]:
    """Putative matching for every pair: fused distance + top-2 + ratio.
    kps/descs: padded (B, N, ...) arrays from ``features.load_all_padded``."""
    B, N, D = descs.data.shape
    if pairs is None:
        pairs = exhaustive_pairs(B)

    use_pallas = (jax.default_backend() == "tpu"
                  and N % 256 == 0 and D % 128 == 0)

    out = {}
    # fixed-size pair blocks: one device dispatch per block (P2 pair-block
    # parallelism; kills per-pair dispatch overhead at many-image scale)
    BLOCK = 16
    total = len(pairs)
    padded = pairs + [pairs[-1]] * ((-len(pairs)) % BLOCK)
    for start in range(0, len(padded), BLOCK):
        chunk = padded[start:start + BLOCK]
        parr = jnp.asarray(np.asarray(chunk, np.int32))
        idx, d1, ok = match_mod.match_pair_block(
            descs.data, descs.mask, parr, cfg.ratio, use_pallas)
        if cfg.mutual:
            rev = jnp.stack([parr[:, 1], parr[:, 0]], -1)
            idx_b, _, ok_b = match_mod.match_pair_block(
                descs.data, descs.mask, rev, cfg.ratio, use_pallas)
            ok = jax.vmap(match_mod.mutual_filter)(idx, ok, idx_b, ok_b)
        idx_np = np.asarray(idx)
        ok_np = np.asarray(ok)
        for bi, (i, j) in enumerate(chunk):
            if start + bi >= total:
                break
            ia = np.where(ok_np[bi])[0]
            out[(i, j)] = np.stack([ia, idx_np[bi][ia]],
                                   -1).astype(np.int64)
            if progress:
                progress(min(start + bi + 1, total), total)
    return out


@dataclasses.dataclass
class FilterResult:
    f: Dict[Tuple[int, int], np.ndarray]
    e: Dict[Tuple[int, int], np.ndarray]
    h: Dict[Tuple[int, int], np.ndarray]
    stats: Dict


def geometric_filter(kps, putative: Dict[Tuple[int, int], np.ndarray],
                     image_sizes: np.ndarray,
                     focals: Optional[np.ndarray],
                     cfg: MatchConfig, seed: int = 0,
                     progress=None) -> FilterResult:
    """ACRANSAC F -> E (+overlap prune) -> H per pair
    (src/R3DComputeMatches.cpp:2086-2233)."""
    key = jax.random.PRNGKey(seed)
    xy = np.asarray(kps.xy)
    out_f, out_e, out_h = {}, {}, {}
    n_done = 0
    for (i, j), m in sorted(putative.items()):
        n_done += 1
        if progress:
            progress(n_done, len(putative))
        if len(m) < 16:
            continue
        x1 = xy[i][m[:, 0]]
        x2 = xy[j][m[:, 1]]
        n = len(m)
        cap = max(64, 1 << int(np.ceil(np.log2(n))))
        pad = cap - n
        x1p = jnp.asarray(np.pad(x1, ((0, pad), (0, 0)), ).astype(np.float32))
        x2p = jnp.asarray(np.pad(x2, ((0, pad), (0, 0)), ).astype(np.float32))
        maskp = jnp.asarray(np.arange(cap) < n)
        w = float(max(image_sizes[i][0], image_sizes[j][0]))
        h = float(max(image_sizes[i][1], image_sizes[j][1]))

        key, kf, ke, kh = jax.random.split(key, 4)
        # --- F ---
        rf = ransac.acransac_f(kf, x1p, x2p, maskp, w, h,
                               iters=cfg.ransac_iters,
                               max_err_px=cfg.max_err_px)
        if bool(rf.valid):
            inl = np.asarray(rf.inliers)[:n]
            out_f[(i, j)] = m[inl]

        # --- E (needs focal priors) + overlap prune ---
        if focals is not None and focals[i] > 0 and focals[j] > 0:
            c1 = image_sizes[i] / 2.0
            c2 = image_sizes[j] / 2.0
            x1n = (x1 - c1) / focals[i]
            x2n = (x2 - c2) / focals[j]
            x1np = jnp.asarray(np.pad(x1n, ((0, pad), (0, 0))).astype(np.float32))
            x2np = jnp.asarray(np.pad(x2n, ((0, pad), (0, 0))).astype(np.float32))
            fmean = float(np.sqrt(focals[i] * focals[j]))
            re = ransac.acransac_e(ke, x1np, x2np, maskp, focal_px=fmean,
                                   iters=cfg.ransac_iters,
                                   max_err_px=cfg.max_err_px)
            if bool(re.valid):
                inl = np.asarray(re.inliers)[:n]
                ne = int(inl.sum())
                # overlap prune (:2173-2191)
                if ne >= cfg.e_min_matches or ne >= cfg.e_min_survival * n:
                    out_e[(i, j)] = m[inl]

        # --- H ---
        if cfg.compute_homography:
            rh = ransac.acransac_h(kh, x1p, x2p, maskp, w, h,
                                   iters=cfg.ransac_iters,
                                   max_err_px=cfg.max_err_px)
            if bool(rh.valid):
                inl = np.asarray(rh.inliers)[:n]
                out_h[(i, j)] = m[inl]

    stats = {
        "pairs_putative": len(putative),
        "pairs_f": len(out_f),
        "pairs_e": len(out_e),
        "pairs_h": len(out_h),
        "matches_putative": int(sum(len(m) for m in putative.values())),
        "matches_f": int(sum(len(m) for m in out_f.values())),
        "matches_e": int(sum(len(m) for m in out_e.values())),
        "matches_h": int(sum(len(m) for m in out_h.values())),
    }
    return FilterResult(out_f, out_e, out_h, stats)


def write_stage_sfm_data(out_dir: str, image_sizes: np.ndarray,
                         focals: Optional[np.ndarray],
                         image_names: Optional[Sequence[str]] = None):
    """views+intrinsics sfm_data.json + legacy lists.txt in the matches dir
    (writeSfmData / ensureSfmDataExists parity, src/R3DProject.cpp:1118,
    SURVEY.md §A.4)."""
    from regard3d_tpu.core import sfm_data as sd
    from regard3d_tpu.core.types import RADIAL_K3, Scene
    import jax.numpy as jnp
    V = len(image_sizes)
    s = Scene.empty(V, V, 1, 1)
    f = (np.asarray(focals) if focals is not None
         else 1.1 * image_sizes.max(1))
    params = np.zeros((V, 9), np.float32)
    params[:, 0] = f
    params[:, 1] = image_sizes[:, 0] / 2.0
    params[:, 2] = image_sizes[:, 1] / 2.0
    s = s.replace(
        views=s.views.replace(
            width=jnp.asarray(image_sizes[:, 0].astype(np.int32)),
            height=jnp.asarray(image_sizes[:, 1].astype(np.int32)),
            intrinsic_id=jnp.arange(V, dtype=jnp.int32),
            mask=jnp.ones((V,), bool)),
        intrinsics=s.intrinsics.replace(
            model=jnp.full((V,), RADIAL_K3, jnp.int32),
            params=jnp.asarray(params),
            width=jnp.asarray(image_sizes[:, 0].astype(np.int32)),
            height=jnp.asarray(image_sizes[:, 1].astype(np.int32)),
            mask=jnp.ones((V,), bool)))
    sd.save_json(os.path.join(out_dir, "sfm_data.json"), s, image_names)
    with open(os.path.join(out_dir, "lists.txt"), "w") as fh:
        for i in range(V):
            name = image_names[i] if image_names else f"image{i:06d}.jpg"
            fh.write(f"{name};{image_sizes[i, 0]};{image_sizes[i, 1]}\n")


def run_compute_matches(images: Sequence[np.ndarray], out_dir: str,
                        threshold: float = 0.0007,
                        cfg: MatchConfig = MatchConfig(),
                        focals: Optional[np.ndarray] = None,
                        max_keypoints: int = 4096,
                        force: bool = False,
                        image_names: Optional[Sequence[str]] = None,
                        detector: str = "fast-akaze",
                        progress=None) -> Dict:
    """Full compute-matches step on a list of gray images. Returns stats."""
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    sizes0 = np.asarray([[im.shape[1], im.shape[0]] for im in images])
    write_stage_sfm_data(out_dir, sizes0, focals, image_names)
    counts = feat_mod.extract_features(images, out_dir, threshold,
                                       max_keypoints, force=force,
                                       detector=detector,
                                       progress=progress)
    kps, descs = feat_mod.load_all_padded(out_dir, len(images), pad_to=256)
    putative = match_all_pairs(kps, descs, cfg, progress=progress)
    image_sizes = np.asarray([[im.shape[1], im.shape[0]] for im in images])
    filt = geometric_filter(kps, putative, image_sizes, focals, cfg,
                            progress=progress)

    save_matches_txt(os.path.join(out_dir, "matches.putative.txt"), putative)
    save_matches_txt(os.path.join(out_dir, "matches.f.txt"), filt.f)
    save_matches_txt(os.path.join(out_dir, "matches.e.txt"), filt.e)
    save_matches_txt(os.path.join(out_dir, "matches.h.txt"), filt.h)
    n = len(images)
    adjacency_svg(os.path.join(out_dir, "PutativeAdjacencyMatrix.svg"), n,
                  {k: len(v) for k, v in putative.items()})
    adjacency_svg(os.path.join(out_dir, "GeometricAdjacencyMatrix.svg"), n,
                  {k: len(v) for k, v in filt.f.items()})

    stats = dict(filt.stats)
    stats["keypoints"] = counts
    stats["elapsed_s"] = time.time() - t0
    return stats
