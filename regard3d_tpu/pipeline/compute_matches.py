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
* the E-matrix overlap prune keeps a pair only if >=50 geometric matches AND
  >=30% putative survival (the reference drops on either failure,
  :2173-2191).

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


def matcher_knobs(matcher: str) -> Dict:
    """Map the reference's ANN menu onto the exact matcher's real knobs.

    The approximate presets (FLANN/KGraph/MRPT/HNSW fast & medium,
    src/R3DComputeMatches.cpp:2035-2062) trade accuracy for speed; here the
    same trade is bfloat16 MXU inputs (~2x matmul rate, f32 accumulation —
    LIOP descriptors are unit-norm so the top-2 ordering rarely flips).
    ``brute-force`` and the ``*-precise`` presets stay f32."""
    m = (matcher or "brute-force").lower()
    precise = m == "brute-force" or m.endswith("-precise")
    return {"bf16": not precise}


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


def sequential_pairs(n: int, window: int) -> List[Tuple[int, int]]:
    """Ordered-capture pair pruning: each view pairs with its next
    ``window`` successors (the large-N alternative to the reference's
    exhaustive pair loop, src/R3DComputeMatches.cpp:2042)."""
    return [(i, j) for i in range(n)
            for j in range(i + 1, min(i + 1 + window, n))]


def retrieval_pairs(descs, k: int = 8,
                    exclude: Optional[set] = None) -> List[Tuple[int, int]]:
    """Image-retrieval pair augmentation: top-``k`` most similar images per
    image by pooled-descriptor similarity (one (V,V) MXU matmul).

    A windowed pair list on a sequential capture never connects temporally
    distant views of the same place, so loop closures — the constraints
    that bound odometry drift — are lost; exhaustive pairing (the
    reference's default) recovers them at O(V^2) matching cost.  Retrieval
    recovers them at O(V^2) DOT PRODUCTS instead (one matmul of pooled
    descriptors — microseconds on the MXU), the vocab-tree practice of
    large-scale SfM.  The pooled descriptor is the L2-normalized mean of an
    image's LIOP descriptors (non-negative histograms, so the mean is a
    meaningful bag-of-features signature).

    Deterministic given features: every process of a sharded run computes
    the identical list."""
    data = jnp.asarray(descs.data)                      # (V, N, D)
    m = jnp.asarray(descs.mask)[..., None].astype(data.dtype)
    pooled = (data * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    pooled = pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    sim = pooled @ pooled.T                             # (V, V)
    V = sim.shape[0]
    sim = sim - 2.0 * jnp.eye(V, dtype=sim.dtype)       # no self-pairs
    _, nbr = jax.lax.top_k(sim, min(k, V - 1))
    nbr = np.asarray(nbr)
    out = set()
    for i in range(V):
        for j in nbr[i]:
            pr = (i, int(j)) if i < int(j) else (int(j), i)
            if exclude is None or pr not in exclude:
                out.add(pr)
    return sorted(out)


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


def best_validated_pairs(matches_dir: str, kind: str = "f",
                         limit: int = 0) -> List[Dict]:
    """Pairs ranked by geometrically-validated match count — the list the
    reference's triangulation dialog shows for initial-pair selection
    (``OpenMVGHelper::getBestValidatedPairs``,
    src/utils/OpenMVGHelper.cpp:273-419).

    Returns dicts with (i, j, geometric, putative, survival) sorted by
    geometric count descending."""
    geo = load_matches_txt(os.path.join(matches_dir, f"matches.{kind}.txt"))
    put_path = os.path.join(matches_dir, "matches.putative.txt")
    put = load_matches_txt(put_path) if os.path.exists(put_path) else {}
    rows = []
    for (i, j), m in geo.items():
        n_put = len(put.get((i, j), m))
        rows.append({
            "i": int(i), "j": int(j),
            "geometric": int(len(m)),
            "putative": int(n_put),
            "survival": float(len(m)) / max(n_put, 1),
        })
    rows.sort(key=lambda r: -r["geometric"])
    return rows[:limit] if limit else rows


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


def _mesh_size(mesh) -> int:
    return 1 if mesh is None else int(np.prod(list(mesh.shape.values())))


def _match_block(desc, mask, parr, cfg: MatchConfig, use_pallas: bool,
                 tile_m, tile_n, bf16: bool, mesh, axis: str):
    """One pair-block dispatch, optionally SPMD over the ``pairs`` axis.

    With a mesh, the pair block is sharded with ``shard_map`` (descriptors
    replicated, pairs split): each chip matches its slice of the pair space
    with zero collectives — the TPU counterpart of the reference's OpenMP
    loop over pairs (src/R3DComputeMatches.cpp:877-899)."""
    def run(d, mk, pr):
        idx, d1, ok = match_mod.match_pair_block(
            d, mk, pr, cfg.ratio, use_pallas, tile_m, tile_n, bf16)
        if cfg.mutual:
            rev = jnp.stack([pr[:, 1], pr[:, 0]], -1)
            idx_b, _, ok_b = match_mod.match_pair_block(
                d, mk, rev, cfg.ratio, use_pallas, tile_m, tile_n, bf16)
            ok = jax.vmap(match_mod.mutual_filter)(idx, ok, idx_b, ok_b)
        return idx, ok

    if mesh is None:
        return run(desc, mask, parr)
    from jax.sharding import PartitionSpec as P
    sm = jax.shard_map(run, mesh=mesh,
                       in_specs=(P(), P(), P(axis, None)),
                       out_specs=(P(axis, None), P(axis, None)))
    return jax.jit(sm)(desc, mask, parr)


def match_all_pairs(kps, descs, cfg: MatchConfig,
                    pairs: Optional[List[Tuple[int, int]]] = None,
                    progress=None, mesh=None,
                    axis: str = "pairs") -> Dict[Tuple[int, int], np.ndarray]:
    """Putative matching for every pair: fused distance + top-2 + ratio.
    kps/descs: padded (B, N, ...) arrays from ``features.load_all_padded``.
    With ``mesh``, pair blocks shard across devices (P2 parallelism)."""
    B, N, D = descs.data.shape
    if pairs is None:
        pairs = exhaustive_pairs(B)

    use_pallas = (jax.default_backend() == "tpu"
                  and N % 256 == 0 and D % 128 == 0)
    knobs = matcher_knobs(cfg.matcher)
    bf16 = knobs["bf16"]
    tile_m, tile_n = match_mod._auto_tiles(N, N)

    out = {}
    # fixed-size pair blocks: one device dispatch per block (P2 pair-block
    # parallelism; kills per-pair dispatch overhead at many-image scale)
    BLOCK = 64 * _mesh_size(mesh)   # 64 pairs/dispatch amortizes launch
                                    # latency into the prefetch kernel
    total = len(pairs)
    padded = pairs + [pairs[-1]] * ((-len(pairs)) % BLOCK)
    for start in range(0, len(padded), BLOCK):
        chunk = padded[start:start + BLOCK]
        parr = jnp.asarray(np.asarray(chunk, np.int32))
        idx, ok = _match_block(descs.data, descs.mask, parr, cfg,
                               use_pallas, tile_m, tile_n, bf16, mesh, axis)
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


def e_overlap_keep(num_geometric: int, num_putative: int,
                   cfg: MatchConfig) -> bool:
    """E-matrix overlap prune (src/R3DComputeMatches.cpp:2177-2186): the
    reference drops a pair when ``count < 50 || count/putative < 0.3`` —
    keeping requires BOTH an absolute and a relative survival bound."""
    return (num_geometric >= cfg.e_min_matches
            and num_geometric >= cfg.e_min_survival * num_putative)


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
                     progress=None, mesh=None,
                     axis: str = "pairs") -> FilterResult:
    """ACRANSAC F -> E (+overlap prune) -> H over pair blocks
    (src/R3DComputeMatches.cpp:2086-2233).

    Pairs are bucketed by padded match capacity and each bucket is filtered
    in vmapped blocks — F/E/H for a whole block is ONE device dispatch
    (vs the reference's per-pair OpenMP loop). With ``mesh``, block inputs
    are placed with a ``pairs``-axis NamedSharding so XLA splits the batch
    across chips (the filters are embarrassingly parallel per pair)."""
    key = jax.random.PRNGKey(seed)
    xy = np.asarray(kps.xy)
    out_f, out_e, out_h = {}, {}, {}

    items = [(pr, m) for pr, m in sorted(putative.items()) if len(m) >= 16]
    buckets: Dict[int, list] = {}
    for pr, m in items:
        cap = max(64, 1 << int(np.ceil(np.log2(len(m)))))
        buckets.setdefault(cap, []).append((pr, m))

    n_dev = _mesh_size(mesh)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P(axis))

    max_err_f = np.float32(cfg.max_err_px ** 2)
    n_done, n_total = 0, len(items)
    for cap, blist in sorted(buckets.items()):
        # block size bounded by the live residual-tensor budget; the
        # ransac core chunks its hypothesis sweep (lax.scan, 128 draws a
        # step), so the bound uses the CHUNKED iteration count.  The live
        # set per chunk is block*chunk*models*cap f32 elements TIMES the
        # Sampson-error temporaries XLA keeps (~4); the 5-pt essential
        # solver emits up to 10 models per draw, so the 2^24-element
        # budget on block*chunk*cap corresponds to ~2.7GB of HBM
        # (the earlier 2^26 budget ignored the model/temp factors and a
        # cap-2048 block compiled to a 25GB allocation — HBM OOM)
        chunked_iters = min(cfg.ransac_iters, 128)
        block = max(1, min(128, (1 << 24) // max(chunked_iters * cap, 1)))
        block = ((block + n_dev - 1) // n_dev) * n_dev
        for s0 in range(0, len(blist), block):
            group = blist[s0:s0 + block]
            Pn = len(group)
            x1 = np.zeros((block, cap, 2), np.float32)
            x2 = np.zeros((block, cap, 2), np.float32)
            x1n = np.zeros((block, cap, 2), np.float32)
            x2n = np.zeros((block, cap, 2), np.float32)
            maskb = np.zeros((block, cap), bool)
            la_f = np.zeros((block,), np.float32)
            la_h = np.zeros((block,), np.float32)
            la_e = np.zeros((block,), np.float32)
            me_f = np.full((block,), max_err_f, np.float32)
            me_e = np.full((block,), max_err_f, np.float32)
            has_e = np.zeros((block,), bool)
            for bi, ((i, j), m) in enumerate(group):
                n = len(m)
                p1 = xy[i][m[:, 0]]
                p2 = xy[j][m[:, 1]]
                x1[bi, :n] = p1
                x2[bi, :n] = p2
                maskb[bi, :n] = True
                w = float(max(image_sizes[i][0], image_sizes[j][0]))
                h = float(max(image_sizes[i][1], image_sizes[j][1]))
                la_f[bi] = ransac._logalpha0_line(w, h)
                la_h[bi] = ransac._logalpha0_point(w, h)
                if focals is not None and focals[i] > 0 and focals[j] > 0:
                    has_e[bi] = True
                    x1n[bi, :n] = (p1 - image_sizes[i] / 2.0) / focals[i]
                    x2n[bi, :n] = (p2 - image_sizes[j] / 2.0) / focals[j]
                    fmean = float(np.sqrt(focals[i] * focals[j]))
                    # image-geometry alpha0 in normalized units (OpenMVG's
                    # essential ACRANSAC scores distances in pixels)
                    diag = np.sqrt(w * w + h * h)
                    la_e[bi] = np.log10(2.0 * diag / (w * h) * fmean)
                    me_e[bi] = (cfg.max_err_px / fmean) ** 2
            mask_e = maskb & has_e[:, None]

            # per-PAIR keys derived from the pair identity, not the block
            # position: results are invariant to block composition, so a
            # pair list sharded across N processes (r3d launch) filters
            # bit-identically to the single-process run.  Two chained
            # fold_ins (i, then j) — collision-free at any view count,
            # unlike a single 32-bit affine hash
            pair_i = np.zeros((block,), np.uint32)
            pair_j = np.zeros((block,), np.uint32)
            for bi, ((i, j), _m) in enumerate(group):
                pair_i[bi] = i
                pair_j[bi] = j
            base = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                key, jnp.asarray(pair_i))
            base = jax.vmap(jax.random.fold_in)(base, jnp.asarray(pair_j))
            kf = jax.vmap(lambda k: jax.random.fold_in(k, 0))(base)
            ke = jax.vmap(lambda k: jax.random.fold_in(k, 1))(base)
            kh = jax.vmap(lambda k: jax.random.fold_in(k, 2))(base)

            def put(a):
                a = jnp.asarray(a)
                return jax.device_put(a, shard) if shard is not None else a

            rf = ransac.acransac_f_batch(
                put(kf), put(x1), put(x2), put(maskb), put(la_f), put(me_f),
                iters=cfg.ransac_iters)
            re = None
            if has_e.any():
                re = ransac.acransac_e_batch(
                    put(ke), put(x1n), put(x2n), put(mask_e), put(la_e),
                    put(me_e), iters=cfg.ransac_iters)
            rh = None
            if cfg.compute_homography:
                rh = ransac.acransac_h_batch(
                    put(kh), put(x1), put(x2), put(maskb), put(la_h),
                    put(me_f), iters=cfg.ransac_iters)

            f_valid = np.asarray(rf.valid)
            f_inl = np.asarray(rf.inliers)
            e_valid = np.asarray(re.valid) if re is not None else None
            e_inl = np.asarray(re.inliers) if re is not None else None
            h_valid = np.asarray(rh.valid) if rh is not None else None
            h_inl = np.asarray(rh.inliers) if rh is not None else None
            for bi, ((i, j), m) in enumerate(group):
                n = len(m)
                if f_valid[bi]:
                    out_f[(i, j)] = m[f_inl[bi][:n]]
                if e_valid is not None and has_e[bi] and e_valid[bi]:
                    inl = e_inl[bi][:n]
                    if e_overlap_keep(int(inl.sum()), n, cfg):
                        out_e[(i, j)] = m[inl]
                if h_valid is not None and h_valid[bi]:
                    out_h[(i, j)] = m[h_inl[bi][:n]]
            n_done += Pn
            if progress:
                progress(n_done, n_total)

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


def _job_token() -> str:
    """Unique-per-launch token (the coordinator address) so sync markers
    from a previous run of the same step dir can never satisfy a wait."""
    return os.environ.get("R3D_COORDINATOR", "local")


def _write_marker(path: str):
    with open(path, "w") as fh:
        fh.write(_job_token())


def _wait_for_marker(path: str, timeout_s: float = 3600.0):
    t0 = time.time()
    while True:
        try:
            with open(path) as fh:
                if fh.read().strip() == _job_token():
                    return
        except OSError:
            pass
        if time.time() - t0 > timeout_s:
            raise TimeoutError(f"timed out waiting for {path}")
        time.sleep(0.5)


def run_compute_matches(images: Sequence[np.ndarray], out_dir: str,
                        threshold: float = 0.0007,
                        cfg: MatchConfig = MatchConfig(),
                        focals: Optional[np.ndarray] = None,
                        max_keypoints: int = 4096,
                        force: bool = False,
                        image_names: Optional[Sequence[str]] = None,
                        detector: str = "fast-akaze",
                        progress=None, mesh=None,
                        proc_id: int = 0, proc_count: int = 1,
                        pairs: Optional[List[Tuple[int, int]]] = None,
                        retrieval_k: int = 0,
                        release_memory: bool = False) -> Dict:
    """Full compute-matches step on a list of gray images. Returns stats.

    With several devices visible, matching and geometric filtering shard
    pair blocks over a 1-D ``pairs`` mesh automatically.

    With ``proc_count > 1`` (``r3d launch -n N -- matches``) the PAIR LIST
    is round-robin-sharded across processes (the N-host form of the
    reference's OpenMP pair loop, src/R3DComputeMatches.cpp:877-899 — P2
    in SURVEY.md §2.3): the primary extracts features (shared via the
    on-disk cache), every process matches+filters its own pair shard and
    writes ``matches.*.part{pid}.txt``, and the primary merges the parts
    into the standard artifacts.  Synchronization is file-based (same
    filesystem), matching the step-directory contract."""
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    if mesh is None and len(jax.local_devices()) > 1:
        # local devices only (results are host-fetched; see features.py)
        from regard3d_tpu.dist import mesh as mesh_mod
        mesh = mesh_mod.make_mesh("pairs", devices=jax.local_devices())
    sizes0 = np.asarray([[im.shape[1], im.shape[0]] for im in images])
    if proc_id == 0 and proc_count > 1:
        # clear stale sync markers from a previous run of this step dir
        for fn in os.listdir(out_dir):
            if (fn.startswith((".part", ".feat")) and fn.endswith(".done")):
                os.remove(os.path.join(out_dir, fn))
        _write_marker(os.path.join(out_dir, ".stage_ready"))
    if proc_count == 1:
        write_stage_sfm_data(out_dir, sizes0, focals, image_names)
        counts = feat_mod.extract_features(images, out_dir, threshold,
                                           max_keypoints, force=force,
                                           detector=detector,
                                           progress=progress)
    else:
        # P1 cross-PROCESS image sharding (the reference's nCPU+1 worker
        # pool over images, src/threads/R3DFeaturesThread.cpp:58-77, lifted
        # to processes): every process extracts its round-robin image
        # shard into the shared cache dir, then a marker-file barrier.
        # Detection is deterministic per image, so the resulting
        # .feat/.desc files are byte-identical to a single-process run
        # (tests/test_multihost.py feature-equivalence gate).
        if proc_id == 0:
            write_stage_sfm_data(out_dir, sizes0, focals, image_names)
        else:
            _wait_for_marker(os.path.join(out_dir, ".stage_ready"))
        my_imgs = list(range(proc_id, len(images), proc_count))
        feat_mod.extract_features(images, out_dir, threshold,
                                  max_keypoints, force=force,
                                  detector=detector,
                                  progress=progress, subset=my_imgs)
        _write_marker(os.path.join(out_dir, f".feat{proc_id}.done"))
        for p in range(proc_count):
            _wait_for_marker(os.path.join(out_dir, f".feat{p}.done"))
        counts = feat_mod.load_counts(out_dir, len(images))
    kps, descs = feat_mod.load_all_padded(out_dir, len(images), pad_to=256)
    n_retrieval = 0
    if retrieval_k and pairs is not None:
        # augment a pruned (windowed) pair list with retrieval loop-closure
        # pairs — deterministic from the cached features, so every process
        # of a sharded run derives the identical list
        base = set(pairs)
        extra = retrieval_pairs(descs, retrieval_k, exclude=base)
        n_retrieval = len(extra)
        pairs = sorted(base | set(extra))
    my_pairs = pairs
    if proc_count > 1:
        all_pairs = (pairs if pairs is not None
                     else exhaustive_pairs(len(images)))
        my_pairs = all_pairs[proc_id::proc_count]
    putative = match_all_pairs(kps, descs, cfg, pairs=my_pairs,
                               progress=progress, mesh=mesh)
    if release_memory:
        # detector+matcher executables are dead weight for the RANSAC
        # filters (disjoint programs); at many-image scale the compiled-
        # program caches dominate host RSS (~1.6 GB after matching a
        # 200-view set) and the peak lands inside the filter phase.  Large
        # one-shot runs (bench_scale) opt in; small interactive runs keep
        # the caches warm for reruns.
        from regard3d_tpu import runtime as _rt
        _rt.release_stage_memory()
    image_sizes = np.asarray([[im.shape[1], im.shape[0]] for im in images])
    filt = geometric_filter(kps, putative, image_sizes, focals, cfg,
                            progress=progress, mesh=mesh)

    if proc_count > 1:
        # write this process' shard, then the primary merges all shards
        for tag, d in (("putative", putative), ("f", filt.f),
                       ("e", filt.e), ("h", filt.h)):
            save_matches_txt(
                os.path.join(out_dir, f"matches.{tag}.part{proc_id}.txt"), d)
        _write_marker(os.path.join(out_dir, f".part{proc_id}.done"))
        if proc_id != 0:
            return {"role": f"secondary {proc_id}/{proc_count}",
                    "pairs_matched": len(putative)}
        merged = {}
        for tag in ("putative", "f", "e", "h"):
            d = {}
            for p in range(proc_count):
                _wait_for_marker(os.path.join(out_dir, f".part{p}.done"))
                d.update(load_matches_txt(
                    os.path.join(out_dir, f"matches.{tag}.part{p}.txt")))
            merged[tag] = d
        putative = merged["putative"]
        filt = FilterResult(
            merged["f"], merged["e"], merged["h"],
            {"pairs_putative": len(merged["putative"]),
             "pairs_f": len(merged["f"]),
             "pairs_e": len(merged["e"]),
             "pairs_h": len(merged["h"]),
             **{f"matches_{t}": int(sum(len(m) for m in
                                        (merged[t] if t != "putative"
                                         else putative).values()))
                for t in ("putative", "f", "e", "h")}})

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
    if n_retrieval:
        stats["pairs_retrieval"] = n_retrieval
    stats["elapsed_s"] = time.time() - t0

    # per-pair match tables (src/R3DComputeMatches.cpp:2066-2076 parity)
    from regard3d_tpu.pipeline.report import write_matches_report
    pair_rows = [{"i": int(i), "j": int(j),
                  "putative": int(len(putative.get((i, j), ()))),
                  "geometric": int(len(m)),
                  "survival": (len(m)
                               / max(len(putative.get((i, j), ())), 1))}
                 for (i, j), m in sorted(filt.f.items(),
                                         key=lambda kv: -len(kv[1]))]
    write_matches_report(
        os.path.join(out_dir, "Matching_Report.html"),
        {k: v for k, v in stats.items() if isinstance(v, (int, float, str))},
        pair_rows, keypoint_counts=counts, image_names=image_names)
    return stats
