"""Feature-extraction stage driver.

Replaces ``R3DFeaturesThread``'s worker pool (src/threads/R3DFeaturesThread.
cpp:58-77: nCPU+1 threads pulling a filename queue) with **batched device
execution**: images are bucketed by padded shape (P1 image-batch data
parallelism of SURVEY.md §2.3), each bucket runs detection+description as
one jitted program.

Artifact contract per image (cache + resume parity, SURVEY.md §A.4 and
src/threads/R3DFeaturesThread.cpp:139,198-200):
* ``imageXXXXXX.feat`` — text, one keypoint per line: ``x y scale
  orientation`` (OpenMVG SIOPointFeature format);
* ``imageXXXXXX.desc`` — binary: uint64 count + float32[count, 144];
* existing files are reused unless ``force``.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Descriptors, Keypoints
from regard3d_tpu.ingest import image_io
from regard3d_tpu.kernels import corners, detect, liop
from regard3d_tpu.kernels.scale_space import ScaleSpaceConfig

LIOP_DIM = liop.LIOP_DIM

# GUI presets (src/gui/Regard3DComputeMatchesDialog.cpp:96-128)
SENSITIVITY_PRESETS = {
    "minimal": 0.001, "normal": 0.0007, "high": 0.0005, "ultra": 0.0001,
}

# Detector menu (Regard3DFeatures::detectKeypoints dispatch,
# src/Regard3DFeatures.cpp:574-683). "akaze"/"fast-akaze" are the shipped
# GUI entries (src/res/Regard3dMainFrameBase.fbp:9172); the rest are the
# experimental code paths behind the same dispatch. Device detectors run
# batched under jit; host detectors are native component-tree algorithms.
DEVICE_DETECTORS = ("akaze", "fast-akaze", "gftt", "orb", "brisk")
HOST_DETECTORS = ("mser", "tbmr")
DETECTORS = DEVICE_DETECTORS + HOST_DETECTORS

_DETECTOR_ALIASES = {
    "classic-a-kaze": "akaze", "classic-akaze": "akaze",
    "fast-a-kaze": "fast-akaze", "fastakaze": "fast-akaze",
}
# kpSizeFactor table keys (src/Regard3DFeatures.cpp:691-717)
_FACTOR_KEYS = {"akaze": "AKAZE", "fast-akaze": "Fast-AKAZE", "mser": "MSER",
                "orb": "ORB", "brisk": "BRISK", "gftt": "GFTT",
                "tbmr": "TBMR"}


def canonical_detector(name: str) -> str:
    n = name.strip().lower().replace("_", "-").replace(" ", "-")
    n = _DETECTOR_ALIASES.get(n, n)
    if n not in DETECTORS:
        raise ValueError(f"unknown detector {name!r}; choose from {DETECTORS}")
    return n


def detector_kp_size_factor(detector: str) -> float:
    return liop.KP_SIZE_FACTORS[_FACTOR_KEYS[canonical_detector(detector)]]


def _detect_host(img: np.ndarray, detector: str,
                 max_keypoints: int) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray, np.ndarray]:
    """MSER / TBMR via the native component-tree runtime. img: (H, W) float
    in [0,1]. Returns (xy, size, angle, score) numpy arrays (<= max_kp)."""
    from regard3d_tpu import native
    g8 = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    if detector == "mser":
        rows = native.mser(g8)
        if rows is None:
            raise RuntimeError("MSER requires the native library "
                               "(native/build.sh)")
        xy = rows[:, :2]
        size = rows[:, 2]
        angle = np.full(len(rows), corners.CV_UNDEFINED_ANGLE, np.float32)
        score = rows[:, 3]
    else:  # tbmr
        rows = native.tbmr(g8)
        if rows is None:
            raise RuntimeError("TBMR requires the native library "
                               "(native/build.sh)")
        xy = rows[:, :2]
        # reference keypoint size = sqrt(l1^2 + l2^2)
        # (src/Regard3DFeatures.cpp:633-637)
        size = np.sqrt(rows[:, 2] ** 2 + rows[:, 3] ** 2)
        angle = rows[:, 4] - np.pi / 2.0     # cv-angle -> internal convention
        score = rows[:, 5]
    if len(xy) > max_keypoints:
        order = np.argsort(-score)[:max_keypoints]
        xy, size, angle, score = xy[order], size[order], angle[order], \
            score[order]
    return (xy.astype(np.float32), size.astype(np.float32),
            angle.astype(np.float32), score.astype(np.float32))


def feat_path(out_dir: str, index: int) -> str:
    return os.path.join(out_dir, f"image{index:06d}.feat")


def desc_path(out_dir: str, index: int) -> str:
    return os.path.join(out_dir, f"image{index:06d}.desc")


def save_features(out_dir: str, index: int, xy: np.ndarray, scale: np.ndarray,
                  angle: np.ndarray, desc: np.ndarray):
    with open(feat_path(out_dir, index), "w") as f:
        for k in range(len(xy)):
            f.write(f"{xy[k,0]:.6g} {xy[k,1]:.6g} {scale[k]:.6g} "
                    f"{angle[k]:.6g}\n")
    with open(desc_path(out_dir, index), "wb") as f:
        f.write(struct.pack("<Q", len(desc)))
        f.write(np.ascontiguousarray(desc[:, :LIOP_DIM],
                                     np.float32).tobytes())


def load_features(out_dir: str, index: int) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray, np.ndarray]:
    """Returns (xy (N,2), scale (N,), angle (N,), desc (N,144))."""
    from regard3d_tpu import native
    feats = native.parse_feats(feat_path(out_dir, index))
    if feats is None:
        feats = np.loadtxt(feat_path(out_dir, index), ndmin=2,
                           dtype=np.float32)
    if feats.size == 0:
        feats = np.zeros((0, 4), np.float32)
    with open(desc_path(out_dir, index), "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        desc = np.frombuffer(f.read(n * LIOP_DIM * 4), np.float32)
        desc = desc.reshape(n, LIOP_DIM).copy()
    return feats[:, :2], feats[:, 2], feats[:, 3], desc


def has_features(out_dir: str, index: int) -> bool:
    return (os.path.exists(feat_path(out_dir, index))
            and os.path.exists(desc_path(out_dir, index)))


def load_counts(out_dir: str, num_images: int) -> List[int]:
    """Keypoint counts from the .desc headers (cheap, no payload read)."""
    out = []
    for i in range(num_images):
        with open(desc_path(out_dir, i), "rb") as f:
            out.append(int(struct.unpack("<Q", f.read(8))[0]))
    return out


def extract_features(images: Sequence[np.ndarray], out_dir: str,
                     threshold: float = 0.0007,
                     max_keypoints: int = 4096,
                     kp_size_factor: Optional[float] = None,
                     force: bool = False,
                     detector: str = "fast-akaze",
                     progress=None, mesh=None,
                     subset: Optional[Sequence[int]] = None) -> List[int]:
    """Detect + describe every image; write artifacts; return keypoint
    counts. Cached images are skipped (resume semantics).

    With several devices visible, image buckets shard their batch dimension
    over an ``images`` mesh axis (P1 image-batch data parallelism,
    SURVEY.md §2.3 — the TPU replacement for the reference's nCPU+1 worker
    pool, src/threads/R3DFeaturesThread.cpp:58-77).

    ``subset``: only these image indices are processed/counted (the
    cross-process image shard of ``r3d launch``; counts for other images
    are 0 — merge with ``load_counts`` after the barrier).  Detection is
    deterministic per image (batch composition never changes a result), so
    any shard partition writes byte-identical artifacts."""
    os.makedirs(out_dir, exist_ok=True)
    detector = canonical_detector(detector)
    if kp_size_factor is None:
        kp_size_factor = detector_kp_size_factor(detector)
    if mesh is None and len(jax.local_devices()) > 1:
        # local devices only: results are fetched to THIS host with
        # np.asarray, so the auto-mesh must never span processes (multi-
        # process runs shard work at the pipeline layer instead)
        from regard3d_tpu.dist import mesh as mesh_mod
        mesh = mesh_mod.make_mesh("images", devices=jax.local_devices())
    my_images = (range(len(images)) if subset is None else subset)
    todo = [i for i in my_images if force or not has_features(out_dir, i)]
    counts = [0] * len(images)

    cfg = ScaleSpaceConfig(dthreshold=threshold)
    if todo:
        buckets = image_io.bucket_images([images[i] for i in todo])

        @jax.jit
        def run_bucket(data, widths, heights):
            if detector in ("akaze", "fast-akaze"):
                # both GUI entries share the scale-space detector (only the
                # threshold differs in the reference,
                # src/Regard3DFeatures.cpp:578-614)
                kps = detect.detect_akaze(data, widths, heights, cfg,
                                          max_keypoints)
            elif detector == "gftt":
                kps = corners.detect_gftt(data, widths, heights,
                                          max_keypoints)
            elif detector == "orb":
                kps = corners.detect_orb(data, widths, heights,
                                         max_keypoints)
            elif detector == "brisk":
                kps = corners.detect_brisk(data, widths, heights,
                                           max_keypoints)
            else:
                raise AssertionError(detector)
            descs = liop.describe_liop(data, kps, kp_size_factor)
            return kps, descs

        @jax.jit
        def describe_bucket(data, xy, size, angle, mask):
            kps = Keypoints(xy=xy, scale=size, angle=angle,
                            score=jnp.zeros_like(size), mask=mask)
            return kps, liop.describe_liop(data, kps, kp_size_factor)

        def run_host_bucket(b):
            """Host component-tree detection + device LIOP description."""
            B = b.data.shape[0]
            K = max_keypoints
            xy = np.zeros((B, K, 2), np.float32)
            size = np.zeros((B, K), np.float32)
            angle = np.zeros((B, K), np.float32)
            mask = np.zeros((B, K), bool)
            for bi in range(B):
                w, h = b.true_sizes[bi]
                p, s, a, _ = _detect_host(b.data[bi, :h, :w], detector, K)
                n = len(p)
                xy[bi, :n] = p
                size[bi, :n] = s
                angle[bi, :n] = a
                mask[bi, :n] = True
            return describe_bucket(jnp.asarray(b.data), jnp.asarray(xy),
                                   jnp.asarray(size), jnp.asarray(angle),
                                   jnp.asarray(mask))

        def shard_batch(data, widths, heights):
            """Pad the batch dim to the mesh size and shard it over the
            ``images`` axis; returns device arrays (or plain host arrays in
            single-device mode)."""
            if mesh is None:
                return (jnp.asarray(data), jnp.asarray(widths),
                        jnp.asarray(heights))
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = mesh.devices.size
            B = data.shape[0]
            pad = (-B) % n_dev
            if pad:
                data = np.concatenate(
                    [data, np.zeros((pad,) + data.shape[1:], data.dtype)])
                widths = np.concatenate([widths, np.ones(pad, widths.dtype)])
                heights = np.concatenate(
                    [heights, np.ones(pad, heights.dtype)])
            axis = mesh.axis_names[0]
            sh = NamedSharding(mesh, P(axis))
            return (jax.device_put(jnp.asarray(data), sh),
                    jax.device_put(jnp.asarray(widths), sh),
                    jax.device_put(jnp.asarray(heights), sh))

        done = 0
        for b in buckets:
            if detector in HOST_DETECTORS:
                kps, descs = run_host_bucket(b)
            else:
                data, widths, heights = shard_batch(
                    b.data, b.true_sizes[:, 0], b.true_sizes[:, 1])
                kps, descs = run_bucket(data, widths, heights)
            kps_np = jax.tree_util.tree_map(np.asarray, kps)
            d_np = np.asarray(descs.data)
            for bi, orig_local in enumerate(b.indices):
                # b.indices index into the `todo`-subset list
                img_index = todo[orig_local]
                m = kps_np.mask[bi]
                save_features(out_dir, img_index, kps_np.xy[bi][m],
                              kps_np.scale[bi][m], kps_np.angle[bi][m],
                              d_np[bi][m])
                done += 1
                if progress:
                    progress(done, len(todo))

    for i in my_images:
        with open(desc_path(out_dir, i), "rb") as f:
            counts[i] = int(struct.unpack("<Q", f.read(8))[0])
    return counts


def load_all_padded(out_dir: str, num_images: int, pad_to: int = 0,
                    padded_dim: int = liop.PADDED_DIM):
    """Regions_Provider equivalent: load every image's features into padded
    device arrays. Returns (Keypoints, Descriptors) with batch=num_images."""
    # two passes so per-image features are never all resident at once:
    # counts first (cheap .desc header reads), then stream each image
    # straight into the padded arrays (host RSS = padded arrays only)
    counts = np.zeros(num_images, np.int64)
    for i in range(num_images):
        with open(desc_path(out_dir, i), "rb") as f:
            counts[i] = struct.unpack("<Q", f.read(8))[0]
    n_max = max(int(counts.max()) if num_images else 1, 1)
    if pad_to:
        n_max = ((n_max + pad_to - 1) // pad_to) * pad_to
    B = num_images
    xy = np.zeros((B, n_max, 2), np.float32)
    scale = np.zeros((B, n_max), np.float32)
    angle = np.zeros((B, n_max), np.float32)
    desc = np.zeros((B, n_max, padded_dim), np.float32)
    mask = np.zeros((B, n_max), bool)
    for i in range(num_images):
        p, s, a, d = load_features(out_dir, i)
        n = len(p)
        xy[i, :n] = p
        scale[i, :n] = s
        angle[i, :n] = a
        desc[i, :n, :LIOP_DIM] = d
        mask[i, :n] = True
    kps = Keypoints(xy=jnp.asarray(xy), scale=jnp.asarray(scale),
                    angle=jnp.asarray(angle),
                    score=jnp.zeros((B, n_max), jnp.float32),
                    mask=jnp.asarray(mask))
    descs = Descriptors(data=jnp.asarray(desc), mask=jnp.asarray(mask))
    return kps, descs
