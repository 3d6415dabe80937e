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
from regard3d_tpu.kernels import detect, liop
from regard3d_tpu.kernels.scale_space import ScaleSpaceConfig

LIOP_DIM = liop.LIOP_DIM

# GUI presets (src/gui/Regard3DComputeMatchesDialog.cpp:96-128)
SENSITIVITY_PRESETS = {
    "minimal": 0.001, "normal": 0.0007, "high": 0.0005, "ultra": 0.0001,
}


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


def extract_features(images: Sequence[np.ndarray], out_dir: str,
                     threshold: float = 0.0007,
                     max_keypoints: int = 4096,
                     kp_size_factor: float = 8.0,
                     force: bool = False,
                     progress=None) -> List[int]:
    """Detect + describe every image; write artifacts; return keypoint
    counts. Cached images are skipped (resume semantics)."""
    os.makedirs(out_dir, exist_ok=True)
    todo = [i for i in range(len(images))
            if force or not has_features(out_dir, i)]
    counts = [0] * len(images)

    cfg = ScaleSpaceConfig(dthreshold=threshold)
    if todo:
        buckets = image_io.bucket_images([images[i] for i in todo])

        @jax.jit
        def run_bucket(data, widths, heights):
            kps = detect.detect_akaze(data, widths, heights, cfg,
                                      max_keypoints)
            descs = liop.describe_liop(data, kps, kp_size_factor)
            return kps, descs

        done = 0
        for b in buckets:
            kps, descs = run_bucket(jnp.asarray(b.data),
                                    jnp.asarray(b.true_sizes[:, 0]),
                                    jnp.asarray(b.true_sizes[:, 1]))
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

    for i in range(len(images)):
        xy, _, _, _ = load_features(out_dir, i)
        counts[i] = len(xy)
    return counts


def load_all_padded(out_dir: str, num_images: int, pad_to: int = 0,
                    padded_dim: int = liop.PADDED_DIM):
    """Regions_Provider equivalent: load every image's features into padded
    device arrays. Returns (Keypoints, Descriptors) with batch=num_images."""
    data = [load_features(out_dir, i) for i in range(num_images)]
    n_max = max((len(d[0]) for d in data), default=1)
    if pad_to:
        n_max = max(n_max, 1)
        n_max = ((n_max + pad_to - 1) // pad_to) * pad_to
    B = num_images
    xy = np.zeros((B, n_max, 2), np.float32)
    scale = np.zeros((B, n_max), np.float32)
    angle = np.zeros((B, n_max), np.float32)
    desc = np.zeros((B, n_max, padded_dim), np.float32)
    mask = np.zeros((B, n_max), bool)
    for i, (p, s, a, d) in enumerate(data):
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
