"""Core scene containers — the TPU-native equivalent of OpenMVG's ``SfM_Data``.

The reference keeps a map-of-objects scene (views / intrinsics / poses /
landmarks, see SURVEY.md §2.3; used at ``src/R3DProject.cpp:1118-1308`` and
``src/threads/R3DTriangulationThread.cpp:403``).  A TPU-native design instead
uses **struct-of-arrays pytrees with static shapes and validity masks**, so
the whole scene can live on device, be sharded over a mesh, and flow through
``jit`` without dynamic shapes.

Conventions
-----------
* Pose: world→camera, ``x_cam = R @ (X - C)`` (OpenMVG convention).
* Intrinsics are stored as a padded parameter row per intrinsic group:
  ``[f, cx, cy, d0 .. d5]`` with a model code selecting interpretation
  (the 5 camera models of the reference, ``src/R3DProject.cpp:1167-1191``).
* Observations (2D measurements of landmarks) are a flat table — the
  device-friendly form of OpenMVG's ``Landmark::obs`` map.
* All arrays carry a leading static capacity; ``*_mask`` marks live rows.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# --- camera model codes (parity with the reference's 5-model menu) ----------
PINHOLE = 0          # "Pinhole"           src/R3DProject.cpp:1169
RADIAL_K1 = 1        # "Radial 1"          :1172
RADIAL_K3 = 2        # "Radial 3"          :1175 (default, and unknown-camera fallback)
BROWN_T2 = 3         # "Brown 2"           :1181
FISHEYE = 4          # "Fisheye"           :1184

CAMERA_MODEL_NAMES = {
    PINHOLE: "pinhole",
    RADIAL_K1: "radial_k1",
    RADIAL_K3: "radial_k3",
    BROWN_T2: "brown_t2",
    FISHEYE: "fisheye",
}
CAMERA_MODEL_CODES = {v: k for k, v in CAMERA_MODEL_NAMES.items()}

# number of distortion parameters actually used per model
DISTO_NPARAMS = {PINHOLE: 0, RADIAL_K1: 1, RADIAL_K3: 3, BROWN_T2: 5, FISHEYE: 4}

NUM_INTRINSIC_PARAMS = 9  # f, cx, cy, d0..d5 (padded)


@struct.dataclass
class Views:
    """Per-image metadata. Row i == view id i (dense ids, as the reference
    assigns sequential ids in ``writeSfmData``, src/R3DProject.cpp:1125-1245)."""

    width: jnp.ndarray          # (V,) int32
    height: jnp.ndarray         # (V,) int32
    intrinsic_id: jnp.ndarray   # (V,) int32 — index into Intrinsics
    pose_id: jnp.ndarray        # (V,) int32 — index into Poses (== view id here)
    mask: jnp.ndarray           # (V,) bool — live view

    @property
    def capacity(self) -> int:
        return self.width.shape[0]


@struct.dataclass
class Intrinsics:
    """Shared-camera intrinsic groups (grouping-by-hash parity:
    src/R3DProject.cpp:1247-1295)."""

    model: jnp.ndarray    # (K,) int32 — camera model code
    params: jnp.ndarray   # (K, 9) float — [f, cx, cy, d0..d5]
    width: jnp.ndarray    # (K,) int32
    height: jnp.ndarray   # (K,) int32
    mask: jnp.ndarray     # (K,) bool

    @property
    def capacity(self) -> int:
        return self.model.shape[0]


@struct.dataclass
class Poses:
    """World→camera extrinsics; row p == pose id p."""

    R: jnp.ndarray      # (P, 3, 3) float — rotation, x_cam = R (X - C)
    C: jnp.ndarray      # (P, 3) float — camera center in world frame
    mask: jnp.ndarray   # (P,) bool — pose estimated / valid

    @property
    def capacity(self) -> int:
        return self.R.shape[0]


@struct.dataclass
class Observations:
    """Flat observation table: one row per (landmark, view) measurement.

    Device-friendly equivalent of OpenMVG's per-landmark observation maps.
    Sorted by landmark id (not required, but produced that way by the
    tracks builder) — segment ops use `landmark_id` directly."""

    landmark_id: jnp.ndarray  # (O,) int32
    view_id: jnp.ndarray      # (O,) int32
    xy: jnp.ndarray           # (O, 2) float — pixel coordinates
    feature_id: jnp.ndarray   # (O,) int32 — index into that view's keypoints
    mask: jnp.ndarray         # (O,) bool

    @property
    def capacity(self) -> int:
        return self.landmark_id.shape[0]


@struct.dataclass
class Landmarks:
    X: jnp.ndarray      # (L, 3) float — world points
    color: jnp.ndarray  # (L, 3) float — RGB in [0,1]
    mask: jnp.ndarray   # (L,) bool

    @property
    def capacity(self) -> int:
        return self.X.shape[0]


@struct.dataclass
class Scene:
    """Full reconstruction state — the ``SfM_Data`` equivalent.

    A pure pytree: jit-able, shardable, checkpointable."""

    views: Views
    intrinsics: Intrinsics
    poses: Poses
    landmarks: Landmarks
    observations: Observations

    # ---- constructors -------------------------------------------------
    @staticmethod
    def empty(num_views: int, num_intrinsics: int, num_landmarks: int,
              num_observations: int, dtype=jnp.float32) -> "Scene":
        V, K, L, O = num_views, num_intrinsics, num_landmarks, num_observations
        return Scene(
            views=Views(
                width=jnp.zeros((V,), jnp.int32),
                height=jnp.zeros((V,), jnp.int32),
                intrinsic_id=jnp.zeros((V,), jnp.int32),
                pose_id=jnp.arange(V, dtype=jnp.int32),
                mask=jnp.zeros((V,), bool),
            ),
            intrinsics=Intrinsics(
                model=jnp.full((K,), RADIAL_K3, jnp.int32),
                params=jnp.zeros((K, NUM_INTRINSIC_PARAMS), dtype),
                width=jnp.zeros((K,), jnp.int32),
                height=jnp.zeros((K,), jnp.int32),
                mask=jnp.zeros((K,), bool),
            ),
            poses=Poses(
                R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (V, 3, 3)),
                C=jnp.zeros((V, 3), dtype),
                mask=jnp.zeros((V,), bool),
            ),
            landmarks=Landmarks(
                X=jnp.zeros((L, 3), dtype),
                color=jnp.zeros((L, 3), dtype),
                mask=jnp.zeros((L,), bool),
            ),
            observations=Observations(
                landmark_id=jnp.zeros((O,), jnp.int32),
                view_id=jnp.zeros((O,), jnp.int32),
                xy=jnp.zeros((O, 2), dtype),
                feature_id=jnp.zeros((O,), jnp.int32),
                mask=jnp.zeros((O,), bool),
            ),
        )

    # ---- stats (the reference's acceptance signal, SURVEY.md §4) ------
    def num_valid_views(self):
        return jnp.sum(self.views.mask.astype(jnp.int32))

    def num_calibrated(self):
        return jnp.sum((self.poses.mask & self.views.mask).astype(jnp.int32))

    def num_landmarks(self):
        return jnp.sum(self.landmarks.mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Keypoint / descriptor batch containers (feature stage outputs)
# ---------------------------------------------------------------------------

@struct.dataclass
class Keypoints:
    """Padded per-image keypoint batch — SIOPointFeature equivalent
    (x, y, scale, orientation; src/Regard3DFeatures.h:42-48)."""

    xy: jnp.ndarray      # (B, N, 2) float
    scale: jnp.ndarray   # (B, N) float — patch diameter ("size" in cv terms)
    angle: jnp.ndarray   # (B, N) float — radians
    score: jnp.ndarray   # (B, N) float — detector response
    mask: jnp.ndarray    # (B, N) bool

    @property
    def batch(self) -> int:
        return self.xy.shape[0]

    @property
    def capacity(self) -> int:
        return self.xy.shape[1]


@struct.dataclass
class Descriptors:
    """Padded descriptor batch. LIOP gives 144 floats
    (Descriptor<float,144>, src/Regard3DFeatures.h:44); stored padded to a
    lane-friendly multiple of 128 for the MXU distance kernels."""

    data: jnp.ndarray   # (B, N, D) float — D is 144 padded up to 256
    mask: jnp.ndarray   # (B, N) bool

    @property
    def dim(self) -> int:
        return self.data.shape[-1]


def pad_to(x: np.ndarray, n: int, axis: int = 0, fill=0):
    """Pad numpy array along `axis` up to length n."""
    pad = n - x.shape[axis]
    if pad < 0:
        raise ValueError(f"cannot pad: {x.shape[axis]} > {n}")
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
