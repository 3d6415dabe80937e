"""Scene (SfM_Data) persistence.

Two formats:

* **npz** — the framework's native artifact: raw SoA arrays, fast, exact.
  Plays the role of OpenMVG's ``sfm_data.bin``
  (``src/threads/R3DTriangulationThread.cpp:446``).
* **json** — interoperability format modeled on OpenMVG's
  ``sfm_data.json`` layout (views / intrinsics / extrinsics / structure),
  which the reference writes in ``R3DProject::writeSfmData``
  (``src/R3DProject.cpp:1118-1308``), so scenes can be diffed against
  reference outputs for the parity gates.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import numpy as np

from regard3d_tpu.core.types import (CAMERA_MODEL_CODES, CAMERA_MODEL_NAMES,
                                     DISTO_NPARAMS, Intrinsics, Landmarks,
                                     Observations, Poses, Scene, Views)

_OPENMVG_MODEL_NAMES = {
    "pinhole": "pinhole",
    "radial_k1": "pinhole_radial_k1",
    "radial_k3": "pinhole_radial_k3",
    "brown_t2": "pinhole_brown_t2",
    "fisheye": "fisheye",
}
_OPENMVG_MODEL_CODES = {v: k for k, v in _OPENMVG_MODEL_NAMES.items()}


def scene_to_numpy(scene: Scene) -> dict:
    flat = {}
    for name, sub in (("views", scene.views), ("intrinsics", scene.intrinsics),
                      ("poses", scene.poses), ("landmarks", scene.landmarks),
                      ("observations", scene.observations)):
        for field, val in vars(sub).items():
            flat[f"{name}.{field}"] = np.asarray(val)
    return flat


def save_npz(path: str, scene: Scene, extra: Optional[dict] = None):
    flat = scene_to_numpy(scene)
    if extra:
        for k, v in extra.items():
            flat[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Scene:
    z = np.load(path)
    def grp(name, cls):
        fields = {k.split(".", 1)[1]: z[k] for k in z.files
                  if k.startswith(name + ".")}
        return cls(**{k: np.asarray(v) for k, v in fields.items()})
    return Scene(
        views=grp("views", Views),
        intrinsics=grp("intrinsics", Intrinsics),
        poses=grp("poses", Poses),
        landmarks=grp("landmarks", Landmarks),
        observations=grp("observations", Observations),
    )


def scene_to_json_dict(scene: Scene, image_names: Optional[list] = None,
                       root_path: str = "") -> dict:
    """OpenMVG-style sfm_data dict (views/intrinsics/extrinsics/structure)."""
    s = jax.tree_util.tree_map(np.asarray, scene)
    views = []
    for i in range(s.views.capacity):
        if not s.views.mask[i]:
            continue
        views.append({
            "key": int(i),
            "value": {
                "filename": (image_names[i] if image_names else f"image{i:06d}"),
                "width": int(s.views.width[i]),
                "height": int(s.views.height[i]),
                "id_view": int(i),
                "id_intrinsic": int(s.views.intrinsic_id[i]),
                "id_pose": int(s.views.pose_id[i]),
            },
        })
    intrinsics = []
    for k in range(s.intrinsics.capacity):
        if not s.intrinsics.mask[k]:
            continue
        model = int(s.intrinsics.model[k])
        p = s.intrinsics.params[k]
        nd = DISTO_NPARAMS[model]
        intrinsics.append({
            "key": int(k),
            "value": {
                "polymorphic_name": _OPENMVG_MODEL_NAMES[CAMERA_MODEL_NAMES[model]],
                "data": {
                    "width": int(s.intrinsics.width[k]),
                    "height": int(s.intrinsics.height[k]),
                    "focal_length": float(p[0]),
                    "principal_point": [float(p[1]), float(p[2])],
                    "disto": [float(x) for x in p[3:3 + nd]],
                },
            },
        })
    extrinsics = []
    for pidx in range(s.poses.capacity):
        if not s.poses.mask[pidx]:
            continue
        extrinsics.append({
            "key": int(pidx),
            "value": {
                "rotation": [[float(x) for x in row] for row in s.poses.R[pidx]],
                "center": [float(x) for x in s.poses.C[pidx]],
            },
        })
    # structure: group observations by landmark
    structure = []
    if s.observations.capacity:
        order = np.argsort(s.observations.landmark_id, kind="stable")
        lid = s.observations.landmark_id[order]
        vmask = s.observations.mask[order]
        vid = s.observations.view_id[order]
        fid = s.observations.feature_id[order]
        xy = s.observations.xy[order]
        cur = None
        obs_acc = []
        def flush():
            if cur is not None and s.landmarks.mask[cur] and obs_acc:
                structure.append({
                    "key": int(cur),
                    "value": {
                        "X": [float(x) for x in s.landmarks.X[cur]],
                        "observations": obs_acc.copy(),
                    },
                })
        for j in range(len(lid)):
            if not vmask[j]:
                continue
            if lid[j] != cur:
                flush()
                cur = int(lid[j])
                obs_acc = []
            obs_acc.append({
                "key": int(vid[j]),
                "value": {"id_feat": int(fid[j]),
                          "x": [float(xy[j, 0]), float(xy[j, 1])]},
            })
        flush()
    return {
        "sfm_data_version": "0.3",
        "root_path": root_path,
        "views": views,
        "intrinsics": intrinsics,
        "extrinsics": extrinsics,
        "structure": structure,
        "control_points": [],
    }


def save_json(path: str, scene: Scene, image_names: Optional[list] = None,
              root_path: str = ""):
    with open(path, "w") as f:
        json.dump(scene_to_json_dict(scene, image_names, root_path), f, indent=1)
