import json

import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core import sfm_data
from regard3d_tpu.core.types import RADIAL_K3, Scene


def make_scene():
    s = Scene.empty(num_views=4, num_intrinsics=1, num_landmarks=8,
                    num_observations=16)
    s = s.replace(
        views=s.views.replace(
            width=jnp.full((4,), 1280, jnp.int32),
            height=jnp.full((4,), 960, jnp.int32),
            mask=jnp.array([True, True, True, False]),
        ),
        intrinsics=s.intrinsics.replace(
            params=s.intrinsics.params.at[0, :3].set(
                jnp.array([1100.0, 640.0, 480.0])),
            width=jnp.array([1280], jnp.int32),
            height=jnp.array([960], jnp.int32),
            mask=jnp.array([True]),
        ),
        poses=s.poses.replace(mask=jnp.array([True, True, False, False])),
        landmarks=s.landmarks.replace(
            X=jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
            mask=jnp.array([True] * 5 + [False] * 3),
        ),
        observations=s.observations.replace(
            landmark_id=jnp.repeat(jnp.arange(8, dtype=jnp.int32), 2),
            view_id=jnp.tile(jnp.array([0, 1], jnp.int32), 8),
            xy=jnp.ones((16, 2), jnp.float32) * 3.5,
            mask=jnp.array([True] * 10 + [False] * 6),
        ),
    )
    return s


def test_npz_roundtrip(tmp_path):
    s = make_scene()
    p = str(tmp_path / "scene.npz")
    sfm_data.save_npz(p, s)
    s2 = sfm_data.load_npz(p)
    np.testing.assert_array_equal(np.asarray(s.views.width),
                                  np.asarray(s2.views.width))
    np.testing.assert_allclose(np.asarray(s.landmarks.X),
                               np.asarray(s2.landmarks.X))
    np.testing.assert_array_equal(np.asarray(s.observations.mask),
                                  np.asarray(s2.observations.mask))


def test_json_structure(tmp_path):
    s = make_scene()
    p = str(tmp_path / "sfm_data.json")
    sfm_data.save_json(p, s, image_names=[f"im{i}.jpg" for i in range(4)])
    d = json.load(open(p))
    assert len(d["views"]) == 3           # one masked out
    assert len(d["intrinsics"]) == 1
    assert len(d["extrinsics"]) == 2
    assert d["intrinsics"][0]["value"]["polymorphic_name"] == "pinhole_radial_k3"
    # structure: landmarks 0..4 are valid; each has up to 2 valid obs
    keys = [e["key"] for e in d["structure"]]
    assert keys == [0, 1, 2, 3, 4]
    assert len(d["structure"][0]["value"]["observations"]) == 2


def test_scene_stats():
    s = make_scene()
    assert int(s.num_valid_views()) == 3
    assert int(s.num_calibrated()) == 2
    assert int(s.num_landmarks()) == 5
