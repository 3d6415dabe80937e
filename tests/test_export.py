import configparser
import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras
from regard3d_tpu.core.types import PINHOLE, Scene
from regard3d_tpu.export import formats, model_ops, openmvs
from regard3d_tpu.export.ply import PlyData, read_ply, write_ply


def make_scene(n_views=3, n_lm=10):
    rng = np.random.default_rng(0)
    s = Scene.empty(n_views, 1, n_lm, n_views * n_lm)
    Rm = np.stack([np.asarray(cameras.exp_so3(jnp.asarray([0.0, 0.1 * i, 0])))
                   for i in range(n_views)])
    Cm = rng.normal(size=(n_views, 3)).astype(np.float32)
    s = s.replace(
        views=s.views.replace(
            width=jnp.full((n_views,), 640, jnp.int32),
            height=jnp.full((n_views,), 480, jnp.int32),
            mask=jnp.ones((n_views,), bool)),
        intrinsics=s.intrinsics.replace(
            model=jnp.asarray([PINHOLE], jnp.int32),
            params=s.intrinsics.params.at[0, :3].set(
                jnp.asarray([500.0, 320.0, 240.0])),
            width=jnp.asarray([640], jnp.int32),
            height=jnp.asarray([480], jnp.int32),
            mask=jnp.ones((1,), bool)),
        poses=s.poses.replace(R=jnp.asarray(Rm), C=jnp.asarray(Cm),
                              mask=jnp.ones((n_views,), bool)),
        landmarks=s.landmarks.replace(
            X=jnp.asarray(rng.normal(size=(n_lm, 3)), jnp.float32),
            color=jnp.asarray(rng.uniform(size=(n_lm, 3)), jnp.float32),
            mask=jnp.ones((n_lm,), bool)),
        observations=s.observations.replace(
            landmark_id=jnp.tile(jnp.arange(n_lm, dtype=jnp.int32), n_views),
            view_id=jnp.repeat(jnp.arange(n_views, dtype=jnp.int32), n_lm),
            xy=jnp.asarray(rng.uniform(0, 600, size=(n_views * n_lm, 2)),
                           jnp.float32),
            mask=jnp.ones((n_views * n_lm,), bool)),
    )
    return s


def test_ply_roundtrip_binary(tmp_path, rng):
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = (rng.uniform(size=(20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "c.ply")
    write_ply(p, PlyData(xyz=xyz, rgb=rgb), binary=True)
    d = read_ply(p)
    np.testing.assert_allclose(d.xyz, xyz, atol=1e-6)
    np.testing.assert_array_equal(d.rgb, rgb)


def test_ply_roundtrip_ascii_with_faces(tmp_path, rng):
    xyz = rng.normal(size=(4, 3)).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, PlyData(xyz=xyz, faces=faces), binary=False)
    d = read_ply(p)
    np.testing.assert_allclose(d.xyz, xyz, atol=1e-5)
    np.testing.assert_array_equal(d.faces, faces)


def test_bundler_export(tmp_path):
    s = make_scene()
    out = str(tmp_path)
    formats.export_bundler(out, s, [f"im{i}.jpg" for i in range(3)])
    lines = open(os.path.join(out, "bundle.rd.out")).read().splitlines()
    assert lines[0].startswith("# Bundle file")
    ncam, npts = map(int, lines[1].split())
    assert (ncam, npts) == (3, 10)
    assert len(open(os.path.join(out, "list.txt")).read().splitlines()) == 3
    # focal on first camera line
    assert float(lines[2].split()[0]) == pytest.approx(500.0)


def test_nvm_export(tmp_path):
    s = make_scene()
    p = str(tmp_path / "scene.nvm")
    formats.export_nvm(p, s, [f"im{i}.jpg" for i in range(3)])
    txt = open(p).read().splitlines()
    assert txt[0] == "NVM_V3"
    assert int(txt[2]) == 3          # cameras
    cam0 = txt[3].split()
    assert cam0[0] == "im0.jpg" and float(cam0[1]) == pytest.approx(500.0)


def test_meshlab_export(tmp_path):
    s = make_scene()
    formats.export_meshlab(str(tmp_path), s, [f"/x/im{i}.jpg"
                                              for i in range(3)])
    mlp = open(os.path.join(str(tmp_path), "scene.mlp")).read()
    assert mlp.count("<MLRaster") == 3
    assert "VCGCamera" in mlp


def test_mve2_export(tmp_path, rng):
    s = make_scene()
    imgs = [(rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
            for _ in range(3)]
    formats.export_mve2(str(tmp_path), s, imgs,
                        [f"im{i}.jpg" for i in range(3)])
    vdir = os.path.join(str(tmp_path), "MVE", "views", "view_0000.mve")
    meta = configparser.ConfigParser()
    meta.read(os.path.join(vdir, "meta.ini"))
    assert float(meta["camera"]["focal_length"]) == pytest.approx(500 / 640)
    assert os.path.exists(os.path.join(vdir, "undistorted.png"))


def test_openmvs_export(tmp_path):
    s = make_scene()
    p = str(tmp_path / "scene.mvs")
    openmvs.export_openmvs(p, s, [f"im{i}.jpg" for i in range(3)])
    with open(p, "rb") as f:
        assert f.read(4) == b"MVSI"
        version = struct.unpack("<I", f.read(4))[0]
        assert version == 2
        struct.unpack("<I", f.read(4))
        n_platforms = struct.unpack("<Q", f.read(8))[0]
        assert n_platforms == 1


def test_combine_and_colorize(tmp_path, rng):
    a = str(tmp_path / "a.ply")
    b = str(tmp_path / "b.ply")
    write_ply(a, PlyData(xyz=np.zeros((5, 3), np.float32),
                         rgb=np.full((5, 3), 255, np.uint8)))
    write_ply(b, PlyData(xyz=np.ones((7, 3), np.float32),
                         rgb=np.zeros((7, 3), np.uint8)))
    comb = str(tmp_path / "c.ply")
    n = model_ops.combine_clouds([a, b], comb)
    assert n == 12
    d = read_ply(comb)
    assert len(d.xyz) == 12

    # colorize: mesh vertices at origin must pick up white from cloud a
    mesh = str(tmp_path / "mesh.ply")
    write_ply(mesh, PlyData(xyz=np.zeros((3, 3), np.float32),
                            faces=np.asarray([[0, 1, 2]])))
    out = str(tmp_path / "colored.ply")
    m = model_ops.colorize_mesh_from_cloud(mesh, comb, out, k=3)
    assert (m.rgb == 255).all()


def test_ply_to_obj(tmp_path, rng):
    p = str(tmp_path / "m.ply")
    write_ply(p, PlyData(xyz=rng.normal(size=(3, 3)).astype(np.float32),
                         rgb=np.full((3, 3), 128, np.uint8),
                         faces=np.asarray([[0, 1, 2]])))
    o = str(tmp_path / "m.obj")
    model_ops.ply_to_obj(p, o)
    txt = open(o).read()
    assert txt.count("\nv ") + txt.startswith("v ") == 3
    assert "f 1 2 3" in txt


def test_undistort_identity(tmp_path, rng):
    # pinhole (no distortion): undistorted image == original
    s = make_scene()
    img = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    out = formats.undistort_image(img, s, 0)
    np.testing.assert_array_equal(out, img)


def test_sfm_output_export(tmp_path, rng):
    from regard3d_tpu.export import sfm_output
    s = make_scene()
    imgs = [(rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
            for _ in range(3)]
    out = str(tmp_path / "SfM_output")
    sfm_output.export_sfm_output(out, s, imgs,
                                 [f"im{i}.jpg" for i in range(3)])
    # P matrix roundtrip: 12 doubles column-major
    P = np.fromfile(os.path.join(out, "cameras", "im0.bin"),
                    np.float64).reshape(4, 3).T
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    R = np.asarray(s.poses.R[0])
    t = -R @ np.asarray(s.poses.C[0])
    np.testing.assert_allclose(P, K @ np.concatenate([R, t[:, None]], 1),
                               rtol=1e-5, atol=1e-5)
    views = open(os.path.join(out, "views.txt")).read().splitlines()
    assert views[:2] == ["images", "cameras"] and int(views[2]) == 3
    assert os.path.exists(os.path.join(out, "clouds", "calib.ply"))
    assert os.path.exists(os.path.join(out, "clouds", "visibility.txt"))
    disto = open(os.path.join(out, "cameras_disto", "im0.txt")).read()
    assert disto.split()[0] == "500.0"
    assert os.path.exists(os.path.join(out, "images", "im0.jpg"))


def test_external_mvs_export(tmp_path, rng):
    from regard3d_tpu.export import external_mvs
    s = make_scene()
    imgs = [(rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
            for _ in range(3)]
    out = str(tmp_path)
    external_mvs.export_external_mvs(out, s, imgs,
                                     [f"im{i}.jpg" for i in range(3)])
    assert os.path.exists(os.path.join(out, "CMPMVS", "00001_P.txt"))
    assert open(os.path.join(out, "CMPMVS", "00001_P.txt")).read() \
        .startswith("CONTOUR")
    sfm = open(os.path.join(out, "meshrecon", "output.sfm")).read() \
        .splitlines()
    assert int(sfm[0]) == 3
    assert sfm[2].startswith("../CMPMVS/00001.jpg")
    ori = open(os.path.join(out, "SURE", "00001.ori")).read()
    assert ori.startswith("$ImageID") and "ORI_Ver_1.0" in ori
    assert os.path.exists(os.path.join(out, "MVMPR", "data", "00001.cam"))
    assert os.path.exists(os.path.join(out, "mvs_firstRun.ini"))


def test_bundler_view_lists(tmp_path):
    """Per-landmark view lists parity (OpenMVGHelper.cpp:882-903):
    `<n> <cam> <key> <px> <py>` per observation, point reprojected."""
    s = make_scene()
    out = str(tmp_path)
    formats.export_bundler(out, s, [f"im{i}.jpg" for i in range(3)])
    lines = open(os.path.join(out, "bundle.rd.out")).read().splitlines()
    # camera block: 3 cams x 5 lines after 2 header lines
    pt0 = 2 + 3 * 5
    view_list = lines[pt0 + 2].split()
    n = int(view_list[0])
    assert n == 3                       # every landmark seen by all 3 views
    assert len(view_list) == 1 + 4 * n
    cams = {int(view_list[1 + 4 * k]) for k in range(n)}
    assert cams == {0, 1, 2}


def test_mvs_texturing_export(tmp_path):
    s = make_scene()
    out = str(tmp_path / "cams")
    n = formats.export_mvs_texturing(out, s, [f"im{i}.jpg" for i in range(3)])
    assert n == 3
    for i in range(3):
        path = os.path.join(out, f"im{i}.cam")
        assert os.path.exists(path)
        l1, l2 = open(path).read().splitlines()
        vals1 = [float(x) for x in l1.split()]
        vals2 = [float(x) for x in l2.split()]
        assert len(vals1) == 12 and len(vals2) == 6
        # t = -R C
        R = np.asarray(vals1[3:]).reshape(3, 3)
        t = np.asarray(vals1[:3])
        C = np.asarray(s.poses.C)[i]
        np.testing.assert_allclose(t, -R @ C, atol=1e-5)
        # normalized focal f/max(w,h), pp in [0,1]
        assert vals2[0] == pytest.approx(500.0 / 640.0, rel=1e-6)
        assert vals2[1:4] == [0.0, 0.0, 1.0]
        assert vals2[4] == pytest.approx(0.5, rel=1e-6)
        assert vals2[5] == pytest.approx(0.5, rel=1e-6)
