"""TPU-native texturing tests (texrecon-equivalent stage).

Oracle strategy per SURVEY.md §4: analytic scenes — a plane with a linear
color gradient renders/samples exactly under bilinear interpolation, so
atlas texels can be checked in closed form; occlusion uses a two-plane
scene with a known blocked view."""

import os

import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import PINHOLE, Scene
from regard3d_tpu.surface import texture


def _make_scene(Rs, Cs, f, hw):
    n = len(Rs)
    s = Scene.empty(n, 1, 1, 1)
    return s.replace(
        views=s.views.replace(
            width=jnp.full((n,), hw, jnp.int32),
            height=jnp.full((n,), hw, jnp.int32),
            mask=jnp.ones((n,), bool)),
        intrinsics=s.intrinsics.replace(
            model=jnp.asarray([PINHOLE], jnp.int32),
            params=s.intrinsics.params.at[0, :3].set(
                jnp.asarray([f, hw / 2, hw / 2])),
            width=jnp.asarray([hw], jnp.int32),
            height=jnp.asarray([hw], jnp.int32),
            mask=jnp.ones((1,), bool)),
        poses=s.poses.replace(R=jnp.asarray(Rs, jnp.float32),
                              C=jnp.asarray(Cs, jnp.float32),
                              mask=jnp.ones((n,), bool)))


def _plane_color(px, py):
    """Linear RGB gradient on the z=5 plane — exact under bilinear."""
    return np.stack([(px + 2) / 4, (py + 2) / 4,
                     np.full_like(px, 0.5)], -1).astype(np.float32)


def _render_plane(C, f, hw, z0=5.0):
    ys, xs = np.mgrid[0:hw, 0:hw].astype(np.float32)
    cx = cy = hw / 2
    t = (z0 - C[2])
    px = C[0] + t * (xs - cx) / f
    py = C[1] + t * (ys - cy) / f
    return _plane_color(px, py)


def test_block_barycentrics_corners():
    B, pad, T = 11, 1, 8
    bary = texture._block_barycentrics(B, pad)
    assert bary.shape == (B, B, 3)
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(bary[pad, pad], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(bary[pad, pad + T], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(bary[pad + T, pad], [0, 0, 1], atol=1e-6)
    assert (bary >= -1e-6).all()


def test_texture_plane_exact_colors():
    f, hw = 200.0, 200
    Cs = np.array([[-0.5, 0, 0], [0.5, 0, 0]], np.float32)
    Rs = np.stack([np.eye(3, dtype=np.float32)] * 2)
    scene = _make_scene(Rs, Cs, f, hw)
    images = [_render_plane(C, f, hw) for C in Cs]

    verts = np.array([[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5]],
                     np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2]])   # normals -z (toward cameras)
    mesh = texture.texture_mesh(scene, images, verts, faces, texel_res=8,
                                outlier_removal="none", seam_leveling="none",
                                zbuf_scale=2)
    assert (mesh.labels >= 0).all()

    # every texel of every face must equal the analytic plane color
    pad, T = 1, 8
    B = T + 2 * pad + 1
    bary = texture._block_barycentrics(B, pad)
    nb = int(np.ceil(np.sqrt(len(faces))))
    for fi in range(len(faces)):
        P = np.einsum("xys,sd->xyd", bary, verts[faces[fi]])
        want = _plane_color(P[..., 0], P[..., 1])
        by, bx = divmod(fi, nb)
        got = mesh.atlas[by * B:(by + 1) * B, bx * B:(bx + 1) * B]
        np.testing.assert_allclose(got, want, atol=5e-3)


def test_occluded_face_selects_clear_view():
    f, hw = 200.0, 200
    Cs = np.array([[0, 0, 0], [2.0, 0, 0]], np.float32)
    Rs = np.stack([np.eye(3, dtype=np.float32)] * 2)
    scene = _make_scene(Rs, Cs, f, hw)
    images = [np.full((hw, hw, 3), 0.5, np.float32) for _ in range(2)]

    # back target: one small triangle at the center of z=5
    back = np.array([[-0.25, -0.25, 5], [0.25, 0.25, 5], [0.25, -0.25, 5]],
                    np.float32)
    # occluder: dense grid over [-0.4, 0.4]^2 at z=3 — blocks view 0's rays
    # to the back face; view 1 at x=2 sees around it
    g = 12
    xs = np.linspace(-0.4, 0.4, g + 1)
    gv, gf = [], []
    for j in range(g + 1):
        for i in range(g + 1):
            gv.append([xs[i], xs[j], 3.0])
    for j in range(g):
        for i in range(g):
            a = j * (g + 1) + i
            gf.append([a, a + g + 2, a + 1])
            gf.append([a, a + g + 1, a + g + 2])
    verts = np.concatenate([back, np.asarray(gv, np.float32)])
    faces = np.concatenate([np.array([[0, 1, 2]]),
                            np.asarray(gf) + 3]).astype(np.int64)

    scores, _ = texture.face_view_data(
        scene, *texture._stack_images(images)[:2],
        texture._posed_view_ids(scene), verts, faces, zbuf_scale=4)
    # view 0 is blocked for the back face, view 1 is clear
    assert scores[0, 0] < 0.05 * scores[1, 0]
    labels = texture.select_views(scores)
    assert labels[0] == 1


def test_photometric_outlier_weights_damping():
    # 3 candidate views; view 2's color is far off
    scores = np.ones((3, 1), np.float32)
    means = np.zeros((3, 1, 3), np.float32)
    means[0, 0] = [0.5, 0.5, 0.5]
    means[1, 0] = [0.52, 0.5, 0.5]
    means[2, 0] = [0.9, 0.1, 0.9]
    w = texture.photometric_outlier_weights(scores, means, "gauss_damping")
    assert w[2, 0] < w[0, 0] and w[2, 0] < w[1, 0]
    w_none = texture.photometric_outlier_weights(scores, means, "none")
    np.testing.assert_allclose(w_none, 1.0)


def test_seam_level_global_pulls_to_mean():
    verts = np.zeros((4, 3), np.float32)
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    labels = np.array([0, 1])
    means = np.zeros((2, 2, 3), np.float32)
    means[0, 0] = 0.2        # face 0 (label 0) color
    means[1, 1] = 0.8        # face 1 (label 1) color
    adj = texture.seam_level_global(verts, faces, labels,
                                    np.ones((2, 2)), means, 2)
    # shared vertices 1, 2: each label pulled halfway to the 0.5 mean
    np.testing.assert_allclose(adj[1, 0], [0.3] * 3, atol=1e-6)
    np.testing.assert_allclose(adj[1, 1], [-0.3] * 3, atol=1e-6)
    # unshared vertex 0 only has label 0 -> no correction
    np.testing.assert_allclose(adj[0, 0], 0.0, atol=1e-6)


def test_write_textured_obj(tmp_path):
    mesh = texture.TexturedMesh(
        verts=np.zeros((3, 3), np.float32),
        faces=np.array([[0, 1, 2]]),
        uvs=np.zeros((1, 3, 2), np.float32),
        atlas=np.full((8, 8, 3), 0.25, np.float32),
        labels=np.array([0]))
    obj = texture.write_textured_obj(str(tmp_path / "tex"), mesh)
    assert os.path.exists(obj)
    assert os.path.exists(str(tmp_path / "tex.mtl"))
    assert os.path.exists(str(tmp_path / "tex.png"))
    lines = open(obj).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 3
    assert sum(1 for l in lines if l.startswith("vt ")) == 3
    assert sum(1 for l in lines if l.startswith("f ")) == 1


def test_texture_project_mesh_resolves_pictureset(tmp_path):
    """Integration through the project store: texture_project_mesh must walk
    densification -> triangulation -> matches -> pictureset to find
    image_info (regression: it used to stop one hop short at matches)."""
    from PIL import Image

    from regard3d_tpu.core import sfm_data
    from regard3d_tpu.export.ply import PlyData, write_ply
    from regard3d_tpu.pipeline import project as proj_mod

    f, hw = 200.0, 200
    Cs = np.array([[-0.5, 0, 0], [0.5, 0, 0]], np.float32)
    Rs = np.stack([np.eye(3, dtype=np.float32)] * 2)
    scene = _make_scene(Rs, Cs, f, hw)
    img_paths = []
    for k, C in enumerate(Cs):
        img = (_render_plane(C, f, hw) * 255).astype(np.uint8)
        path = str(tmp_path / f"im{k}.png")
        Image.fromarray(img).save(path)
        img_paths.append(path)

    p = proj_mod.Project.create(str(tmp_path / "proj"))
    ps = p.add_picture_set("ps", img_paths)
    ps.params["image_info"] = [
        {"path": path, "width": hw, "height": hw} for path in img_paths]
    m = p.add_compute_matches(ps.id)
    tri = p.add_triangulation(m.id)
    dens = p.add_densification(tri.id)
    p.prepare(tri.id)
    sfm_data.save_npz(p.paths(tri.id).scene_npz, scene)
    p.prepare(dens.id)

    verts = np.array([[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5]],
                     np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2]])
    surf = str(tmp_path / "surface.ply")
    write_ply(surf, PlyData(xyz=verts, faces=faces))

    class Args:
        texel_res = 4
        outlier_removal = "none"
        seam_leveling = "none"

    obj = texture.texture_project_mesh(p, dens.id, surf,
                                       str(tmp_path / "tex"), Args())
    assert os.path.exists(obj)
