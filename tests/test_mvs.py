"""TPU-native dense MVS (plane sweep + fusion) tests.

Oracle strategy per SURVEY.md §4: geometric identities checked against
closed-form constructions (homography of a known plane), and end-to-end
recovery of known scene geometry from rendered multi-view images."""

import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core import cameras
from regard3d_tpu.core.types import PINHOLE, Scene
from regard3d_tpu.mvs import driver, fusion, planesweep

from tests.test_pipeline import render_scene


def _pinhole_K(f, cx, cy):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])


def test_plane_homography_matches_projection(rng):
    """H(d) must equal: lift ref pixel to the plane z=d (ref cam frame),
    project into the source camera."""
    R_ref = np.asarray(cameras.exp_so3(jnp.asarray([0.1, -0.2, 0.05])))
    C_ref = np.array([0.3, -0.1, 0.2])
    R_src = np.asarray(cameras.exp_so3(jnp.asarray([-0.05, 0.15, 0.0])))
    C_src = np.array([1.0, 0.2, -0.1])
    K = _pinhole_K(400.0, 160.0, 120.0)
    depths = np.array([4.0, 7.5])
    H = planesweep.plane_homographies(K, R_ref, C_ref, K, R_src, C_src,
                                      depths)
    assert H.shape == (1, 2, 3, 3)
    for k, d in enumerate(depths):
        for uv in ([160.0, 120.0], [40.0, 200.0], [300.0, 10.0]):
            ray = np.linalg.inv(K) @ [uv[0], uv[1], 1.0]
            x_ref = ray / ray[2] * d          # point on plane z=d (ref cam)
            X = C_ref + R_ref.T @ x_ref       # world
            x_src = R_src @ (X - C_src)
            uv_src = (K @ x_src)[:2] / (K @ x_src)[2]
            q = H[0, k] @ [uv[0], uv[1], 1.0]
            np.testing.assert_allclose(q[:2] / q[2], uv_src, atol=1e-6)


def test_sweep_recovers_fronto_parallel_plane(rng):
    """Single textured plane at known depth: the sweep must return that
    depth (within plane spacing) wherever the texture is visible."""
    hw, f, z0 = 128, 150.0, 5.0
    K = _pinhole_K(f, hw / 2, hw / 2)
    tex = rng.uniform(0, 1, size=(400, 400)).astype(np.float32)

    def render(R, C):
        ys, xs = np.mgrid[0:hw, 0:hw].astype(np.float32)
        ray = np.stack([(xs - hw / 2) / f, (ys - hw / 2) / f,
                        np.ones_like(xs)], -1) @ R  # R^T rays, world
        t = (z0 - C[2]) / ray[..., 2]
        px = C[0] + t * ray[..., 0]
        py = C[1] + t * ray[..., 1]
        u = np.clip((px + 3) / 6 * 399, 0, 398.999)
        v = np.clip((py + 3) / 6 * 399, 0, 398.999)
        u0, v0 = u.astype(int), v.astype(int)
        fu, fv = u - u0, v - v0
        return ((1 - fu) * (1 - fv) * tex[v0, u0]
                + fu * (1 - fv) * tex[v0, u0 + 1]
                + (1 - fu) * fv * tex[v0 + 1, u0]
                + fu * fv * tex[v0 + 1, u0 + 1]).astype(np.float32)

    R0, C0 = np.eye(3), np.zeros(3)
    poses = [(np.eye(3), np.array([0.4, 0.0, 0.0])),
             (np.eye(3), np.array([-0.4, 0.1, 0.0]))]
    ref = render(R0, C0)
    srcs = np.stack([render(R, C) for R, C in poses])

    D = 32
    depths = planesweep.inverse_depth_planes(3.0, 9.0, D)
    homos = planesweep.plane_homographies(
        K, R0, C0, np.stack([K, K]), np.stack([p[0] for p in poses]),
        np.stack([p[1] for p in poses]), depths)
    idepth, ncc = planesweep.sweep(
        jnp.asarray(ref), jnp.asarray(srcs), jnp.ones((2,), bool),
        jnp.asarray(homos, jnp.float32),
        jnp.asarray(1.0 / depths, jnp.float32), wsize=7, top_k=2, chunk=8)
    z = 1.0 / np.asarray(idepth)
    ncc = np.asarray(ncc)
    inner = np.s_[16:-16, 16:-16]
    good = ncc[inner] > 0.7
    assert good.mean() > 0.9
    err = np.abs(z[inner][good] - z0)
    # inverse-depth plane spacing near z0
    spacing = z0 * z0 * (1 / 3.0 - 1 / 9.0) / (D - 1)
    assert np.median(err) < spacing


def test_box_sum_matches_numpy(rng):
    x = rng.normal(size=(16, 20)).astype(np.float32)
    w = 5
    out = np.asarray(planesweep.box_sum(jnp.asarray(x), w))
    pad = np.pad(x, w // 2)
    expect = np.zeros_like(x)
    for i in range(16):
        for j in range(20):
            expect[i, j] = pad[i:i + w, j:j + w].sum()
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def _scene_from_render(sc, n_lm=200, seed=0):
    """Build a posed Scene (landmarks on both planes + observations) from
    the render_scene ground truth."""
    rng = np.random.default_rng(seed)
    n_cams, hw, f = len(sc["images"]), sc["hw"], sc["f"]
    # sample landmarks on both planes (world frame)
    half = n_lm // 2
    X1 = np.stack([rng.uniform(-1, 1, half), rng.uniform(-1, 1, half),
                   np.full(half, 8.0)], -1)
    X2 = np.stack([rng.uniform(-9, 9, n_lm - half),
                   rng.uniform(-9, 9, n_lm - half),
                   np.full(n_lm - half, 13.0)], -1)
    X = np.concatenate([X1, X2]).astype(np.float32)

    obs_l, obs_v, obs_xy = [], [], []
    for v in range(n_cams):
        uv, depth = cameras.project(
            jnp.asarray(sc["Rs"][v]), jnp.asarray(sc["Cs"][v]),
            jnp.int32(PINHOLE),
            jnp.asarray([f, hw / 2, hw / 2, 0, 0, 0, 0, 0, 0], jnp.float32),
            jnp.asarray(X))
        uv, depth = np.asarray(uv), np.asarray(depth)
        ok = (depth > 0) & (uv >= 0).all(-1) & (uv <= hw - 1).all(-1)
        for i in np.nonzero(ok)[0]:
            obs_l.append(i)
            obs_v.append(v)
            obs_xy.append(uv[i])
    O = len(obs_l)
    s = Scene.empty(n_cams, 1, n_lm, O)
    s = s.replace(
        views=s.views.replace(
            width=jnp.full((n_cams,), hw, jnp.int32),
            height=jnp.full((n_cams,), hw, jnp.int32),
            mask=jnp.ones((n_cams,), bool)),
        intrinsics=s.intrinsics.replace(
            model=jnp.asarray([PINHOLE], jnp.int32),
            params=s.intrinsics.params.at[0, :3].set(
                jnp.asarray([f, hw / 2, hw / 2])),
            width=jnp.asarray([hw], jnp.int32),
            height=jnp.asarray([hw], jnp.int32),
            mask=jnp.ones((1,), bool)),
        poses=s.poses.replace(R=jnp.asarray(sc["Rs"], jnp.float32),
                              C=jnp.asarray(sc["Cs"], jnp.float32),
                              mask=jnp.ones((n_cams,), bool)),
        landmarks=s.landmarks.replace(
            X=jnp.asarray(X), mask=jnp.ones((n_lm,), bool)),
        observations=s.observations.replace(
            landmark_id=jnp.asarray(obs_l, jnp.int32),
            view_id=jnp.asarray(obs_v, jnp.int32),
            xy=jnp.asarray(np.stack(obs_xy), jnp.float32),
            mask=jnp.ones((O,), bool)))
    return s


def test_select_sources_and_depth_range(rng):
    sc = render_scene(rng, n_cams=4, hw=128, f=165.0)
    scene = _scene_from_render(sc, n_lm=120)
    srcs = driver.select_sources(scene, num_sources=3)
    assert set(srcs.keys()) == {0, 1, 2, 3}
    for v, lst in srcs.items():
        assert v not in lst and len(lst) >= 1
    rngd = driver.depth_range(scene, 0)
    assert rngd is not None
    lo, hi = rngd
    assert lo < 8.0 - 1e-3 and hi > 13.0 + 1e-3


def test_densify_scene_recovers_planes(rng):
    """End-to-end native densification on the rendered two-plane scene:
    fused points must lie on one of the two ground-truth planes."""
    sc = render_scene(rng, n_cams=5, hw=192, f=248.0)
    scene = _scene_from_render(sc, n_lm=200)
    images = [(np.clip(im, 0, 1) * 255).astype(np.uint8)
              for im in sc["images"]]
    xyz, nrm, rgb, dmaps = driver.densify_scene(
        scene, images, level=0, num_planes=64, wsize=7, threshold=0.6,
        num_sources=4, csize=2, min_image_num=3)
    assert len(dmaps) == 5
    assert len(xyz) > 2000
    d1 = np.abs(xyz[:, 2] - 8.0)
    d2 = np.abs(xyz[:, 2] - 13.0)
    on_plane = np.minimum(d1, d2) < 0.25
    assert on_plane.mean() > 0.9
    # normals should point roughly along -z (toward the cameras)
    assert np.median(nrm[:, 2]) < -0.8
    assert rgb.shape == xyz.shape


def test_densify_photometric_scale_invariance(rng):
    """Regression: [0,1]-float images (the image_io.load_rgb contract) must
    fuse like uint8 images — the ZNCC epsilons once swallowed low-range
    inputs (found driving the CLI: densify produced 0 points on loaded
    PNGs while passing on uint8 arrays)."""
    sc = render_scene(rng, n_cams=4, hw=128, f=165.0)
    scene = _scene_from_render(sc, n_lm=120)
    u8 = [(np.clip(im, 0, 1) * 255).astype(np.uint8) for im in sc["images"]]
    f01 = [np.clip(im, 0, 1).astype(np.float32) for im in sc["images"]]
    kw = dict(level=0, num_planes=32, wsize=7, threshold=0.6,
              num_sources=3, min_image_num=2)
    xyz_u8, *_ = driver.densify_scene(scene, u8, **kw)
    xyz_f, *_ = driver.densify_scene(scene, f01, **kw)
    assert len(xyz_f) > 100
    assert abs(len(xyz_f) - len(xyz_u8)) < 0.1 * max(len(xyz_u8), 1)


def test_sharded_depth_maps_match_host_loop(rng):
    """View-sharded sweep over the 8-device CPU mesh must reproduce the
    host-loop depth maps (same top_k regime: every view has 3 sources)."""
    import jax
    from jax.sharding import Mesh

    sc = render_scene(rng, n_cams=4, hw=128, f=165.0)
    scene = _scene_from_render(sc, n_lm=120)
    images = [(np.clip(im, 0, 1) * 255).astype(np.uint8)
              for im in sc["images"]]
    from regard3d_tpu.mvs.planesweep import PlaneSweepParams
    params = PlaneSweepParams(level=0, num_planes=32, wsize=7,
                              threshold=0.6, num_sources=3)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("views",))
    d_host = driver.compute_depth_maps(scene, images, params)
    d_mesh = driver.compute_depth_maps_sharded(scene, images, params, mesh)
    assert set(d_host) == set(d_mesh)
    for v in d_host:
        np.testing.assert_allclose(d_mesh[v].idepth, d_host[v].idepth,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(d_mesh[v].ncc, d_host[v].ncc,
                                   rtol=0, atol=1e-4)


def test_fusion_rejects_inconsistent_depth(rng):
    """A depth map that disagrees with every source must be filtered out."""
    hw = 64
    K = jnp.asarray(_pinhole_K(80.0, 32.0, 32.0), jnp.float32)
    eye = jnp.eye(3)
    idepth = jnp.full((hw, hw), 1.0 / 5.0)
    wrong = jnp.full((hw, hw), 1.0 / 9.0)
    valid = jnp.ones((hw, hw), bool)
    accept, X = fusion.consistency_mask(
        idepth, valid, K, eye, jnp.zeros(3),
        wrong[None], valid[None], K[None], eye[None],
        jnp.asarray([[0.2, 0.0, 0.0]]), jnp.ones((1,), bool),
        tol=0.01, min_consistent=1)
    assert not bool(np.asarray(accept).any())
    # and an agreeing one passes (same camera center offset, true depth)
    accept2, _ = fusion.consistency_mask(
        idepth, valid, K, eye, jnp.zeros(3),
        idepth[None], valid[None], K[None], eye[None],
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.ones((1,), bool),
        tol=0.01, min_consistent=1)
    assert np.asarray(accept2).mean() > 0.9


def test_select_sources_vectorized_equivalence(rng):
    # the offset-pair enumeration must reproduce the per-landmark
    # triple-loop definition exactly
    sc = _scene_from_render(render_scene(rng, n_cams=4, hw=128, f=165.0),
                            n_lm=120)
    srcs = driver.select_sources(sc, num_sources=4)
    # reference: triple loop
    import numpy as np
    obs_l = np.asarray(sc.observations.landmark_id)
    obs_v = np.asarray(sc.observations.view_id)
    obs_m = np.asarray(sc.observations.mask)
    lm_X = np.asarray(sc.landmarks.X)
    lm_m = np.asarray(sc.landmarks.mask)
    pid = np.asarray(sc.views.pose_id)
    C = np.asarray(sc.poses.C)
    live = obs_m & lm_m[obs_l]
    views = driver._posed_views(sc)
    vset = {v: i for i, v in enumerate(views)}
    nv = len(views)
    score = np.zeros((nv, nv))
    for lm in np.unique(obs_l[live]):
        vs = sorted(vset[v] for v in obs_v[live & (obs_l == lm)]
                    if v in vset)
        X = lm_X[lm]
        for a in range(len(vs)):
            for b in range(a + 1, len(vs)):
                r1 = C[pid[views[vs[a]]]] - X
                r2 = C[pid[views[vs[b]]]] - X
                cosang = np.dot(r1, r2) / max(
                    np.linalg.norm(r1) * np.linalg.norm(r2), 1e-12)
                ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
                w = min(ang / 2.0, 1.0)
                score[vs[a], vs[b]] += w
                score[vs[b], vs[a]] += w
    for i, v in enumerate(views):
        ranked = np.argsort(-score[i])
        expect = [views[j] for j in ranked if score[i, j] > 0][:4]
        assert set(srcs[v]) == set(expect), (v, srcs[v], expect)
