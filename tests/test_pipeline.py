import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras, metrics
from regard3d_tpu.core.types import PINHOLE
from regard3d_tpu.pipeline import (compute_matches as cm, features as fm,
                                   project as proj_mod,
                                   triangulation_step as ts)


def render_scene(rng, n_cams=5, hw=256, f=330.0):
    """Render a two-plane textured 3D scene from an arc of cameras —
    a real multi-view dataset with parallax, no external files."""
    # texture pitch tuned to ~3 px/texel on screen for BOTH planes (near
    # plane z=8 spans 4 units, far plane z=13 spans 22 units)
    from regard3d_tpu.kernels.scale_space import gaussian_blur
    tex1 = rng.uniform(0.0, 1.0, size=(24, 24)).astype(np.float32)
    tex2 = rng.uniform(0.0, 1.0, size=(144, 144)).astype(np.float32)
    tex1 = np.asarray(gaussian_blur(jnp.asarray(tex1)[None], 0.6)[0])
    tex2 = np.asarray(gaussian_blur(jnp.asarray(tex2)[None], 0.6)[0])

    z1, z2 = 8.0, 13.0         # plane depths
    # near plane must NOT fill the frustum (it would make pairs planar and
    # E-degenerate): FOV half-extent at z=8 is ~3.1, keep half1 well below
    # near plane small enough that its projection (half1/z1*f ~ 41px)
    # plus the AKAZE descriptor border margin leaves a wide far-plane ring
    half1, half2 = 1.0, 11.0   # plane extents

    Rs, Cs, images = [], [], []
    c = hw / 2.0
    for i in range(n_cams):
        # adjacent-view spacing 0.1 rad: the aliased random texture
        # decorrelates beyond ~15 deg (measured), like real foliage
        a = -0.2 + 0.4 * i / (n_cams - 1)
        R = np.asarray(cameras.exp_so3(jnp.asarray([0.0, a, 0.0])))
        C = np.array([-8 * np.sin(a), 0.0, 8 - 8 * np.cos(a)])
        # rays for each pixel
        ys, xs = np.mgrid[0:hw, 0:hw].astype(np.float32)
        d_cam = np.stack([(xs - c) / f, (ys - c) / f, np.ones_like(xs)], -1)
        d_world = d_cam @ R            # R^T d
        img = np.zeros((hw, hw), np.float32)
        for z, half, tex in ((z1, half1, tex1), (z2, half2, tex2)):
            tmesh = (z - C[2]) / d_world[..., 2]
            px = C[0] + tmesh * d_world[..., 0]
            py = C[1] + tmesh * d_world[..., 1]
            u = (px + half) / (2 * half) * (tex.shape[1] - 1)
            v = (py + half) / (2 * half) * (tex.shape[0] - 1)
            ok = ((tmesh > 0) & (u >= 0) & (u <= tex.shape[1] - 1)
                  & (v >= 0) & (v <= tex.shape[0] - 1))
            u0 = np.clip(u.astype(int), 0, tex.shape[1] - 2)
            v0 = np.clip(v.astype(int), 0, tex.shape[0] - 2)
            fu = u - u0
            fv = v - v0
            val = ((1 - fu) * (1 - fv) * tex[v0, u0]
                   + fu * (1 - fv) * tex[v0, u0 + 1]
                   + (1 - fu) * fv * tex[v0 + 1, u0]
                   + fu * fv * tex[v0 + 1, u0 + 1])
            # nearer plane (z1) overwrites farther: paint far first
            if z == z1:
                img = np.where(ok, val, img)
            else:
                img = np.where(ok & (img == 0), val, img)
        images.append(img)
        Rs.append(R)
        Cs.append(C)
    # paint order: far plane then near — redo properly
    return dict(images=images, Rs=np.stack(Rs), Cs=np.stack(Cs), f=f, hw=hw)


def test_matches_txt_roundtrip(tmp_path):
    m = {(0, 1): np.asarray([[1, 2], [3, 4]]),
         (1, 2): np.asarray([[5, 6]])}
    p = str(tmp_path / "m.txt")
    cm.save_matches_txt(p, m)
    m2 = cm.load_matches_txt(p)
    assert set(m2) == set(m)
    np.testing.assert_array_equal(m2[(0, 1)], m[(0, 1)])


def test_adjacency_svg(tmp_path):
    p = str(tmp_path / "adj.svg")
    cm.adjacency_svg(p, 3, {(0, 1): 10, (1, 2): 5})
    svg = open(p).read()
    assert svg.startswith("<svg") and svg.count("<rect") == 4


def test_feature_artifacts_roundtrip(tmp_path, rng):
    out = str(tmp_path)
    xy = rng.uniform(0, 100, size=(7, 2)).astype(np.float32)
    sc = rng.uniform(1, 5, size=7).astype(np.float32)
    an = rng.uniform(0, 6, size=7).astype(np.float32)
    d = rng.uniform(size=(7, 144)).astype(np.float32)
    fm.save_features(out, 3, xy, sc, an, d)
    xy2, sc2, an2, d2 = fm.load_features(out, 3)
    np.testing.assert_allclose(xy, xy2, rtol=1e-4)
    np.testing.assert_allclose(d, d2, rtol=1e-6)
    assert fm.has_features(out, 3) and not fm.has_features(out, 4)


def test_project_store(tmp_path):
    p = proj_mod.Project.create(str(tmp_path / "proj"))
    ps = p.add_picture_set("shoot1", ["/a/1.jpg", "/a/2.jpg"])
    m = p.add_compute_matches(ps.id, {"ratio": 0.8})
    t = p.add_triangulation(m.id, {"engine": "incremental2"})
    d = p.prepare(m.id)
    assert os.path.isdir(d)
    p.finish(m.id, {"pairs": 1}, 12.5)

    p2 = proj_mod.Project.load(str(tmp_path / "proj"))
    assert p2.objects[m.id].state == proj_mod.STATE_FINISHED
    assert p2.objects[m.id].results == {"pairs": 1}
    assert p2.objects[t.id].params["engine"] == "incremental2"
    paths = p2.paths(t.id)
    assert paths.matches_dir.endswith(f"matches_{m.id}")
    # subtree removal
    p2.remove(ps.id)
    assert not p2.objects
    missing = proj_mod.Project.load(str(tmp_path / "proj"))
    assert not missing.objects


@pytest.mark.slow
def test_full_pipeline_on_rendered_scene(tmp_path, rng):
    scene = render_scene(rng)
    out = str(tmp_path / "matches")
    stats = cm.run_compute_matches(
        scene["images"], out, threshold=0.0001,
        cfg=cm.MatchConfig(ransac_iters=512),
        focals=np.full(len(scene["images"]), scene["f"]),
        max_keypoints=2048)
    assert stats["pairs_f"] >= 4, stats
    assert os.path.exists(os.path.join(out, "matches.f.txt"))
    assert os.path.exists(os.path.join(out, "PutativeAdjacencyMatrix.svg"))

    V = len(scene["images"])
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [scene["f"], scene["hw"] / 2, scene["hw"] / 2]
    tri_out = str(tmp_path / "tri")
    tstats = ts.run_triangulation(
        out, tri_out, scene["images"],
        intr_id=np.zeros(V, np.int32), intr=intr,
        models=np.asarray([PINHOLE], np.int32),
        params=ts.TriangulationParams(engine="incremental",
                                      initial_pair=(2, 3),
                                      refine_intrinsics=False))
    assert tstats["num_cameras"] >= 4, tstats
    assert tstats["rms_px"] < 1.5, tstats
    for fn in ("scene.npz", "sfm_data.json", "cloud_and_poses.ply",
               "FinalColorized.ply", "Reconstruction_Report.html"):
        assert os.path.exists(os.path.join(tri_out, fn)), fn

    # trajectory check vs ground truth
    from regard3d_tpu.core.sfm_data import load_npz
    s = load_npz(os.path.join(tri_out, "scene.npz"))
    pm = np.asarray(s.poses.mask)
    ate = metrics.ate_rmse(np.asarray(s.poses.C)[pm], scene["Cs"][pm])
    assert ate < 0.15, ate     # scene scale ~8


def test_feature_cache_resume(tmp_path, rng):
    """Second run must reuse cached .feat/.desc artifacts (resume parity)."""
    import time
    from regard3d_tpu.pipeline import features as fm2
    imgs = [rng.uniform(size=(64, 64)).astype(np.float32) for _ in range(2)]
    out = str(tmp_path)
    c1 = fm2.extract_features(imgs, out, threshold=0.001, max_keypoints=128)
    stamp = os.path.getmtime(fm2.feat_path(out, 0))
    time.sleep(0.05)
    c2 = fm2.extract_features(imgs, out, threshold=0.001, max_keypoints=128)
    assert c1 == c2
    assert os.path.getmtime(fm2.feat_path(out, 0)) == stamp  # untouched
    # force=True regenerates
    fm2.extract_features(imgs, out, threshold=0.001, max_keypoints=128,
                         force=True)
    assert os.path.getmtime(fm2.feat_path(out, 0)) > stamp


def test_stage_sfm_data(tmp_path):
    from regard3d_tpu.pipeline.compute_matches import write_stage_sfm_data
    sizes = np.asarray([[640, 480], [640, 480]])
    write_stage_sfm_data(str(tmp_path), sizes, np.asarray([500.0, 510.0]),
                         ["a.jpg", "b.jpg"])
    d = json.load(open(os.path.join(str(tmp_path), "sfm_data.json")))
    assert len(d["views"]) == 2 and len(d["intrinsics"]) == 2
    assert d["intrinsics"][0]["value"]["data"]["focal_length"] == 500.0
    lists = open(os.path.join(str(tmp_path), "lists.txt")).read().splitlines()
    assert lists[0] == "a.jpg;640;480"


@pytest.mark.medium
def test_triangulation_driver_global_engine(tmp_path, rng):
    """Drive run_triangulation(engine=global) from synthetic artifacts."""
    import sys
    from tests.test_incremental import synth_scene
    from regard3d_tpu.pipeline import features as fm2
    scene = synth_scene(rng, n_cams=6, visibility=0.9, noise_px=0.15)
    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    for v, (ids, uv) in enumerate(scene["feats"]):
        desc = np.zeros((len(uv), 144), np.float32)
        fm2.save_features(mdir, v, uv, np.full(len(uv), 8.0),
                          np.zeros(len(uv)), desc)
    cm.save_matches_txt(os.path.join(mdir, "matches.e.txt"),
                        scene["matches"])
    out = str(tmp_path / "t")
    V = 6
    images = [np.full((scene["h"], scene["w"]), 0.5, np.float32)] * V
    stats = ts.run_triangulation(
        mdir, out, images,
        intr_id=np.zeros(V, np.int32), intr=scene["intr"],
        models=np.asarray([scene["model"]], np.int32),
        params=ts.TriangulationParams(engine="global",
                                      rotation_averaging="l2",
                                      translation_averaging="softl1",
                                      refine_intrinsics=False,
                                      min_pair_matches=15))
    assert stats["num_cameras"] == 6, stats
    assert stats["rms_px"] < 1.0, stats
    assert os.path.exists(os.path.join(out, "sfm_data.json"))


def test_best_validated_pairs(tmp_path):
    # getBestValidatedPairs parity (OpenMVGHelper.cpp:273-419): ranked by
    # geometric match count, with putative counts + survival ratios.
    from regard3d_tpu.pipeline import compute_matches as cm
    put = {(0, 1): np.zeros((100, 2), np.int64),
           (0, 2): np.zeros((80, 2), np.int64),
           (1, 2): np.zeros((60, 2), np.int64)}
    geo = {(0, 1): np.zeros((90, 2), np.int64),
           (0, 2): np.zeros((20, 2), np.int64),
           (1, 2): np.zeros((55, 2), np.int64)}
    cm.save_matches_txt(str(tmp_path / "matches.putative.txt"), put)
    cm.save_matches_txt(str(tmp_path / "matches.f.txt"), geo)
    rows = cm.best_validated_pairs(str(tmp_path))
    assert [(r["i"], r["j"]) for r in rows] == [(0, 1), (1, 2), (0, 2)]
    assert rows[0]["putative"] == 100
    assert abs(rows[0]["survival"] - 0.9) < 1e-9
    top = cm.best_validated_pairs(str(tmp_path), limit=1)
    assert len(top) == 1 and top[0]["geometric"] == 90


def test_html_reports(tmp_path):
    # Generate_SfM_Report parity: per-view table + residual histogram SVG;
    # matching report: per-pair count tables.
    from regard3d_tpu.pipeline import report
    p = str(tmp_path / "recon.html")
    report.write_html_report(
        p, {"num_cameras": 3, "rms_px": 0.5, "order_added": [0, 1, 2]},
        params={"engine": "incremental2"},
        views=[{"id": 0, "name": "a.jpg", "width": 640, "height": 480,
                "posed": True, "n_obs": 100, "mean_px": 0.4,
                "median_px": 0.3},
               {"id": 1, "name": "b.jpg", "width": 640, "height": 480,
                "posed": False, "n_obs": 0, "mean_px": float("nan"),
                "median_px": float("nan")}],
        histogram=([0.0, 1.0, 2.0], [10, 3]))
    html = open(p).read()
    assert "a.jpg" in html and "<svg" in html and "0 &rarr; 1" in html
    assert "incremental2" in html and "num_cameras" in html

    m = str(tmp_path / "match.html")
    report.write_matches_report(
        m, {"num_pairs": 2},
        [{"i": 0, "j": 1, "putative": 50, "geometric": 40,
          "survival": 0.8}],
        keypoint_counts=[100, 200], image_names=["a.jpg", "b.jpg"])
    html = open(m).read()
    assert "b.jpg" in html and "0.80" in html and "num_pairs" in html


@pytest.mark.medium
def test_release_memory_identical_artifacts(tmp_path, rng):
    """release_memory=True (bench_scale's stage-boundary cache drop,
    runtime.release_stage_memory) must not change any artifact: the cleared
    compiled-program caches are an optimization layer only, and per-pair
    RANSAC keys make the filters deterministic across recompiles."""
    scene = render_scene(rng, n_cams=3)
    outs = []
    for tag, rel in (("a", False), ("b", True)):
        out = str(tmp_path / tag)
        cm.run_compute_matches(
            scene["images"], out, threshold=0.0001,
            cfg=cm.MatchConfig(ransac_iters=64),
            focals=np.full(len(scene["images"]), scene["f"]),
            max_keypoints=1024, release_memory=rel)
        outs.append(out)
    for fn in ("matches.putative.txt", "matches.f.txt", "matches.e.txt"):
        with open(os.path.join(outs[0], fn)) as fa, \
                open(os.path.join(outs[1], fn)) as fb:
            assert fa.read() == fb.read(), fn
