import os

import numpy as np

from regard3d_tpu.pipeline import preview, settings
from regard3d_tpu.sfm.tracks import TrackTable


def test_draw_keypoints(rng):
    img = rng.uniform(size=(60, 80)).astype(np.float32)
    xy = rng.uniform(5, 50, size=(10, 2))
    sizes = rng.uniform(4, 10, size=10)
    angles = rng.uniform(0, 6.28, size=10)
    im = preview.draw_keypoints(img, xy, sizes, angles)
    assert im.size == (80, 60)
    assert np.asarray(im).shape == (60, 80, 3)
    # drawing happened: output differs from the gray input
    gray3 = np.stack([(img * 255).astype(np.uint8)] * 3, -1)
    assert (np.asarray(im) != gray3).any()


def test_draw_matches(rng):
    im1 = rng.uniform(size=(40, 50)).astype(np.float32)
    im2 = rng.uniform(size=(48, 30)).astype(np.float32)
    xy1 = rng.uniform(0, 40, size=(5, 2))
    xy2 = rng.uniform(0, 25, size=(5, 2))
    m = np.asarray([[0, 1], [2, 3]])
    canvas = preview.draw_matches(im1, xy1, im2, xy2, m)
    assert canvas.size == (80, 48)


def test_filter_matches_to_tracks():
    table = TrackTable(
        track_id=np.asarray([0, 0, 0, 1, 1], np.int32),
        view_id=np.asarray([0, 1, 2, 0, 1], np.int32),
        feature_id=np.asarray([7, 8, 9, 3, 4], np.int32),
        num_tracks=2)
    matches = np.asarray([[7, 8], [3, 4], [5, 6]])
    out = preview.filter_matches_to_tracks(matches, 0, 1, table)
    # only track 0 spans >2 views; its (7,8) match survives
    np.testing.assert_array_equal(out, [[7, 8]])


def test_svg_exports(tmp_path, rng):
    xy = rng.uniform(0, 100, size=(5, 2))
    p1 = str(tmp_path / "k.svg")
    preview.keypoints_svg(p1, "im.jpg", 100, 80, xy, np.full(5, 6.0))
    svg = open(p1).read()
    assert svg.count("<circle") == 5
    p2 = str(tmp_path / "m.svg")
    preview.matches_svg(p2, "a.jpg", "b.jpg", 100, 80, 100, 80,
                        xy, xy, np.asarray([[0, 1], [2, 3]]))
    assert open(p2).read().count("<line") == 2


def test_settings_roundtrip(tmp_path):
    p = str(tmp_path / "s.json")
    s = settings.Settings(p)
    assert s.get("max_keypoints") == 4096
    s.set("max_keypoints", 2048)
    s.set("external_programs_dir", "/opt/mvs")
    s.save()
    s2 = settings.Settings(p)
    assert s2.get("max_keypoints") == 2048
    assert s2.get("external_programs_dir") == "/opt/mvs"
    # corrupt file -> defaults survive
    with open(p, "w") as f:
        f.write("{broken")
    s3 = settings.Settings(p)
    assert s3.get("max_keypoints") == 4096


def test_scene_snapshots_svg(rng):
    """Static scene renders (headless stand-in for the reference's OSG
    viewer): points + frusta from 3 orthographic views, inline SVG."""
    from regard3d_tpu.pipeline.report import scene_snapshots_svg
    V, L = 4, 200
    C = rng.normal(size=(V, 3))
    R = np.broadcast_to(np.eye(3), (V, 3, 3)).copy()
    pm = np.ones(V, bool)
    X = rng.normal(size=(L, 3)) * [2, 1, 1] + [0, 0, 8]
    lm = rng.uniform(size=L) > 0.2
    colors = rng.uniform(size=(L, 3))
    html = scene_snapshots_svg(C, R, pm, X, lm, colors=colors)
    assert html.count("<svg") == 3
    assert "top (X-Z)" in html and "front (X-Y)" in html
    assert html.count("<line") == 3 * V * 8       # 8 edges per frustum
    assert "<rect" in html

    # empty scene -> empty snippet, not an error
    assert scene_snapshots_svg(C, R, np.zeros(V, bool), X,
                               np.zeros(L, bool)) == ""


def test_report_with_snapshots(tmp_path, rng):
    from regard3d_tpu.pipeline.report import (scene_snapshots_svg,
                                              write_html_report)
    C = rng.normal(size=(2, 3)); R = np.broadcast_to(np.eye(3), (2, 3, 3))
    X = rng.normal(size=(50, 3))
    snaps = scene_snapshots_svg(C, R, np.ones(2, bool), X,
                                np.ones(50, bool))
    path = str(tmp_path / "r.html")
    write_html_report(path, {"num_cameras": 2}, snapshots=snaps)
    body = open(path).read()
    assert "<h2>Scene</h2>" in body and "<svg" in body
