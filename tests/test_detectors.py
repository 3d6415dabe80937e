"""Secondary detector tests: GFTT / ORB / BRISK (JAX) and MSER / TBMR
(native component tree) — the experimental detector menu of
``Regard3DFeatures::detectKeypoints`` (src/Regard3DFeatures.cpp:574-683)."""

import numpy as np
import jax.numpy as jnp
import pytest

from regard3d_tpu.kernels import corners


def _rect_image():
    img = np.zeros((128, 160), np.float32)
    img[40:90, 50:120] = 1.0
    return img


RECT_CORNERS = np.array([[50, 40], [119, 40], [50, 89], [119, 89]], float)


def _covers_corners(xy, tol=3.0):
    for c in RECT_CORNERS:
        d = np.sqrt(((xy - c) ** 2).sum(1)).min()
        assert d <= tol, f"corner {c} missed (nearest {d:.1f}px)"


class TestGFTT:
    def test_rectangle_corners(self):
        kps = corners.detect_gftt(jnp.asarray(_rect_image()[None]),
                                  max_keypoints=64)
        m = np.asarray(kps.mask[0])
        xy = np.asarray(kps.xy[0])[m]
        assert len(xy) >= 4
        _covers_corners(xy, tol=1.5)
        # GFTT parity: size = blockSize = 3, angle undefined
        assert np.allclose(np.asarray(kps.scale[0])[m], 3.0)

    def test_quality_level_gate(self):
        # a weak second-order corner below qualityLevel*max must be dropped
        img = _rect_image()
        img[10:14, 10:14] += 0.002     # tiny bump
        kps = corners.detect_gftt(jnp.asarray(img[None]), max_keypoints=64,
                                  quality_level=0.5)
        xy = np.asarray(kps.xy[0])[np.asarray(kps.mask[0])]
        assert np.all(xy[:, 0] > 40)   # only the strong rectangle corners

    def test_batch_padding_mask(self):
        # second image is padding (zero true size) -> no keypoints
        img = np.stack([_rect_image(), _rect_image()])
        kps = corners.detect_gftt(jnp.asarray(img),
                                  widths=jnp.asarray([160, 0]),
                                  heights=jnp.asarray([128, 0]),
                                  max_keypoints=32)
        assert bool(np.any(np.asarray(kps.mask[0])))
        assert not bool(np.any(np.asarray(kps.mask[1])))


class TestFAST:
    def test_segment_test_edge_vs_corner(self):
        img = jnp.asarray(_rect_image()[None])
        score = np.asarray(corners.fast_score(img, 20.0 / 255.0))[0]
        # corner pixels respond
        assert score[41, 51] > 0
        # a straight-edge midpoint must NOT pass the 9-of-16 test
        assert score[40, 85] == 0.0
        assert score[65, 50] == 0.0
        # flat interior
        assert score[65, 85] == 0.0

    def test_score_is_max_passing_threshold(self):
        img = jnp.asarray(_rect_image()[None])
        s_low = np.asarray(corners.fast_score(img, 0.1))[0]
        # binary image: score at corners equals the full contrast
        assert np.isclose(s_low.max(), 1.0)


class TestORB:
    def test_rectangle_corners_and_sizes(self):
        kps = corners.detect_orb(jnp.asarray(_rect_image()[None]),
                                 max_keypoints=256)
        m = np.asarray(kps.mask[0])
        xy = np.asarray(kps.xy[0])[m]
        _covers_corners(xy)
        # cv::ORB size = 31 * 1.2^level
        sizes = np.unique(np.round(np.asarray(kps.scale[0])[m], 2))
        assert 31.0 in sizes

    def test_ic_angle_orientation(self):
        # top-left corner of a bright rectangle: centroid points down-right
        # => cv angle 45 deg; internal convention subtracts pi/2
        kps = corners.detect_orb(jnp.asarray(_rect_image()[None]),
                                 max_keypoints=256)
        m = np.asarray(kps.mask[0])
        xy = np.asarray(kps.xy[0])[m]
        ang = np.asarray(kps.angle[0])[m]
        i = np.argmin(np.abs(xy - [50, 40]).sum(1))
        cv_deg = np.degrees(ang[i] + np.pi / 2)
        assert abs(cv_deg - 45.0) < 10.0

    def test_level_budgets(self):
        b = corners.orb_levels_distribution(500, 8, 1.2)
        assert len(b) == 8 and sum(b) == 500
        assert b[0] > b[1] > b[2]      # geometric decay


class TestBRISK:
    def test_rectangle_corners_multiscale(self):
        kps = corners.detect_brisk(jnp.asarray(_rect_image()[None]),
                                   max_keypoints=256)
        m = np.asarray(kps.mask[0])
        xy = np.asarray(kps.xy[0])[m]
        _covers_corners(xy)
        # cv::BRISK size = 12 * layer scale (c/d layer ladder)
        sizes = set(np.round(np.asarray(kps.scale[0])[m], 1))
        assert 12.0 in sizes


class TestNativeRegions:
    def _img(self):
        rng = np.random.default_rng(0)
        img = (rng.normal(0, 2, (120, 160)) + 60).astype(np.uint8)
        yy, xx = np.mgrid[:120, :160]
        img[((xx - 80) / 30.0) ** 2 + ((yy - 60) / 15.0) ** 2 < 1] = 220
        img[20:40, 20:40] = 5
        return img

    def test_mser_finds_blobs(self):
        from regard3d_tpu import native
        rows = native.mser(self._img())
        if rows is None:
            pytest.skip("native library unavailable")
        assert len(rows) >= 2
        # bright ellipse: center (80, 60), area ~pi*30*15
        d = np.abs(rows[:, :2] - [80, 60]).sum(1)
        ell = rows[np.argmin(d)]
        assert np.abs(ell[0] - 80) < 2 and np.abs(ell[1] - 60) < 2
        assert 1200 < ell[3] < 1600
        # dark square via the inverted polarity: center (29.5, 29.5), 400px
        d = np.abs(rows[:, :2] - [29.5, 29.5]).sum(1)
        sq = rows[np.argmin(d)]
        assert np.abs(sq[3] - 400) < 20
        assert np.abs(sq[2] - 20) < 2        # kp size = (bw + bh)/2

    def test_mser_area_bounds(self):
        from regard3d_tpu import native
        rows = native.mser(self._img(), min_area=60, max_area=500)
        if rows is None:
            pytest.skip("native library unavailable")
        assert np.all(rows[:, 3] <= 500)
        assert np.all(rows[:, 3] >= 60)

    def test_tbmr_ellipse_moments(self):
        from regard3d_tpu import native
        # clean image, generous area cap so the ellipse itself qualifies
        img = np.full((120, 160), 60, np.uint8)
        yy, xx = np.mgrid[:120, :160]
        img[((xx - 80) / 30.0) ** 2 + ((yy - 60) / 15.0) ** 2 < 1] = 220
        img[((xx - 80) / 20.0) ** 2 + ((yy - 60) / 10.0) ** 2 < 1] = 240
        rows = native.tbmr(img, minimum_size=30, maximum_relative_area=0.5)
        if rows is None:
            pytest.skip("native library unavailable")
        assert len(rows) >= 1
        d = np.abs(rows[:, :2] - [80, 60]).sum(1)
        r = rows[np.argmin(d)]
        assert np.abs(r[0] - 80) < 1.5 and np.abs(r[1] - 60) < 1.5
        # semi-axes 2*sqrt(eig(cov)) of a filled ellipse = true semi-axes
        assert r[2] > r[3] > 0
        assert np.abs(r[4]) < 0.2            # major axis horizontal

    def test_pipeline_detector_dispatch(self, tmp_path):
        from regard3d_tpu.pipeline import features as feat_mod
        rng = np.random.default_rng(1)
        img = rng.uniform(0.2, 0.8, (96, 128)).astype(np.float32)
        img[30:60, 40:90] += 0.3
        for det in ("gftt", "mser"):
            out = tmp_path / det
            counts = feat_mod.extract_features(
                [img], str(out), detector=det, max_keypoints=512)
            assert counts[0] > 0
            xy, scale, angle, desc = feat_mod.load_features(str(out), 0)
            assert desc.shape[1] == feat_mod.LIOP_DIM
            # LIOP descriptors are unit-norm where defined
            norms = np.linalg.norm(desc, axis=1)
            assert np.all((norms < 1.01) & (norms > 0.2))

    def test_canonical_names(self):
        from regard3d_tpu.pipeline import features as feat_mod
        assert feat_mod.canonical_detector("Classic A-KAZE") == "akaze"
        assert feat_mod.canonical_detector("Fast A-KAZE") == "fast-akaze"
        assert feat_mod.detector_kp_size_factor("orb") == 0.025
        assert feat_mod.detector_kp_size_factor("fast-akaze") == 8.0
        with pytest.raises(ValueError):
            feat_mod.canonical_detector("sift")
