"""Mesh-sharded matching + batched geometric filter (SURVEY §2.3 P2).

Equivalence gates: the sharded pair-block matcher and the vmapped/sharded
ACRANSAC block filter must reproduce the single-device host-loop results;
the bf16 fast preset must agree with f32 after the ratio test."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.dist import mesh as mesh_mod
from regard3d_tpu.kernels import match as match_mod
from regard3d_tpu.kernels import ransac
from regard3d_tpu.pipeline import compute_matches as cm


class _Padded:
    def __init__(self, data, mask):
        self.data = data
        self.mask = mask


def _fake_features(rng, B=6, N=128, D=64, overlap=48):
    """B images; consecutive images share `overlap` descriptors (noisy)."""
    base = rng.normal(size=(B + 1, N, D)).astype(np.float32)
    descs = base[:B].copy()
    for i in range(B - 1):
        descs[i + 1, :overlap] = (descs[i, :overlap]
                                  + 0.01 * rng.normal(size=(overlap, D)))
    mask = np.ones((B, N), bool)
    mask[:, N - 8:] = False          # ragged tails
    xy = rng.uniform(0, 256, size=(B, N, 2)).astype(np.float32)
    return _Padded(jnp.asarray(descs), jnp.asarray(mask)), xy


def test_sharded_matching_equals_single_device(rng):
    descs, _ = _fake_features(rng)
    cfg = cm.MatchConfig(ratio=0.8)
    single = cm.match_all_pairs(None, descs, cfg, mesh=None)
    mesh = mesh_mod.make_mesh("pairs")
    assert mesh.shape["pairs"] == 8
    sharded = cm.match_all_pairs(None, descs, cfg, mesh=mesh)
    assert single.keys() == sharded.keys()
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k])


def test_sharded_matching_mutual(rng):
    descs, _ = _fake_features(rng)
    cfg = cm.MatchConfig(ratio=0.8, mutual=True)
    single = cm.match_all_pairs(None, descs, cfg, mesh=None)
    sharded = cm.match_all_pairs(None, descs, cfg,
                                 mesh=mesh_mod.make_mesh("pairs"))
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k])


def test_bf16_fast_preset_agrees_with_f32(rng):
    """matcher preset -> precision knob: bf16 matches must agree with f32
    after the ratio test on realistic (unit-norm LIOP-like) descriptors."""
    descs, _ = _fake_features(rng, B=4, N=256, D=128)
    data = np.array(descs.data)
    data /= np.linalg.norm(data, axis=-1, keepdims=True) + 1e-12
    descs = _Padded(jnp.asarray(data), descs.mask)
    precise = cm.match_all_pairs(None, descs,
                                 cm.MatchConfig(matcher="brute-force"))
    fast = cm.match_all_pairs(None, descs,
                              cm.MatchConfig(matcher="kgraph-fast"))
    assert cm.matcher_knobs("kgraph-fast")["bf16"] is True
    assert cm.matcher_knobs("hnsw-precise")["bf16"] is False
    total = agree = 0
    for k in precise:
        a = {tuple(r) for r in precise[k]}
        b = {tuple(r) for r in fast[k]}
        total += max(len(a), 1)
        agree += len(a & b)
    assert agree / total > 0.95


class _KP:
    def __init__(self, xy):
        self.xy = xy


@pytest.mark.medium
def test_batched_filter_equals_host_loop(rng):
    """The blocked/sharded geometric filter reproduces the per-pair filter
    results (same seeds feed the same per-pair RANSAC draws is NOT required
    — we gate on identical inlier structure from a clean problem)."""
    from regard3d_tpu.core import cameras
    hw, f, n_pts = 256, 300.0, 80
    X = rng.uniform(-2, 2, size=(n_pts, 3)) + [0, 0, 6]
    R = np.asarray(cameras.exp_so3(jnp.asarray([0.0, 0.15, 0.0])))
    C = np.array([0.8, 0.0, 0.0])
    x1 = X[:, :2] / X[:, 2:] * f + hw / 2
    Xc = (X - C) @ R
    x2 = Xc[:, :2] / Xc[:, 2:] * f + hw / 2
    n_out = 16
    x2[:n_out] = rng.uniform(0, hw, size=(n_out, 2))

    xy = np.zeros((2, 128, 2), np.float32)
    xy[0, :n_pts] = x1
    xy[1, :n_pts] = x2
    putative = {(0, 1): np.stack([np.arange(n_pts)] * 2, -1)}
    sizes = np.full((2, 2), hw, np.float64)
    focals = np.full((2,), f)
    cfg = cm.MatchConfig(ransac_iters=512, e_min_matches=30)

    res = cm.geometric_filter(_KP(xy), putative, sizes, focals, cfg)
    mesh = mesh_mod.make_mesh("pairs")
    res_sh = cm.geometric_filter(_KP(xy), putative, sizes, focals, cfg,
                                 mesh=mesh)
    # inliers must be the true correspondences (outliers rejected)
    for r in (res, res_sh):
        assert (0, 1) in r.f and (0, 1) in r.e
        for d in (r.f, r.e):
            got = set(d[(0, 1)][:, 0])
            n_false = len(got & set(range(n_out)))
            assert n_false <= 2
            assert len(got) >= 0.9 * (n_pts - n_out)
    np.testing.assert_array_equal(res.f[(0, 1)], res_sh.f[(0, 1)])
    np.testing.assert_array_equal(res.e[(0, 1)], res_sh.e[(0, 1)])


@pytest.mark.slow
def test_sharded_matching_throughput(rng):
    """Measured matched-pairs/s at 1 vs 8 virtual devices (informational;
    CPU virtual devices share cores so we only gate on completion)."""
    descs, _ = _fake_features(rng, B=12, N=256, D=128)
    cfg = cm.MatchConfig()
    for mesh in (None, mesh_mod.make_mesh("pairs")):
        cm.match_all_pairs(None, descs, cfg, mesh=mesh)    # warm
        t0 = time.time()
        out = cm.match_all_pairs(None, descs, cfg, mesh=mesh)
        dt = time.time() - t0
        n = len(out)
        print(f"mesh={'8dev' if mesh else '1dev'}: "
              f"{n / dt:.1f} matched pairs/s")


@pytest.mark.medium
def test_feature_extraction_image_sharding(tmp_path, rng):
    # P1 image-batch DP: sharding the bucket batch dim over an `images`
    # mesh must reproduce the single-device features exactly
    import jax
    from jax.sharding import Mesh
    from regard3d_tpu.pipeline import features as fm

    imgs = [rng.uniform(0, 1, size=(192, 256)).astype(np.float32)
            for _ in range(5)]
    d1 = str(tmp_path / "one")
    d8 = str(tmp_path / "eight")
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("images",))
    mesh8 = Mesh(np.asarray(jax.devices()), ("images",))
    c1 = fm.extract_features(imgs, d1, mesh=mesh1)
    c8 = fm.extract_features(imgs, d8, mesh=mesh8)
    assert c1 == c8
    for i in range(5):
        xy1, s1, a1, de1 = fm.load_features(d1, i)
        xy8, s8, a8, de8 = fm.load_features(d8, i)
        # partitioned compilation reorders float ops: ULP-level slack, and
        # a near-tied suppression duel can flip for isolated keypoints —
        # require elementwise agreement for (almost) all entries
        np.testing.assert_allclose(xy1, xy8, atol=2e-3)
        frac_bad = float((np.abs(de1 - de8) > 1e-4).mean())
        assert frac_bad < 1e-3, frac_bad
        np.testing.assert_allclose(de1, de8, atol=1e-2)
