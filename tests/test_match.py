import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.kernels import match


def make_descs(rng, m, n, d=256, planted=32):
    """Random descriptors with `planted` near-duplicates so real matches exist."""
    a = rng.normal(size=(m, d)).astype(np.float32)
    b = rng.normal(size=(n, d)).astype(np.float32)
    # plant correspondences: b[i] ~= a[i] for i < planted
    b[:planted] = a[:planted] + 0.01 * rng.normal(size=(planted, d))
    return jnp.asarray(a), jnp.asarray(b)


def test_sqdist_matches_numpy(rng):
    a, b = make_descs(rng, 64, 48, d=16, planted=0)
    d = np.asarray(match.sqdist(a, b))
    ref = ((np.asarray(a)[:, None, :] - np.asarray(b)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-3)


def test_match_pair_ref_finds_planted(rng):
    a, b = make_descs(rng, 128, 96, planted=32)
    mask_a = jnp.ones((128,), bool)
    mask_b = jnp.ones((96,), bool)
    idx, d1, ok = match.match_pair_ref(a, mask_a, b, mask_b, ratio=0.8)
    idx, ok = np.asarray(idx), np.asarray(ok)
    # planted correspondences must be found
    assert ok[:32].all()
    np.testing.assert_array_equal(idx[:32], np.arange(32))
    # random rows should mostly fail the ratio test
    assert ok[32:].mean() < 0.2


def test_masked_b_never_matched(rng):
    a, b = make_descs(rng, 64, 64, planted=16)
    mask_a = jnp.ones((64,), bool)
    mask_b = jnp.asarray(np.arange(64) < 8)   # only first 8 b valid
    idx, d1, ok = match.match_pair_ref(a, mask_a, b, mask_b, ratio=0.9)
    assert np.asarray(idx)[np.asarray(ok)].max(initial=0) < 8


def test_pallas_matches_reference(rng):
    m, n = 256, 512
    a, b = make_descs(rng, m, n, planted=64)
    mask_b = jnp.asarray(np.arange(n) < 500)
    d1p, i1p, d2p = match.l2_top2_pallas(a, b, mask_b, tile_m=128, tile_n=128)
    d = match.sqdist(a, b)
    d = jnp.where(mask_b[None, :], d, match._BIG)
    vals, i1r = match.top2_ref(d)
    np.testing.assert_array_equal(np.asarray(i1p), np.asarray(i1r))
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(vals[:, 0]),
                               atol=1e-2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(vals[:, 1]),
                               atol=1e-2, rtol=1e-5)


def test_match_pair_pallas_vs_ref_end_to_end(rng):
    m, n = 256, 512
    a, b = make_descs(rng, m, n, planted=64)
    mask_a = jnp.asarray(np.arange(m) < 200)
    mask_b = jnp.ones((n,), bool)
    i_ref, d_ref, ok_ref = match.match_pair(a, mask_a, b, mask_b, 0.8,
                                            use_pallas=False)
    i_pl, d_pl, ok_pl = match.match_pair(a, mask_a, b, mask_b, 0.8,
                                         use_pallas=True, tile_m=128,
                                         tile_n=128)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pl))
    ok = np.asarray(ok_ref)
    np.testing.assert_array_equal(np.asarray(i_ref)[ok], np.asarray(i_pl)[ok])


def test_mutual_filter(rng):
    a, b = make_descs(rng, 64, 64, planted=32)
    ones = jnp.ones((64,), bool)
    iab, _, okab = match.match_pair_ref(a, ones, b, ones, 0.9)
    iba, _, okba = match.match_pair_ref(b, ones, a, ones, 0.9)
    keep = np.asarray(match.mutual_filter(iab, okab, iba, okba))
    assert keep[:32].all()
    # mutual consistency: surviving matches map back to themselves
    iab, iba = np.asarray(iab), np.asarray(iba)
    assert (iba[iab[keep]] == np.arange(64)[keep]).all()


def test_batched_matches(rng):
    P, m, n = 3, 128, 128
    As, Bs = [], []
    for _ in range(P):
        a, b = make_descs(rng, m, n, planted=16)
        As.append(a); Bs.append(b)
    A = jnp.stack(As); B = jnp.stack(Bs)
    mask = jnp.ones((P, m), bool)
    idx, d1, ok = match.match_pairs_batched(A, mask, B, mask, 0.8, False,
                                            128, 128)
    assert idx.shape == (P, m)
    for p in range(P):
        np.testing.assert_array_equal(np.asarray(idx[p, :16]), np.arange(16))
