import itertools

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Keypoints
from regard3d_tpu.kernels import liop


def liop_oracle(patch):
    """Straightforward NumPy LIOP (vl_liop semantics) as a test oracle."""
    L = liop.PATCH_SIZE
    flat = patch.reshape(-1)
    px, py = liop._PX, liop._PY
    p_int = flat[px + py * L]
    thr = liop.INTENSITY_THRESHOLD * (p_int.max() - p_int.min())
    order = np.argsort(p_int, kind="stable")
    bin_area = len(px) // liop.NUM_SPATIAL_BINS
    desc = np.zeros(liop.LIOP_DIM, np.float32)
    for i, pix in enumerate(order):
        sbin = min(i // bin_area, liop.NUM_SPATIAL_BINS - 1)
        # bilinear neighbour samples with zero-outside-border
        n_int = np.zeros(4)
        for t in range(4):
            x, y = liop._NX[pix, t], liop._NY[pix, t]
            ix, iy = int(np.floor(x)), int(np.floor(y))
            wx, wy = x - ix, y - iy
            a = flat[ix + iy * L] if (0 <= ix and 0 <= iy and ix < L and iy < L) else 0.0
            b = flat[ix + 1 + iy * L] if (ix < L - 1 and 0 <= iy and ix + 1 >= 0 and iy < L) else 0.0
            c = flat[ix + (iy + 1) * L] if (0 <= ix and iy < L - 1 and ix < L) else 0.0
            d = flat[ix + 1 + (iy + 1) * L] if (ix < L - 1 and iy < L - 1 and ix + 1 >= 0) else 0.0
            n_int[t] = (1 - wy) * (a + (b - a) * wx) + wy * (c + (d - c) * wx)
        perm = list(np.argsort(n_int, kind="stable"))
        # Lehmer index
        idx = 0
        p = perm.copy()
        for i2 in range(4):
            idx = idx * (4 - i2) + p[i2]
            for j2 in range(i2 + 1, 4):
                if p[j2] > p[i2]:
                    p[j2] -= 1
        w = sum(1.0 for k, t in itertools.combinations(range(4), 2)
                if abs(n_int[k] - n_int[t]) > thr)
        desc[sbin * 24 + idx] += w
    n = np.linalg.norm(desc)
    return desc / max(n, 1e-12)


def test_liop_matches_oracle(rng):
    patch = rng.uniform(size=(41, 41)).astype(np.float32)
    got = np.asarray(liop.liop_from_patch(jnp.asarray(patch)))
    want = liop_oracle(patch)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_liop_smooth_patch_matches_oracle(rng):
    # smooth patch (fewer ties, more realistic)
    x = np.linspace(-1, 1, 41)
    xx, yy = np.meshgrid(x, x)
    patch = (np.sin(3 * xx) * np.cos(4 * yy)
             + 0.1 * rng.normal(size=(41, 41))).astype(np.float32)
    got = np.asarray(liop.liop_from_patch(jnp.asarray(patch)))
    want = liop_oracle(patch)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_liop_unit_norm(rng):
    patch = rng.uniform(size=(41, 41)).astype(np.float32)
    d = np.asarray(liop.liop_from_patch(jnp.asarray(patch)))
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    assert (d >= 0).all()


def test_lehmer_index_bijective():
    # the jax permutation-index computation must be a bijection over S4
    vals = []
    for perm in itertools.permutations(range(4)):
        n_int = np.zeros((1, 4), np.float32)
        for rank, t in enumerate(perm):
            n_int[0, t] = rank  # neighbour t has this intensity rank
        # replicate the kernel's index computation
        p = jnp.argsort(jnp.asarray(n_int), axis=-1).astype(jnp.int32)
        p0, p1, p2 = p[:, 0], p[:, 1], p[:, 2]
        d1 = p1 - (p1 > p0)
        d2 = p2 - (p2 > p0).astype(jnp.int32) - (p2 > p1).astype(jnp.int32)
        vals.append(int(((p0 * 3 + d1) * 2 + d2)[0]))
    assert sorted(vals) == list(range(24))


def test_warp_patch_identity():
    # keypoint with angle giving theta=-pi -> patch is a rotated copy;
    # check center value matches the image at the keypoint
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(128, 128)), jnp.float32)
    xy = jnp.asarray([[64.0, 64.0]])
    size = jnp.asarray([41.0 / 8.0])  # scale = size/41*8 = 1
    angle = jnp.asarray([0.0])
    p = liop.warp_patches(img, xy, size, angle, 8.0)
    assert p.shape == (1, 41, 41)
    np.testing.assert_allclose(float(p[0, 20, 20]), float(img[64, 64]),
                               atol=1e-5)


def test_descriptor_rotation_invariance(rng):
    """LIOP is rotation invariant: describing a rotated image with a
    correspondingly rotated keypoint should give a similar descriptor."""
    # build a smooth random image
    base = rng.uniform(size=(32, 32)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))  # 256x256 blocky
    from regard3d_tpu.kernels.scale_space import gaussian_blur
    img = np.asarray(gaussian_blur(jnp.asarray(img)[None], 4.0)[0])

    H, W = img.shape
    c = (W - 1) / 2.0
    # rotate image by 90 deg (exact, no interpolation)
    img90 = np.rot90(img, k=-1).copy()  # clockwise

    kp = np.array([150.0, 130.0])
    # under clockwise rot90: (x, y) -> (W-1-y, x)
    kp90 = np.array([W - 1 - kp[1], kp[0]])

    size = 30.0
    d0 = liop.describe_liop(
        jnp.asarray(img)[None],
        Keypoints(xy=jnp.asarray([[kp]]), scale=jnp.asarray([[size]]),
                  angle=jnp.asarray([[0.0]]), score=jnp.ones((1, 1)),
                  mask=jnp.ones((1, 1), bool)), 1.0)
    d90 = liop.describe_liop(
        jnp.asarray(img90)[None],
        Keypoints(xy=jnp.asarray([[kp90]]), scale=jnp.asarray([[size]]),
                  angle=jnp.asarray([[np.pi / 2]]), score=jnp.ones((1, 1)),
                  mask=jnp.ones((1, 1), bool)), 1.0)
    a = np.asarray(d0.data[0, 0, :144])
    b = np.asarray(d90.data[0, 0, :144])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_describe_masked_keypoints_zero(rng):
    img = jnp.asarray(rng.uniform(size=(1, 64, 64)), jnp.float32)
    kps = Keypoints(
        xy=jnp.asarray([[[32.0, 32.0], [20.0, 20.0]]]),
        scale=jnp.asarray([[10.0, 10.0]]),
        angle=jnp.zeros((1, 2)),
        score=jnp.ones((1, 2)),
        mask=jnp.asarray([[True, False]]))
    d = liop.describe_liop(img, kps)
    assert d.data.shape == (1, 2, 256)
    assert float(jnp.abs(d.data[0, 1]).max()) == 0.0
    assert float(jnp.linalg.norm(d.data[0, 0])) > 0.9


def test_liop_matches_reference_golden_vectors():
    """Golden vectors produced by the reference's vendored VLFeat LIOP
    (src/thirdparty/liop/vl_liop.c, compiled separately; only the vectors
    are committed). Our implementation must reproduce them bitwise-modulo
    float ordering on the same raw 41x41 patches."""
    import os
    data = np.load(os.path.join(os.path.dirname(__file__), "data",
                                "liop_golden.npz"))
    patches = jnp.asarray(data["patches"])
    want = data["descs"]
    got = np.asarray(jax.vmap(liop.liop_from_patch)(patches))
    err = np.abs(got - want).max(axis=1)
    cos = np.sum(got * want, 1) / np.maximum(
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1), 1e-12)
    # generic (smooth random) patches: bitwise-identical binning
    assert float(err[:12].max()) < 1e-5, err
    # the last two patches are perfectly symmetric (linear ramp / radial
    # bump): massive intensity ties make the rank order — and hence the
    # exact binning — implementation-defined; require high agreement only
    assert float(cos.min()) > 0.9, cos


def test_pyramid_warp_matches_exact_at_fine_scales(rng):
    """TPU fast path (warp_patches_pyramid): level-0 keypoints must match
    the direct bilinear warp to matmul rounding; coarse keypoints sample an
    anti-aliased pyramid level (different by design, still descriptive)."""
    B, H, W, K = 2, 256, 256, 64
    img = jnp.asarray(rng.uniform(size=(B, H, W)), jnp.float32)
    xy = jnp.asarray(rng.uniform(30, 220, size=(B, K, 2)), jnp.float32)
    size = jnp.asarray(rng.uniform(4.8, 10.0, size=(B, K)), jnp.float32)
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(B, K)), jnp.float32)
    kps = Keypoints(xy=xy, scale=size, angle=angle,
                    score=jnp.ones((B, K)), mask=jnp.ones((B, K), bool))

    pe = liop.warp_patches(img[0], xy[0], size[0], angle[0], 8.0)
    pp = liop.warp_patches_pyramid(img[:1], jnp.zeros((K,), jnp.int32),
                                   xy[0], size[0], angle[0], 8.0, chunk=64)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(pp), atol=1e-4)

    d_exact = liop.describe_liop(img, kps, use_pyramid=False)
    d_pyr = liop.describe_liop(img, kps, use_pyramid=True)
    de = np.asarray(d_exact.data)[..., :144]
    dp = np.asarray(d_pyr.data)[..., :144]
    cos = (de * dp).sum(-1) / np.maximum(
        np.linalg.norm(de, axis=-1) * np.linalg.norm(dp, axis=-1), 1e-9)
    assert cos.min() > 0.99, cos.min()
