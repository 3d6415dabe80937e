"""Feature-extraction + geometric-filter throughput benchmarks.

The matching MXU kernel is the headline; these prove the *other* hot
stages (SURVEY.md §3.2: scale space + detection + LIOP, and the vectorized
AC-RANSAC) are not the new bottleneck.  Prints ONE JSON line:

    {"features_imgs_per_s": ..., "ransac_pairs_per_s": ..., "backend": ...}

Run standalone or via bench.py (subprocess).  Workloads:
* features: 1024x1024 synthetic textured images, full Fast-AKAZE-equivalent
  scale space -> det-Hessian -> NMS -> subpixel -> orientation -> LIOP-144
  on 4096 keypoints (one batched dispatch per stage);
* ransac: batched ACRANSAC-F over blocks of 16 pairs x 1024 iters x 2048
  padded correspondences (the per-pair parity config).
"""

import argparse
import json
import time

import numpy as np


from bench_util import sync as _sync


def synth_images(n, hw, rng):
    import jax.numpy as jnp
    from regard3d_tpu.kernels.scale_space import gaussian_blur
    imgs = rng.uniform(0.0, 1.0, size=(n, hw, hw)).astype(np.float32)
    return np.asarray(gaussian_blur(jnp.asarray(imgs), 1.2))


def bench_features(batch=4, hw=1024, max_kp=4096, reps=8):
    import jax
    import jax.numpy as jnp
    from regard3d_tpu.kernels import detect, liop

    rng = np.random.default_rng(0)
    variants = [jnp.asarray(synth_images(batch, hw, rng)) for _ in range(2)]

    @jax.jit
    def pipeline(img):
        kps = detect.detect_akaze(img, max_keypoints=max_kp)
        descs = liop.describe_liop(img, kps)
        return kps.mask.sum(), descs.data.sum()

    for v in variants:
        _sync(pipeline(v))
    t0 = time.time()
    for k in range(reps):
        out = pipeline(variants[k % 2])
    _sync(out)
    dt = time.time() - t0
    return reps * batch / dt


def bench_ransac(block=16, cap=2048, iters=1024, reps=6):
    import jax
    import jax.numpy as jnp
    from regard3d_tpu.kernels import ransac

    rng = np.random.default_rng(1)
    w = h = 1024.0
    # planar-ish correspondences with outliers (realistic inlier structure)
    x1 = rng.uniform(0, w, size=(block, cap, 2)).astype(np.float32)
    t = rng.uniform(-40, 40, size=(block, 1, 2)).astype(np.float32)
    x2 = x1 + t + rng.normal(size=(block, cap, 2)).astype(np.float32)
    bad = rng.uniform(size=(block, cap)) < 0.4
    x2[bad] = rng.uniform(0, w, size=(int(bad.sum()), 2))
    mask = np.ones((block, cap), bool)

    keys = jax.random.split(jax.random.PRNGKey(0), block)
    la = jnp.full((block,), ransac._logalpha0_line(w, h), jnp.float32)
    me = jnp.full((block,), 16.0, jnp.float32)
    maskj = jnp.asarray(mask)

    def run(x1, x2):
        return ransac.acransac_f_batch(keys, x1, x2, maskj, la, me,
                                       iters=iters)

    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
    _sync(run(x1j, x2j))
    t0 = time.time()
    for _ in range(reps):
        out = run(x1j, x2j)
    _sync(out)
    dt = time.time() - t0
    return reps * block / dt


def bench_cpu_features(hw=1024, reps=3):
    """Measured CPU reference for the feature stage: the reference's own
    vendored AKAZE detector + VLFeat LIOP descriptor
    (/root/reference/src/thirdparty/{akaze/lib,liop}) compiled out-of-tree
    (native/akaze_oracle, OpenMP over keypoints like the reference's P3)
    and timed on the same-size image on this host. It describes every
    keypoint it detects (~2.9k at threshold 0.001 on this image) vs the
    TPU side's fixed 4096 — slightly less work, i.e. conservative
    *against* the TPU ratio. Returns imgs/s or None when the oracle
    cannot be built."""
    import os
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    oracle = os.path.join(here, "native", "akaze_oracle", "akaze_oracle")
    if not os.path.exists(oracle):
        r = subprocess.run(
            ["sh", os.path.join(here, "native", "akaze_oracle", "build.sh")],
            capture_output=True, text=True)
        if r.returncode != 0:
            return None
    rng = np.random.default_rng(0)
    # same image statistics as the TPU workload, built without touching
    # JAX (a second backend init would contend for the axon chip)
    from scipy import ndimage
    img = ndimage.gaussian_filter(
        rng.uniform(0.0, 1.0, size=(hw, hw)).astype(np.float32), 1.2)
    with tempfile.NamedTemporaryFile(suffix=".f32", delete=False) as f:
        f.write(img.astype(np.float32).tobytes())
        path = f.name
    try:
        out = subprocess.run(
            [oracle, "--in", path, "--w", str(hw), "--h", str(hw),
             "--bench", str(reps)],
            capture_output=True, text=True, timeout=1200)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)["imgs_per_s"]
    except Exception:
        return None
    finally:
        import os as _os
        _os.unlink(path)
    return None


def bench_cpu_ransac(block=16, cap=2048, iters=1024, reps=2):
    """Measured CPU reference for the geometric filter: the same ACRANSAC-F
    workload (8-pt Hartley-normalized fits, MSAC scoring, NFA threshold on
    the winner, one weighted refit) implemented with vectorized NumPy/LAPACK
    — batched eigh/svd over all samples, i.e. a generous multicore-BLAS CPU
    implementation of what OpenMVG's per-pair loops compute
    (src/R3DComputeMatches.cpp:2086-2233). Returns pairs/s."""
    rng = np.random.default_rng(1)
    w = 1024.0
    x1 = rng.uniform(0, w, size=(block, cap, 2)).astype(np.float32)
    t = rng.uniform(-40, 40, size=(block, 1, 2)).astype(np.float32)
    x2 = x1 + t + rng.normal(size=(block, cap, 2)).astype(np.float32)
    bad = rng.uniform(size=(block, cap)) < 0.4
    x2[bad] = rng.uniform(0, w, size=(int(bad.sum()), 2))

    def norm_pts(p):
        mean = p.mean(-2, keepdims=True)
        d = np.sqrt(((p - mean) ** 2).sum(-1)).mean(-1)
        s = np.sqrt(2.0) / np.maximum(d, 1e-12)
        return (p - mean) * s[..., None, None], mean[..., 0, :], s

    def fit8(p1, p2):
        """p1, p2: (S, 8, 2) -> F (S, 3, 3)."""
        p1n, m1, s1 = norm_pts(p1)
        p2n, m2, s2 = norm_pts(p2)
        u1, v1 = p1n[..., 0], p1n[..., 1]
        u2, v2 = p2n[..., 0], p2n[..., 1]
        A = np.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                      u1, v1, np.ones_like(u1)], -1)
        AtA = np.einsum("smi,smj->sij", A, A)
        _, V = np.linalg.eigh(AtA)
        F = V[..., :, 0].reshape(-1, 3, 3)
        U, s, Vt = np.linalg.svd(F)
        s[..., 2] = 0.0
        F = U @ (s[..., None] * Vt)
        def T(scale, mean):
            S = len(scale)
            Tm = np.zeros((S, 3, 3), np.float64)
            Tm[:, 0, 0] = scale; Tm[:, 1, 1] = scale; Tm[:, 2, 2] = 1.0
            Tm[:, 0, 2] = -scale * mean[:, 0]
            Tm[:, 1, 2] = -scale * mean[:, 1]
            return Tm
        return np.swapaxes(T(s2, m2), -1, -2) @ F @ T(s1, m1)

    def epi_dist(F, p1, p2):
        x1h = np.concatenate([p1, np.ones_like(p1[..., :1])], -1)
        x2h = np.concatenate([p2, np.ones_like(p2[..., :1])], -1)
        l2 = np.einsum("sij,nj->sni", F, x1h)
        num = np.einsum("ni,sni->sn", x2h, l2) ** 2
        den = l2[..., 0] ** 2 + l2[..., 1] ** 2
        return num / np.maximum(den, 1e-12)

    def one_pair(p1, p2, seed):
        r = np.random.default_rng(seed)
        # cheap independent draws (duplicates vanishingly rare at this cap;
        # cheaper for the CPU side than distinct sampling — i.e. generous)
        idx = (r.random((iters, 8)) * cap).astype(np.int64)
        F = fit8(p1[idx], p2[idx])
        resid = epi_dist(F, p1, p2)
        score = np.minimum(resid, 16.0).sum(1)
        best = int(np.argmin(score))
        rb = resid[best]
        np.sort(rb)                       # NFA threshold pass on the winner
        inl = rb <= 16.0
        if inl.sum() >= 9:                # weighted refit + recount
            F2 = fit8(p1[None, inl], p2[None, inl])
            r2 = epi_dist(F2, p1, p2)[0]
            np.sort(r2)
        return inl.sum()

    one_pair(x1[0], x2[0], 0)             # warm BLAS
    t0 = time.time()
    for k in range(reps):
        for b in range(block):
            one_pair(x1[b], x2[b], k * block + b)
    return reps * block / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--no-cpu-ref", action="store_true")
    args = ap.parse_args()
    import jax
    # production config (matches the CLI): f32 matmuls/convs + compile cache
    from regard3d_tpu import runtime
    runtime.setup()
    feats = bench_features(reps=args.reps)
    rans = bench_ransac(reps=max(args.reps // 2, 2))
    cpu_feats = cpu_rans = None
    if not args.no_cpu_ref:
        cpu_feats = bench_cpu_features()
        cpu_rans = bench_cpu_ransac()
    print(json.dumps({
        "features_imgs_per_s": round(feats, 3),
        "features_detail": "1024x1024 imgs, scale space + detect + LIOP-144 "
                           "@4096 kp",
        "ransac_pairs_per_s": round(rans, 3),
        "ransac_detail": "ACRANSAC-F blocks, 2048 pts x 1024 iters",
        "backend": jax.default_backend(),
        "cpu_features_imgs_per_s": cpu_feats and round(cpu_feats, 3),
        "cpu_features_detail": "reference vendored AKAZE + VLFeat LIOP "
                               "(akaze_oracle, OpenMP) on this host",
        "cpu_ransac_pairs_per_s": cpu_rans and round(cpu_rans, 3),
        "cpu_ransac_detail": "NumPy/LAPACK vectorized same-workload "
                             "ACRANSAC-F on this host",
        "features_vs_cpu": (cpu_feats and round(feats / cpu_feats, 2)),
        "ransac_vs_cpu": (cpu_rans and round(rans / cpu_rans, 2)),
    }))


if __name__ == "__main__":
    main()
