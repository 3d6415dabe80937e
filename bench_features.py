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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    import jax
    # production config (matches the CLI): f32 matmuls/convs
    jax.config.update("jax_default_matmul_precision", "highest")
    feats = bench_features(reps=args.reps)
    rans = bench_ransac(reps=max(args.reps // 2, 2))
    print(json.dumps({
        "features_imgs_per_s": round(feats, 3),
        "features_detail": "1024x1024 imgs, scale space + detect + LIOP-144 "
                           "@4096 kp",
        "ransac_pairs_per_s": round(rans, 3),
        "ransac_detail": "ACRANSAC-F blocks, 2048 pts x 1024 iters",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
