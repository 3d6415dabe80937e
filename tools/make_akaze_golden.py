"""Generate tests/data/akaze_golden.npz from the reference AKAZE oracle.

Methodology (same as the round-2 LIOP golden): build the reference's
vendored detector (/root/reference/src/thirdparty/akaze/lib) out-of-tree
via native/akaze_oracle/build.sh, run it on deterministic synthetic images,
and commit only the *outputs* — uint8 images + keypoint tables per
sensitivity preset (threshold 0.001/0.0007/0.0005/0.0001, the GUI presets
at src/gui/Regard3DComputeMatchesDialog.cpp:96-128).

tests/test_akaze_golden.py replays the images through
regard3d_tpu.kernels.detect and gates repeatability/overlap + count parity.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
from scipy import ndimage

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ORACLE_DIR = os.path.join(REPO, "native", "akaze_oracle")
ORACLE = os.path.join(ORACLE_DIR, "akaze_oracle")
OUT = os.path.join(REPO, "tests", "data", "akaze_golden.npz")

THRESHOLDS = [0.001, 0.0007, 0.0005, 0.0001]   # Minimal/Normal/High/Ultra
HW = 320


def make_images():
    """Three deterministic uint8 test images (texture statistics chosen to
    exercise fine + coarse scales and structured gradients)."""
    imgs = []
    rng = np.random.default_rng(11)
    fine = ndimage.gaussian_filter(rng.uniform(0, 1, (HW, HW)), 1.6)
    imgs.append(fine)

    rng = np.random.default_rng(22)
    coarse = ndimage.gaussian_filter(rng.uniform(0, 1, (HW, HW)), 4.0)
    imgs.append(coarse)

    # blob/corner scene: sparse gaussian blobs + a step-edge grid
    rng = np.random.default_rng(33)
    canvas = np.zeros((HW, HW))
    for _ in range(60):
        y, x = rng.integers(20, HW - 20, 2)
        s = rng.uniform(2.0, 12.0)
        yy, xx = np.mgrid[0:HW, 0:HW]
        canvas += rng.uniform(0.3, 1.0) * np.exp(
            -((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    canvas += (np.indices((HW, HW)).sum(0) // 40 % 2) * 0.15
    canvas = ndimage.gaussian_filter(canvas, 1.0)
    imgs.append(canvas)

    out = []
    for im in imgs:
        im = (im - im.min()) / (im.max() - im.min())
        out.append(np.clip(np.round(im * 255), 0, 255).astype(np.uint8))
    return out


def run_oracle(img_u8, thr):
    f32 = (img_u8.astype(np.float32) / 255.0)
    with tempfile.NamedTemporaryFile(suffix=".f32", delete=False) as f:
        f.write(f32.tobytes())
        path = f.name
    try:
        out = subprocess.run(
            [ORACLE, "--in", path, "--w", str(img_u8.shape[1]),
             "--h", str(img_u8.shape[0]), "--thr", repr(thr)],
            capture_output=True, text=True, check=True)
    finally:
        os.unlink(path)
    rows = [[float(v) for v in line.split()]
            for line in out.stdout.strip().splitlines() if line.strip()]
    return np.asarray(rows, np.float32).reshape(-1, 7)


def main():
    if not os.path.exists(ORACLE):
        subprocess.run(["sh", os.path.join(ORACLE_DIR, "build.sh")],
                       check=True)
    imgs = make_images()
    payload = {"images": np.stack(imgs),
               "thresholds": np.asarray(THRESHOLDS, np.float32)}
    for i, im in enumerate(imgs):
        for t in THRESHOLDS:
            kp = run_oracle(im, t)
            payload[f"kp_{i}_{t:g}"] = kp
            print(f"img {i} thr {t:g}: {len(kp)} keypoints")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **payload)
    print("wrote", OUT, f"({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    sys.exit(main())
