"""End-to-end CLI drive on the real TPU backend."""
import json, os, subprocess, sys, tempfile
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
# the parent only renders/checks — it must NOT hold the TPU chip, or the
# CLI children cannot initialize the axon backend (single-tenant chip)
import jax
jax.config.update("jax_platforms", "cpu")
from regard3d_tpu.ingest import synth
from PIL import Image

ds = synth.make_dataset("castle", n_cams=7, hw=320, seed=1)
work = tempfile.mkdtemp(prefix="tpue2e")
img_dir = os.path.join(work, "imgs"); os.makedirs(img_dir)
paths = []
for i, im in enumerate(ds["images"]):
    p = os.path.join(img_dir, f"im{i:02d}.png")
    Image.fromarray((np.clip(im,0,1)*255).astype(np.uint8)).save(p)
    paths.append(p)
proj = os.path.join(work, "proj")

env = dict(os.environ)   # NO PYTHONPATH (axon constraint); cwd = repo
def cli(*a):
    # the axon chip tunnel releases with a lag after a child exits; a
    # follow-on child can transiently fail to register the backend — retry
    import time
    for attempt in range(3):
        r = subprocess.run([sys.executable, "-m", "regard3d_tpu.cli", *a],
                           env=env, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        print(">>>", a[0], "rc=", r.returncode, flush=True)
        if r.returncode == 0:
            return r.stdout
        if "known backends" not in r.stderr and \
           "Unable to initialize" not in r.stderr:
            break
        time.sleep(20)
    print(r.stdout[-2000:]); print(r.stderr[-4000:]); sys.exit(1)

cli("init", proj)
cli("import", proj, *paths)
cli("matches", proj, "--sensitivity", "ultra", "--max-keypoints", "2048")
out = cli("sfm", proj, "--engine", "incremental2")
stats = json.loads(out[out.index("{"):])
print("num_cameras:", stats["num_cameras"], "rms_px:", stats["rms_px"])
import glob
from regard3d_tpu.core import sfm_data, metrics
npz = sorted(glob.glob(os.path.join(proj, "**", "scene.npz"), recursive=True))[-1]
sc = sfm_data.load_npz(npz)
pm = np.asarray(sc.poses.mask)
ate = metrics.ate_rmse(np.asarray(sc.poses.C)[pm], ds["Cs"][pm])
print("ATE:", round(float(ate), 4), "(scene scale ~12)")
assert stats["num_cameras"] == 7 and ate < 0.2
print("TPU E2E OK")
