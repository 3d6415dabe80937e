import numpy as np
import pytest
from PIL import Image

from regard3d_tpu.ingest import exif as exif_mod
from regard3d_tpu.ingest import geodesy, image_io, intrinsics, sensor_db


def test_exif_basic(tmp_path):
    # PIL can write EXIF
    p = str(tmp_path / "t.jpg")
    im = Image.new("RGB", (320, 240), (100, 120, 140))
    ex = Image.Exif()
    import PIL.ExifTags as T
    ex[T.Base.Make] = "Canon"
    ex[T.Base.Model] = "Canon EOS 5D Mark III"
    im.save(p, exif=ex)
    info = exif_mod.read_exif(p)
    assert (info.width, info.height) == (320, 240)
    assert info.maker == "Canon"
    assert "5D" in info.model
    assert not info.has_gps


def test_exif_no_exif(tmp_path):
    p = str(tmp_path / "plain.png")
    Image.new("L", (64, 48)).save(p)
    info = exif_mod.read_exif(p)
    assert (info.width, info.height) == (64, 48)
    assert info.maker == ""


def test_sensor_db_exact_and_fuzzy():
    db = sensor_db.SensorDB()
    assert db.lookup("Canon", "Canon EOS 5D Mark III") == 36.0
    # fuzzy: maker word + digit tokens (reference matchesPartly)
    assert db.lookup("NIKON CORPORATION", "NIKON D90") == 23.6
    assert db.lookup("Unknown", "Whatever X100") is None


def test_user_db_roundtrip(tmp_path):
    udb = sensor_db.UserCameraDB(str(tmp_path / "user.db"))
    assert udb.lookup("Acme", "M1") is None
    udb.add("Acme", "M1", 7.7)
    assert udb.lookup("acme", "m1") == 7.7
    # user DB takes precedence over CSV
    udb.add("Canon", "Canon EOS 5D Mark III", 30.0)
    w = sensor_db.lookup_sensor_width("Canon", "Canon EOS 5D Mark III",
                                      user_db=udb)
    assert w == 30.0
    udb.remove("Acme", "M1")
    assert udb.lookup("Acme", "M1") is None
    udb.close()


def test_focal_prior_from_exif():
    info = exif_mod.ExifInfo(width=4000, height=3000, focal_length_mm=24.0)
    vi = intrinsics.focal_prior(info, 36.0)
    assert vi.from_exif
    np.testing.assert_allclose(vi.focal_px, 4000 * 24.0 / 36.0)


def test_focal_prior_fallback():
    info = exif_mod.ExifInfo(width=4000, height=3000)
    vi = intrinsics.focal_prior(info, None)
    assert not vi.from_exif
    np.testing.assert_allclose(vi.focal_px, 1.1 * 4000)


def test_intrinsic_grouping():
    from regard3d_tpu.core.types import RADIAL_K3
    views = [intrinsics.ViewIntrinsics(1000.0, 1280, 960, RADIAL_K3, True),
             intrinsics.ViewIntrinsics(1000.0, 1280, 960, RADIAL_K3, True),
             intrinsics.ViewIntrinsics(900.0, 1280, 960, RADIAL_K3, True)]
    iid, params, models, w, h = intrinsics.build_intrinsics(views, RADIAL_K3)
    assert iid.tolist() == [0, 0, 1]
    assert params.shape == (2, 9)
    np.testing.assert_allclose(params[:, 0], [1000.0, 900.0])


def test_lla_ecef_roundtrip():
    lat, lon, alt = 46.5, 6.6, 420.0
    x, y, z = geodesy.lla_to_ecef(lat, lon, alt)
    lat2, lon2, alt2 = geodesy.ecef_to_lla(x, y, z)
    np.testing.assert_allclose([lat2, lon2], [lat, lon], atol=1e-9)
    np.testing.assert_allclose(alt2, alt, atol=1e-3)


def test_local_enu_frame():
    pts = np.asarray([geodesy.lla_to_ecef(46.5, 6.6, 400),
                      geodesy.lla_to_ecef(46.5001, 6.6, 400),
                      geodesy.lla_to_ecef(46.5, 6.6001, 400)])
    local, origin, R = geodesy.local_enu_frame(pts)
    # second point is ~11m north of first; third ~7.6m east
    d_north = local[1] - local[0]
    assert abs(d_north[1] - 11.1) < 0.3 and abs(d_north[0]) < 0.1
    d_east = local[2] - local[0]
    assert abs(d_east[0] - 7.65) < 0.3 and abs(d_east[1]) < 0.1


def test_load_gray_and_bucket(tmp_path):
    paths = []
    for i, size in enumerate([(100, 80), (100, 80), (200, 150)]):
        p = str(tmp_path / f"im{i}.png")
        arr = (np.random.default_rng(i).uniform(size=(size[1], size[0], 3))
               * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        paths.append(p)
    imgs = [image_io.load_gray(p) for p in paths]
    assert imgs[0].shape == (80, 100)
    assert imgs[0].dtype == np.float32
    assert 0.0 <= imgs[0].min() and imgs[0].max() <= 1.0

    buckets = image_io.bucket_images(imgs, multiple=8, max_batch=8)
    assert len(buckets) == 2
    shapes = sorted(b.data.shape for b in buckets)
    assert shapes[0] == (1, 152, 200)    # padded to /8
    assert shapes[1] == (2, 80, 104)
    b0 = [b for b in buckets if len(b.indices) == 2][0]
    assert b0.true_sizes.tolist() == [[100, 80], [100, 80]]


def test_load_gray_max_dim(tmp_path):
    p = str(tmp_path / "big.png")
    Image.new("RGB", (400, 200)).save(p)
    img = image_io.load_gray(p, max_dim=100)
    assert max(img.shape) == 100
