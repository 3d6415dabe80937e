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


def test_make_city_and_window_pairs():
    """City dataset: O(1) per-view render cost, exact GT, ordered pairs."""
    from regard3d_tpu.ingest import synth
    ds = synth.make_city(n_cams=12, hw=64)
    assert len(ds["images"]) == 12
    assert ds["Rs"].shape == (12, 3, 3) and ds["Cs"].shape == (12, 3)
    # images have real content (textured facades visible)
    stds = [float(np.std(im)) for im in ds["images"]]
    assert min(stds) > 0.01, stds
    # forward motion along +x
    assert (np.diff(ds["Cs"][:, 0]) > 0).all()
    pairs = synth.window_pairs(12, window=3)
    assert (0, 1) in pairs and (0, 3) in pairs and (0, 4) not in pairs
    assert len(pairs) == sum(min(3, 11 - i) for i in range(12))


def test_radial_k3_raycast_distorts():
    """_rk3 datasets really bend straight lines: the same scene rendered
    with and without distortion must differ, and the undistort fixed point
    must invert the forward model of core.cameras."""
    import jax.numpy as jnp
    from regard3d_tpu.core import cameras
    from regard3d_tpu.core.types import RADIAL_K3
    from regard3d_tpu.ingest import synth

    ds0 = synth.make_dataset("castle", n_cams=2, hw=128, seed=1)
    ds1 = synth.make_dataset("castle_rk3", n_cams=2, hw=128, seed=1)
    assert ds1["disto"] is not None
    d = np.abs(np.asarray(ds0["images"][0]) - np.asarray(ds1["images"][0]))
    assert d.max() > 0.05        # visibly different rendering

    # inversion check: undistort(distort(m)) == m
    k1, k2, k3 = ds1["disto"]
    m = np.asarray([[0.21, -0.33]])
    r2 = (m ** 2).sum()
    s = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
    md = m * s
    ux, uy = synth._undistort_radial(md[:, 0], md[:, 1], ds1["disto"])
    np.testing.assert_allclose(np.stack([ux, uy], -1), m, atol=1e-6)

    # and the forward model used for rendering matches core.cameras
    intr = np.zeros(9, np.float32)
    intr[:3] = [300.0, 64.0, 64.0]
    intr[3:6] = ds1["disto"]
    X = jnp.asarray([[0.21 * 2, -0.33 * 2, 2.0]])   # normalized (0.21,-0.33)
    uv, _ = cameras.project(jnp.eye(3), jnp.zeros(3), jnp.int32(RADIAL_K3),
                            jnp.asarray(intr), X)
    expect = md[0] * 300.0 + np.asarray([64.0, 64.0])
    np.testing.assert_allclose(np.asarray(uv[0]), expect, atol=1e-3)


def _write_exif_jpeg(path, make="Canon", model="Canon EOS 550D",
                     focal_mm=24.0, f35=None, fpxres=None, gps=None,
                     size=(320, 240)):
    """Real-camera-style JPEG fixture: EXIF written through PIL's encoder
    (rational focal, sub-IFD tags, D/M/S GPS rationals)."""
    from PIL import Image
    from PIL.TiffImagePlugin import IFDRational
    from PIL import ExifTags
    im = Image.new("RGB", size, (90, 120, 80))
    exif = Image.Exif()
    exif[ExifTags.Base.Make] = make
    exif[ExifTags.Base.Model] = model
    sub = exif.get_ifd(ExifTags.IFD.Exif)
    sub[ExifTags.Base.FocalLength] = IFDRational(int(focal_mm * 100), 100)
    if f35 is not None:
        sub[ExifTags.Base.FocalLengthIn35mmFilm] = int(f35)
    if fpxres is not None:
        sub[ExifTags.Base.FocalPlaneXResolution] = IFDRational(*fpxres)
        sub[ExifTags.Base.FocalPlaneResolutionUnit] = 2      # inch
        sub[ExifTags.Base.ExifImageWidth] = size[0]
    if gps is not None:
        lat, lon, alt = gps
        g = exif.get_ifd(ExifTags.IFD.GPSInfo)
        def dms(v):
            v = abs(v)
            d = int(v); m = int((v - d) * 60)
            s = (v - d - m / 60.0) * 3600.0
            return (IFDRational(d, 1), IFDRational(m, 1),
                    IFDRational(int(s * 1000), 1000))
        g[ExifTags.GPS.GPSLatitude] = dms(lat)
        g[ExifTags.GPS.GPSLatitudeRef] = "N" if lat >= 0 else "S"
        g[ExifTags.GPS.GPSLongitude] = dms(lon)
        g[ExifTags.GPS.GPSLongitudeRef] = "E" if lon >= 0 else "W"
        g[ExifTags.GPS.GPSAltitude] = IFDRational(int(alt * 10), 10)
        g[ExifTags.GPS.GPSAltitudeRef] = 0
    im.save(path, exif=exif)


def test_exif_jpeg_fixture_roundtrip(tmp_path):
    from regard3d_tpu.ingest import exif as exif_mod
    p = str(tmp_path / "cam.jpg")
    _write_exif_jpeg(p, focal_mm=24.0, gps=(47.3769, -8.5417, 408.2))
    info = exif_mod.read_exif(p)
    assert info.maker == "Canon" and "550D" in info.model
    assert info.focal_length_mm == pytest.approx(24.0)
    assert info.has_gps
    assert info.latitude == pytest.approx(47.3769, abs=1e-4)
    assert info.longitude == pytest.approx(-8.5417, abs=1e-4)
    assert info.altitude == pytest.approx(408.2, abs=0.1)


def test_exif_35mm_equivalent_focal_prior(tmp_path):
    """A body missing from the sensor DB still gets a usable focal prior
    through FocalLengthIn35mmFilm (crop factor route)."""
    from regard3d_tpu.ingest import exif as exif_mod, intrinsics
    p = str(tmp_path / "unknown.jpg")
    _write_exif_jpeg(p, make="Obscureco", model="X-9000",
                     focal_mm=12.0, f35=36)
    info = exif_mod.read_exif(p)
    assert info.focal_35mm == 36
    vi = intrinsics.focal_prior(info, None)       # no DB entry
    assert vi.from_exif
    assert vi.focal_px == pytest.approx(320 * 36 / 36.0)


def test_exif_focal_plane_resolution_sensor_width(tmp_path):
    """Sensor width derived from FocalPlaneXResolution when the DB has no
    entry: 320 px / (400 px/inch) * 25.4 = 20.32 mm."""
    from regard3d_tpu.ingest import exif as exif_mod, intrinsics
    p = str(tmp_path / "fp.jpg")
    _write_exif_jpeg(p, make="Obscureco", model="Y-1",
                     focal_mm=10.0, fpxres=(400, 1))
    info = exif_mod.read_exif(p)
    assert info.sensor_width_mm == pytest.approx(20.32, abs=0.01)
    vi = intrinsics.focal_prior(info, None)
    assert vi.from_exif
    assert vi.focal_px == pytest.approx(320 * 10.0 / 20.32, rel=1e-3)
