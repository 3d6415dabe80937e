"""EXIF metadata extraction (host-side ingest).

Equivalent of the reference's easyexif-based ``ExifParser``
(``src/utils/ExifParser.h:29-40``): camera maker/model, focal length (mm),
image dimensions, GPS latitude/longitude/altitude.  Uses PIL's EXIF decoding
instead of a vendored C parser.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from PIL import ExifTags, Image


@dataclasses.dataclass
class ExifInfo:
    width: int = 0
    height: int = 0
    maker: str = ""
    model: str = ""
    focal_length_mm: float = 0.0
    has_gps: bool = False
    latitude: float = 0.0     # degrees (+N)
    longitude: float = 0.0    # degrees (+E)
    altitude: float = 0.0     # meters


def _rational(v) -> float:
    try:
        return float(v)
    except (TypeError, ZeroDivisionError):
        return 0.0


def _dms_to_deg(dms, ref: str) -> float:
    d = _rational(dms[0]) + _rational(dms[1]) / 60.0 + _rational(dms[2]) / 3600.0
    if ref in ("S", "W"):
        d = -d
    return d


def read_exif(path: str) -> ExifInfo:
    info = ExifInfo()
    with Image.open(path) as im:
        info.width, info.height = im.size
        try:
            exif = im.getexif()
        except Exception:
            return info
        if not exif:
            return info
        info.maker = str(exif.get(ExifTags.Base.Make, "")).strip("\x00 ")
        info.model = str(exif.get(ExifTags.Base.Model, "")).strip("\x00 ")
        try:
            sub = exif.get_ifd(ExifTags.IFD.Exif)
        except Exception:
            sub = {}
        fl = sub.get(ExifTags.Base.FocalLength, exif.get(ExifTags.Base.FocalLength))
        if fl is not None:
            info.focal_length_mm = _rational(fl)
        # pixel dims from EXIF override only if present & sane
        try:
            gps = exif.get_ifd(ExifTags.IFD.GPSInfo)
        except Exception:
            gps = {}
        if gps:
            lat = gps.get(ExifTags.GPS.GPSLatitude)
            lat_ref = str(gps.get(ExifTags.GPS.GPSLatitudeRef, "N"))
            lon = gps.get(ExifTags.GPS.GPSLongitude)
            lon_ref = str(gps.get(ExifTags.GPS.GPSLongitudeRef, "E"))
            if lat is not None and lon is not None:
                info.latitude = _dms_to_deg(lat, lat_ref)
                info.longitude = _dms_to_deg(lon, lon_ref)
                alt = gps.get(ExifTags.GPS.GPSAltitude)
                if alt is not None:
                    info.altitude = _rational(alt)
                    ref = gps.get(ExifTags.GPS.GPSAltitudeRef, 0)
                    try:
                        if int(ref) == 1:
                            info.altitude = -info.altitude
                    except (TypeError, ValueError):
                        pass
                info.has_gps = True
    return info
