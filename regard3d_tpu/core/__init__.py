from regard3d_tpu.core import cameras, sfm_data, types  # noqa: F401
