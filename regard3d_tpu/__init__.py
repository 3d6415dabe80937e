"""regard3d_tpu — a TPU-native structure-from-motion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Regard3D
(reference: rhiestan/Regard3D, a wxWidgets/OpenMVG desktop photogrammetry
app).  The compute path — feature detection (AKAZE / Fast-AKAZE
equivalents), LIOP description, pairwise matching, robust geometry
(ACRANSAC F/E/H), incremental & global SfM, and Schur-complement bundle
adjustment — is expressed as batched, statically-shaped JAX programs with
Pallas TPU kernels on the hot paths, sharded over a `jax.sharding.Mesh`
for multi-chip / multi-host scaling.  Host-side subsystems (project store,
EXIF/camera-DB ingest, exporters, external-MVS sinks) mirror the
reference's file-based pipeline contract (SURVEY.md §2, §A.4).
"""

__version__ = "0.1.0"

from regard3d_tpu.core import cameras, sfm_data, types  # noqa: F401
