"""External-tool command assembly parity.

The reference builds these command lines at
src/R3DDensificationProcess.cpp:171-176 (SMVS) and
src/R3DSurfaceGenProcess.cpp:142-197 (FSSR / texrecon); the builders must
emit the same flags."""

import types

import pytest

from regard3d_tpu.pipeline import external


def _args(**kw):
    return types.SimpleNamespace(**kw)


def test_smvs_command_full():
    cmd = external.smvs_command(
        "smvsrecon", "scene",
        _args(input_scale=3, output_scale=2, shading=True, sgm=False,
              alpha=0.7))
    assert cmd[0] == "smvsrecon"
    assert "--scale=3" in cmd
    assert "--output-scale=2" in cmd
    assert "-S" in cmd
    assert "--no-sgm" in cmd
    assert "--alpha=0.700000" in cmd
    assert "--force" in cmd
    assert cmd[-1] == "scene"


def test_smvs_command_sgm_default_on_no_shading():
    cmd = external.smvs_command("smvsrecon", "scene", _args())
    assert "-S" not in cmd
    assert "--no-sgm" not in cmd            # SGM enabled by default
    assert any(c.startswith("--alpha=") for c in cmd)


def test_fssr_commands():
    cmds = external.fssr_commands(
        "fssrecon", "meshclean", "dense.ply", "raw.ply", "surf.ply",
        _args(scale_factor=2.5, refine_octree_levels=1,
              conf_threshold=3.0, min_component_size=500))
    assert cmds[0] == ["fssrecon", "--scale-factor=2.5",
                       "--refine-octree=1", "dense.ply", "raw.ply"]
    assert cmds[1] == ["meshclean", "--threshold=3",
                       "--component-size=500", "raw.ply", "surf.ply"]


def test_texrecon_command_flags():
    cmd = external.texrecon_command(
        "texrecon", "MVE", "surf.ply", "out",
        _args(visibility_test=False, seam_leveling="none",
              local_seam_leveling=False, outlier_removal="gauss_clamping"))
    assert "--skip_geometric_visibility_test" in cmd
    assert "--skip_global_seam_leveling" in cmd
    assert "--skip_local_seam_leveling" in cmd
    assert "--outlier_removal=gauss_clamping" in cmd
    assert "--no_intermediate_results" in cmd
    assert cmd[-3:] == ["MVE::undistorted", "surf.ply", "out"]


def test_texrecon_command_defaults():
    cmd = external.texrecon_command("texrecon", "MVE", "s.ply", "o", _args())
    assert "--skip_geometric_visibility_test" not in cmd
    assert "--skip_global_seam_leveling" not in cmd
    assert "--skip_local_seam_leveling" not in cmd
    assert not any(c.startswith("--outlier_removal") for c in cmd)


def test_explicit_texrecon_requires_binary(monkeypatch, tmp_path):
    """An explicit --texture-method texrecon must raise when the binary is
    missing instead of silently falling back to TPU texturing."""
    monkeypatch.delenv("R3D_EXTERNAL_PROGRAMS_DIR", raising=False)
    monkeypatch.setenv("PATH", str(tmp_path))   # nothing on PATH
    programs = external.ExternalPrograms()
    assert not programs.has("texrecon")
    with pytest.raises(RuntimeError, match="texrecon"):
        programs.require("texrecon")
