"""E-matrix overlap prune parity (src/R3DComputeMatches.cpp:2177-2186).

The reference drops a pair when ``count < 50 || count/putative < 0.3``:
keeping requires BOTH bounds, not either one."""

from regard3d_tpu.pipeline.compute_matches import MatchConfig, e_overlap_keep

CFG = MatchConfig()


def test_drops_high_survival_low_count():
    # 40 inliers out of 114 putative = 35% survival, but < 50 matches
    assert not e_overlap_keep(40, 114, CFG)


def test_drops_high_count_low_survival():
    # 60 inliers out of 240 putative = 25% survival: >= 50 but < 30%
    assert not e_overlap_keep(60, 240, CFG)


def test_keeps_when_both_bounds_met():
    assert e_overlap_keep(60, 120, CFG)      # 50% survival, 60 matches
    assert e_overlap_keep(50, 166, CFG)      # exactly at both bounds


def test_boundary_values():
    assert not e_overlap_keep(49, 100, CFG)  # one short of the count bound
    assert e_overlap_keep(50, 100, CFG)
    # ratio bound is inclusive at exactly 0.3
    assert e_overlap_keep(51, 170, CFG)
    assert not e_overlap_keep(51, 171, CFG)
