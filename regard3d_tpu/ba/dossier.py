"""Communication / memory accounting for the distributed BA paths.

The reference's Ceres BA is shared-memory (P6 in SURVEY.md §2.3 —
``/root/reference/src/CMakeLists.txt:315``); the rebuild's scaling story
rests on which collectives each sharding pays per LM trial.  This module
extracts that evidence from the *compiled* XLA programs so the claim
"point-block sharding's communication is independent of the landmark
count" is measured, not asserted:

* ``hlo_collectives`` — every collective op (all-reduce / all-gather /
  reduce-scatter / all-to-all / collective-permute) in an optimized HLO
  module, with its per-device payload shape and byte size, grouped by the
  HLO computation it lives in (ops inside the CG ``while`` body appear in
  that body's computation, so per-CG-step payloads are directly
  attributable).

* ``analytic_collectives`` — the closed-form per-trial payload table for
  both shardings (obs-sharded: the (L,3) per-point psum rides every CG
  matvec, ``ba/lm.py`` ``_solve_schur``; point-sharded: only the reduced
  (V,6)+(K,9) camera system, ``ba/sharded.py``).

* ``memory_report`` — XLA's own per-device byte accounting
  (``compiled.memory_analysis()``) for a trial program, the basis for the
  "replicated landmark blocks cannot fit in HBM, sharded ones can" demo.
"""

from __future__ import annotations

import re
from typing import Dict, List

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "all-to-all", "collective-permute")

# one HLO tensor type, e.g. f32[300,6]{1,0} or f32[]
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


_INSTR_RE = re.compile(
    r"^(?:ROOT\s+)?%[\w.\-]+\s*=\s*(?P<type>.*?)\s+"
    r"(?P<op>" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")


def hlo_collectives(compiled) -> List[Dict]:
    """Parse an optimized HLO module for collective ops.

    Returns one record per collective instruction:
    ``{op, in_loop, shapes, bytes}``.  ``bytes`` is the summed payload of
    the op's result tuple (for an all-reduce each participant contributes
    and receives the full tensor; ring transfer volume per device is
    2(N-1)/N of it).  ``in_loop`` is True when the op executes inside a
    ``while`` body (XLA records the traced position in op metadata) — for
    the BA trial that is the CG loop, so those payloads are per-CG-step."""
    txt = compiled.as_text() if hasattr(compiled, "as_text") else str(compiled)
    records = []
    for line in txt.splitlines():
        s = line.strip()
        m = _INSTR_RE.match(s)
        if not m:
            continue
        shapes = [(d, dims) for d, dims in _SHAPE_RE.findall(m.group("type"))
                  if d in _DTYPE_BYTES]
        records.append({
            "op": m.group("op"),
            "in_loop": "/while/" in s,
            "shapes": [f"{d}[{dims}]" for d, dims in shapes],
            "bytes": sum(_shape_bytes(d, dims) for d, dims in shapes),
        })
    return records


def collective_summary(compiled) -> Dict:
    """Static collective totals for one compiled program.

    Ops with ``in_loop`` live in a ``while`` body (the CG loop in the BA
    trial) and execute once per iteration; the rest run once per trial."""
    recs = hlo_collectives(compiled)
    return {
        "ops": recs,
        "num_collectives": len(recs),
        "static_payload_bytes": sum(r["bytes"] for r in recs),
        "per_cg_step_bytes": sum(r["bytes"] for r in recs if r["in_loop"]),
        "outside_loop_bytes": sum(r["bytes"] for r in recs
                                  if not r["in_loop"]),
    }


def analytic_collectives(V: int, L: int, K: int, cg_iters: int,
                         dtype_bytes: int = 4) -> Dict:
    """Closed-form per-trial psum payloads for both shardings.

    obs-sharded (``ba/sharded.py bundle_adjust_sharded``): a point's rows
    live on several devices, so every per-point segment reduction is
    psum'd —
      linearize: (V,6,6)+(K,9,9)+(V,6)+(K,9) camera blocks
                 + (L,3,3) V-blocks + (L,3) gp;
      each CG matvec (``lm._solve_schur S_mv``): (L,3) t + (V,6)+(K,9);
      rhs build (W_y): (V,6)+(K,9); WT_x (back-substitution): (L,3).

    point-sharded (``bundle_adjust_point_sharded``): landmarks and their
    rows are co-located, every per-point reduction is device-local —
    only the reduced camera system is psum'd:
      linearize: (V,6,6)+(K,9,9)+(V,6)+(K,9);
      each CG matvec: (V,6)+(K,9);
      rhs: (V,6)+(K,9).
    Plus one scalar cost psum per trial in both."""
    cam_blocks = (V * 36 + K * 81 + V * 6 + K * 9) * dtype_bytes
    cam_sys = (V * 6 + K * 9) * dtype_bytes
    point_blocks = (L * 9 + L * 3) * dtype_bytes
    point_vec = L * 3 * dtype_bytes

    obs_per_cg = point_vec + cam_sys
    pt_per_cg = cam_sys
    obs_trial = (cam_blocks + point_blocks          # linearize
                 + cam_sys                          # rhs (W_y)
                 + cg_iters * obs_per_cg            # CG
                 + point_vec                        # back-substitution WT_x
                 + dtype_bytes)                     # cost scalar
    pt_trial = (cam_blocks + cam_sys + cg_iters * pt_per_cg + dtype_bytes)
    return {
        "V": V, "L": L, "K": K, "cg_iters": cg_iters,
        "obs_sharded": {
            "per_cg_step_bytes": obs_per_cg,
            "per_trial_bytes": obs_trial,
            "landmark_dependent": True,
        },
        "point_sharded": {
            "per_cg_step_bytes": pt_per_cg,
            "per_trial_bytes": pt_trial,
            "landmark_dependent": False,
        },
        "ratio_per_cg_step": obs_per_cg / max(pt_per_cg, 1),
    }


def memory_report(compiled) -> Dict:
    """Per-device byte accounting straight from XLA."""
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    out = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
    }
    alias = getattr(ma, "alias_size_in_bytes", None)
    if alias is not None:
        out["alias_bytes"] = int(alias)
    out["peak_bytes"] = (out["argument_bytes"] + out["output_bytes"]
                         + out["temp_bytes"] - out.get("alias_bytes", 0))
    return out
