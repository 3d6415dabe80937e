"""HTML reconstruction report (Generate_SfM_Report parity,
src/threads/R3DTriangulationThread.cpp:252 + result dialog statistics
:634-679)."""

from __future__ import annotations

from typing import Any, Dict


def write_html_report(path: str, stats: Dict[str, Any], params=None):
    rows = "".join(
        f"<tr><td>{k}</td><td>{_fmt(v)}</td></tr>"
        for k, v in sorted(stats.items()) if k != "order_added")
    param_rows = ""
    if params is not None:
        import dataclasses
        d = (dataclasses.asdict(params)
             if dataclasses.is_dataclass(params) else dict(params))
        param_rows = "".join(
            f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in sorted(d.items()))
    html = f"""<!DOCTYPE html>
<html><head><title>regard3d_tpu reconstruction report</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; }}
td {{ border: 1px solid #ccc; padding: 4px 10px; }}
h2 {{ color: #336; }}
</style></head><body>
<h1>Reconstruction report</h1>
<h2>Parameters</h2><table>{param_rows}</table>
<h2>Results</h2><table>{rows}</table>
</body></html>"""
    with open(path, "w") as f:
        f.write(html)


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)
