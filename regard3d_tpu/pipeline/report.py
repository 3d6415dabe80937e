"""HTML reconstruction / matching reports.

Parity targets: OpenMVG's ``Generate_SfM_Report`` HTML written by the
reference after triangulation (src/threads/R3DTriangulationThread.cpp:252)
— global statistics, a per-view table (image, size, #observations,
residual stats, pose status) and a residual histogram — plus the per-pair
match-count tables the reference logs after matching
(src/R3DComputeMatches.cpp:2066-2076)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

_STYLE = """
body { font-family: sans-serif; margin: 2em; }
table { border-collapse: collapse; margin-bottom: 1.5em; }
td, th { border: 1px solid #ccc; padding: 4px 10px; }
th { background: #eef; text-align: left; }
h2 { color: #336; }
.num { text-align: right; }
"""


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)


def _kv_table(d: Dict[str, Any]) -> str:
    rows = "".join(f"<tr><td>{k}</td><td class=num>{_fmt(v)}</td></tr>"
                   for k, v in sorted(d.items()))
    return f"<table>{rows}</table>"


def _histogram_svg(edges: Sequence[float], counts: Sequence[int],
                   width: int = 640, height: int = 180,
                   x_label: str = "residual (px)") -> str:
    """Inline SVG bar chart (no JS, renders anywhere)."""
    n = len(counts)
    if n == 0:
        return ""
    peak = max(max(counts), 1)
    bw = width / n
    bars = []
    for i, c in enumerate(counts):
        h = (height - 20) * c / peak
        bars.append(
            f'<rect x="{i * bw + 1:.1f}" y="{height - 20 - h:.1f}" '
            f'width="{bw - 2:.1f}" height="{h:.1f}" fill="#668" />')
    ticks = []
    for i in range(0, n + 1, max(n // 8, 1)):
        x = i * bw
        label = f"{edges[i]:.1f}" if i < len(edges) else ""
        ticks.append(f'<text x="{x:.1f}" y="{height - 6}" '
                     f'font-size="10">{label}</text>')
    return (f'<svg width="{width}" height="{height}" '
            f'xmlns="http://www.w3.org/2000/svg">'
            + "".join(bars) + "".join(ticks) +
            f'<text x="{width - 90}" y="{height - 6}" font-size="10">'
            f'{x_label}</text></svg>')


def write_html_report(path: str, stats: Dict[str, Any], params=None,
                      views: Optional[List[Dict[str, Any]]] = None,
                      histogram: Optional[Tuple[Sequence[float],
                                                Sequence[int]]] = None):
    """Reconstruction report.  ``views``: per-view dicts with keys
    id/name/width/height/posed/n_obs/mean_px/median_px; ``histogram``:
    (bin_edges, counts) of live reprojection residuals."""
    param_rows = ""
    if params is not None:
        import dataclasses
        d = (dataclasses.asdict(params)
             if dataclasses.is_dataclass(params) else dict(params))
        param_rows = _kv_table(d)
    stat_rows = _kv_table({k: v for k, v in stats.items()
                           if k != "order_added"})
    view_html = ""
    if views:
        head = ("<tr><th>#</th><th>image</th><th>size</th><th>posed</th>"
                "<th>#obs</th><th>mean px</th><th>median px</th></tr>")
        body = "".join(
            f"<tr><td class=num>{v['id']}</td><td>{v.get('name', '')}</td>"
            f"<td class=num>{v.get('width', '')}x{v.get('height', '')}</td>"
            f"<td>{'yes' if v.get('posed') else 'no'}</td>"
            f"<td class=num>{v.get('n_obs', 0)}</td>"
            f"<td class=num>{_fmt(v.get('mean_px', float('nan')))}</td>"
            f"<td class=num>{_fmt(v.get('median_px', float('nan')))}</td>"
            "</tr>"
            for v in views)
        view_html = f"<h2>Views</h2><table>{head}{body}</table>"
    hist_html = ""
    if histogram is not None:
        edges, counts = histogram
        hist_html = ("<h2>Residual histogram</h2>"
                     + _histogram_svg(list(edges), list(counts)))
    order = stats.get("order_added")
    order_html = ""
    if order:
        order_html = ("<h2>View addition order</h2><p>"
                      + " &rarr; ".join(str(v) for v in order) + "</p>")
    html = f"""<!DOCTYPE html>
<html><head><title>regard3d_tpu reconstruction report</title>
<style>{_STYLE}</style></head><body>
<h1>Reconstruction report</h1>
<h2>Parameters</h2>{param_rows}
<h2>Results</h2>{stat_rows}
{view_html}
{hist_html}
{order_html}
</body></html>"""
    with open(path, "w") as f:
        f.write(html)


def write_matches_report(path: str, stats: Dict[str, Any],
                         pair_rows: List[Dict[str, Any]],
                         keypoint_counts: Optional[Sequence[int]] = None,
                         image_names: Optional[Sequence[str]] = None):
    """Matching report: global stats + per-pair putative/geometric counts
    (the tables the reference logs at src/R3DComputeMatches.cpp:2066-2076)
    + per-image keypoint counts (:1998)."""
    stat_rows = _kv_table(stats)
    kp_html = ""
    if keypoint_counts is not None:
        head = "<tr><th>#</th><th>image</th><th>keypoints</th></tr>"
        body = "".join(
            f"<tr><td class=num>{i}</td>"
            f"<td>{image_names[i] if image_names else ''}</td>"
            f"<td class=num>{c}</td></tr>"
            for i, c in enumerate(keypoint_counts))
        kp_html = f"<h2>Keypoints</h2><table>{head}{body}</table>"
    head = ("<tr><th>i</th><th>j</th><th>putative</th><th>geometric</th>"
            "<th>survival</th></tr>")
    body = "".join(
        f"<tr><td class=num>{r['i']}</td><td class=num>{r['j']}</td>"
        f"<td class=num>{r['putative']}</td>"
        f"<td class=num>{r['geometric']}</td>"
        f"<td class=num>{r['survival']:.2f}</td></tr>"
        for r in pair_rows)
    html = f"""<!DOCTYPE html>
<html><head><title>regard3d_tpu matching report</title>
<style>{_STYLE}</style></head><body>
<h1>Matching report</h1>
<h2>Statistics</h2>{stat_rows}
{kp_html}
<h2>Pairs</h2><table>{head}{body}</table>
</body></html>"""
    with open(path, "w") as f:
        f.write(html)
