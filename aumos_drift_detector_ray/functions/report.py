"""Self-contained HTML drift report + executive summary prose.

The reference renders Plotly charts (adapters/html_reporter.py:19-159)
and prose summaries (adapters/report_generator.py:742-805); plotly is
unavailable here, so the report is a dependency-free single HTML file
with inline SVG sparkline + severity-colored tables — still fully
self-contained and shareable, which is the reporter's actual contract.
Driver-side post-processing over the small merged results (not a
distributed op — SURVEY.md §2a)."""

from __future__ import annotations

import html
from typing import Any

import numpy as np

_SEV_COLORS = {"critical": "#c0392b", "warning": "#e67e22", "info": "#2980b9"}


def _sparkline_svg(values: list[float], width: int = 360, height: int = 60) -> str:
    if not values:
        return ""
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    pts = []
    for i, v in enumerate(values):
        x = i * (width - 10) / max(1, len(values) - 1) + 5
        y = height - 5 - (v - lo) / span * (height - 10)
        pts.append(f"{x:.1f},{y:.1f}")
    return (
        f'<svg width="{width}" height="{height}">'
        f'<polyline fill="none" stroke="#2980b9" stroke-width="2" '
        f'points="{" ".join(pts)}"/></svg>'
    )


def executive_summary(detections: list[dict[str, Any]]) -> str:
    """Prose summary of a detection set (report_generator.py:742-805
    style: counts, worst features, severity mix)."""
    total = len(detections)
    drifted = [d for d in detections if d.get("is_drifted")]
    critical = [d for d in drifted if d.get("severity") == "critical"]
    if not total:
        return "No drift checks were run."
    if not drifted:
        return (f"All {total} drift checks passed; no distribution shift "
                "detected between the reference and production windows.")
    worst = sorted(drifted, key=lambda d: -abs(d.get("score", 0.0)))[:3]
    feats = ", ".join(f"{d['feature']} ({d['test_name']})" for d in worst)
    return (
        f"{len(drifted)} of {total} drift checks flagged a shift "
        f"({len(critical)} critical). Largest shifts: {feats}. "
        "Review the affected features and consider retraining."
    )


def trend_summaries(
    part_scores: list[dict[str, Any]],
) -> list[dict[str, Any]]:
    """Per-(feature, test) trend of the score across ordered partitions,
    with the reference's linear time-to-critical extrapolation
    (report_generator.py:617-624): partitions-until-threshold when the
    score is rising toward it. Only score-increasing tests (drift iff
    score >= threshold) get an extrapolation — p-value tests drift
    downward."""
    from . import metrics as M

    increasing = {"psi", "wasserstein", "js", "hellinger", "mmd"}
    series: dict[tuple[str, str], list[tuple[int, float, float]]] = {}
    for s in part_scores:
        key = (s["feature"], s["test"])
        series.setdefault(key, []).append(
            (int(s.get("partition_id", -1)), float(s["score"]),
             float(s["threshold"]))
        )
    out = []
    for (feature, test), pts in sorted(series.items()):
        pts.sort()
        vals = np.asarray([p[1] for p in pts], dtype=float)
        threshold = pts[-1][2]
        t = M.linear_trend(vals)
        ttc = (
            M.time_to_critical(t["slope"], float(vals[-1]), threshold)
            if test in increasing and len(vals) >= 2 else None
        )
        out.append({
            "feature": feature, "test": test,
            "slope": t["slope"], "direction": t["direction"],
            "current": float(vals[-1]), "threshold": threshold,
            "time_to_critical": ttc,
        })
    return out


def generate_html_report(
    run_name: str,
    detections: list[dict[str, Any]],
    matrix_rows: list[dict[str, Any]] | None = None,
    trends: list[dict[str, Any]] | None = None,
) -> str:
    """Single-file HTML report: executive summary prose, drift-score
    table with severity colors, score sparkline, optional per-partition
    pass/fail matrix and score-trend / time-to-critical table."""
    rows_html = []
    for d in sorted(detections, key=lambda r: (not r.get("is_drifted", False),
                                               r.get("feature", ""))):
        sev = d.get("severity", "info")
        color = _SEV_COLORS.get(sev, "#555")
        badge = "DRIFT" if d.get("is_drifted") else "ok"
        rows_html.append(
            f"<tr><td>{html.escape(str(d.get('feature')))}</td>"
            f"<td>{html.escape(str(d.get('test_name')))}</td>"
            f"<td>{d.get('score', 0.0):.6g}</td>"
            f"<td>{d.get('threshold', 0.0):.4g}</td>"
            f'<td style="color:{color};font-weight:bold">{sev}</td>'
            f"<td>{badge}</td></tr>"
        )
    matrix_html = ""
    if matrix_rows:
        cells = "".join(
            f"<tr><td>{m['partition_id']}</td><td>{html.escape(str(m['check']))}</td>"
            f"<td>{m['violations']}</td><td>{m['rows']}</td>"
            f"<td>{'PASS' if m.get('passed') else 'FAIL'}</td></tr>"
            for m in matrix_rows
        )
        matrix_html = (
            "<h2>Per-partition pass/fail matrix</h2>"
            "<table><tr><th>partition</th><th>check</th><th>violations</th>"
            f"<th>rows</th><th>status</th></tr>{cells}</table>"
        )
    trend_html = ""
    if trends:
        tcells = "".join(
            f"<tr><td>{html.escape(str(t['feature']))}</td>"
            f"<td>{html.escape(str(t['test']))}</td>"
            f"<td>{t['current']:.6g}</td>"
            f"<td>{html.escape(str(t['direction']))}</td>"
            f"<td>{t['slope']:.3g}</td>"
            f"<td>{'%.1f partitions' % t['time_to_critical'] if t.get('time_to_critical') is not None else '—'}</td></tr>"
            for t in trends
        )
        trend_html = (
            "<h2>Score trend &amp; time to critical</h2>"
            "<table><tr><th>feature</th><th>test</th><th>current</th>"
            "<th>direction</th><th>slope</th><th>time to critical</th></tr>"
            f"{tcells}</table>"
        )
    scores = [float(d.get("score", 0.0)) for d in detections]
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Drift report — {html.escape(run_name)}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2em; color: #222; }}
 table {{ border-collapse: collapse; margin: 1em 0; }}
 td, th {{ border: 1px solid #ccc; padding: 4px 10px; font-size: 14px; }}
 th {{ background: #f4f4f4; }}
</style></head><body>
<h1>Drift report — {html.escape(run_name)}</h1>
<p>{html.escape(executive_summary(detections))}</p>
{_sparkline_svg(scores)}
<h2>Drift scores</h2>
<table><tr><th>feature</th><th>test</th><th>score</th><th>threshold</th>
<th>severity</th><th>verdict</th></tr>
{''.join(rows_html)}
</table>
{trend_html}
{matrix_html}
</body></html>"""
