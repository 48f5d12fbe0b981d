"""Human-readable report sinks — the analog of the reference's HTML/TXT
report writers (``test_readability.py:276-752`` and ``:755-884``).

Like the reference, rendering is a *driver-side* step over the (small) verdict
manifest and violation samples — never a distributed op (SURVEY.md §2.2 K1/K2).
The TXT report reproduces the reference's structure: summary stats block
(``:794-806``), per-partition table (``:830-850``), and dedicated violation
sections (``:856-879``).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq


def _load(out_dir: str | Path):
    out = Path(out_dir)
    summary = json.loads((out / "run_summary.json").read_text())
    pv = pq.read_table(out / "global" / "partition_verdicts.parquet").to_pandas()
    sample = []
    for f in sorted(out.glob("partials/shard=*/kind=v/*.parquet")):
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "check_id", "detail"])
        sample.extend(t.slice(0, 50 - len(sample)).to_pylist())
        if len(sample) >= 50:
            break
    return summary, pv, sample


def render_txt_report(out_dir: str | Path) -> str:
    summary, pv, sample = _load(out_dir)
    lines = [
        "TRANSCRIPT VALIDATION REPORT",
        "=" * 60,
        "",
        "SUMMARY",
        "-" * 60,
        f"rows validated:        {summary['n_rows']}",
        f"duplicate keys:        {summary['n_duplicate_keys']}",
        f"gap conversations:     {summary['n_gap_conversations']}",
        f"partitions failed:     {summary['n_partitions_failed']} / {len(pv)}",
        f"drift:                 {summary['drift']}",
        f"schema:                {'OK' if summary.get('schema', {}).get('ok', True) else 'FINDINGS'}"
        f" ({len(summary.get('schema', {}).get('per_file', {}))} files with findings)",
        f"column-stats gate:     "
        f"{'PASS' if summary.get('column_stats_gate', {}).get('passed', True) else 'FAIL'}",
        "",
        "PER-PARTITION VERDICTS",
        "-" * 60,
        f"{'partition':>9}  {'rows':>10}  {'violations':>10}  verdict",
    ]
    for _, r in pv.iterrows():
        lines.append(
            f"{int(r.partition_id):>9}  {int(r.n_rows):>10}  "
            f"{int(r.n_violations):>10}  {'PASS' if r.passed else 'FAIL'}"
        )
    lines += ["", "VIOLATION SAMPLE (first 50)", "-" * 60]
    for v in sample:
        lines.append(
            f"{v['conv_id']}[{v['turn_idx']}] {v['check_id']}: {v['detail']}"
        )
    text = "\n".join(lines) + "\n"
    (Path(out_dir) / "report.txt").write_text(text)
    return text


def render_html_report(out_dir: str | Path) -> str:
    summary, pv, sample = _load(out_dir)
    rows = "".join(
        f"<tr class={'pass' if r.passed else 'fail'}><td>{int(r.partition_id)}</td>"
        f"<td>{int(r.n_rows)}</td><td>{int(r.n_violations)}</td>"
        f"<td>{'PASS' if r.passed else 'FAIL'}</td></tr>"
        for _, r in pv.iterrows()
    )
    sample_rows = "".join(
        f"<tr><td>{v['conv_id']}</td><td>{v['turn_idx']}</td>"
        f"<td>{v['check_id']}</td><td>{v['detail']}</td></tr>"
        for v in sample
    )
    html = f"""<!doctype html><html><head><meta charset="utf-8">
<title>Transcript Validation Report</title>
<style>
body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:4px 10px}}
tr.pass td{{background:#e8f5e9}}tr.fail td{{background:#ffebee}}
</style></head><body>
<h1>Transcript Validation Report</h1>
<p>rows: {summary["n_rows"]} · duplicate keys: {summary["n_duplicate_keys"]} ·
gap conversations: {summary["n_gap_conversations"]} ·
partitions failed: {summary["n_partitions_failed"]}/{len(pv)}</p>
<h2>Per-partition verdicts</h2>
<table><tr><th>partition</th><th>rows</th><th>violations</th><th>verdict</th></tr>
{rows}</table>
<h2>Violation sample</h2>
<table><tr><th>conv</th><th>turn</th><th>check</th><th>detail</th></tr>
{sample_rows}</table>
</body></html>"""
    (Path(out_dir) / "report.html").write_text(html)
    return html


def export_content_json(ds, path: str) -> None:
    """Per-turn content export — the K3 JSON sink analog (``app.py:949-964``):
    writes the projected content columns as JSON files (distributed)."""
    ds.select_columns(["conv_id", "turn_idx", "text"]).write_json(path)
