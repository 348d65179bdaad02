#!/usr/bin/env python
"""Render benchmark artifacts into a human-readable results page —
the engine's counterpart of the reference's results-site step
(``scripts/fill_template.py:12-97`` renders ``results/*.json`` through a
Jinja2 template + matplotlib chart into ``docs/benchmark_results.md``).

Dependency-free by design (no jinja2/matplotlib in this container): plain
string templating and an ASCII horizontal bar chart, writing
``RESULTS.md`` at the repo root from:

- ``BENCH_DETAIL.json``   — per-query wall clock (the suite bench)
- ``BENCH_r*.json``       — per-round summary trail (driver artifacts)
- reference-parity anchors passed in as JSON files (optional argv:
  outputs of ``tools/bench_reference.py``)

Usage::

    python tools/render_results.py [ref_anchor.json ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

#: reference best published numbers (BASELINE.md / docs/benchmark_results.md)
REFERENCE_BEST = {
    "tiny": ("PySpark pivot", 104.21),
    "small": ("PySpark Comet pivot", 131.29),
    "medium": ("PySpark Comet pivot", 412.17),
}


def _bar(value: float, vmax: float, width: int = 40) -> str:
    n = 0 if vmax <= 0 else max(1, round(width * value / vmax))
    return "█" * min(n, width)


def render(anchor_paths: list[str]) -> str:
    out = ["# Benchmark results", ""]

    # --- reference-parity anchors ---
    anchors = []
    for p in anchor_paths:
        try:
            a = json.loads(Path(p).read_text())
            # validate the anchor shape HERE so one malformed/wrong-kind
            # JSON (e.g. a bench_diff report from the same results/ dir)
            # skips like an unreadable file instead of KeyError-ing the
            # whole render below
            a["size"], a["rows"], a["strategies"]
            anchors.append(a)
        except Exception as exc:  # noqa: BLE001 - render what we can
            out.append(f"_(skipped unreadable anchor {p}: {exc})_")
    if anchors:
        out += ["## Reference-parity task (2,080 features)", ""]
        out.append(
            "| size | rows | strategy | median s | reps | probe s | "
            "reference best |"
        )
        out.append("|---|---|---|---|---|---|---|")
        for a in anchors:
            ref = REFERENCE_BEST.get(a.get("size", ""), ("—", None))
            for name, s in a.get("strategies", {}).items():
                ref_txt = f"{ref[1]} ({ref[0]})" if ref[1] else "unpublished"
                out.append(
                    f"| {a['size']} | {a['rows']:,} | {name} "
                    f"| **{s['median']}** | {s['times']} "
                    f"| {a.get('probe_before_sec', '—')} | {ref_txt} |"
                )
        out.append("")

    # --- per-round summary trail ---
    rounds = sorted(REPO.glob("BENCH_r*.json"))
    if rounds:
        out += ["## Suite bench by round (driver-recorded)", ""]
        out.append("| round | total s | queries | median s |")
        out.append("|---|---|---|---|")
        for p in rounds:
            try:
                d = json.loads(p.read_text())
                s = d.get("parsed") or {}
                if not s:
                    tail = d.get("tail", "")
                    s = json.loads(tail[tail.rfind('{"metric"'):])
            except Exception:
                continue
            out.append(
                f"| {p.stem.replace('BENCH_', '')} | {s.get('value', '—')} "
                f"| {s.get('n_queries', '—')} "
                f"| {s.get('median_query_sec', '—')} |"
            )
        out.append("")

    # --- per-query detail with ASCII bars (top 30 slowest) ---
    detail_p = REPO / "BENCH_DETAIL.json"
    if detail_p.exists():
        d = json.loads(detail_p.read_text())
        q = sorted(d["queries"].items(), key=lambda kv: -kv[1])
        out += [
            f"## Slowest queries (sf={d.get('sf')}, "
            f"{len(d['queries'])} benched)",
            "",
            "```",
        ]
        vmax = q[0][1] if q else 0
        for name, sec in q[:30]:
            out.append(f"{name:<32} {sec:7.2f}s {_bar(sec, vmax)}")
        total = sum(d["queries"].values())
        out += [
            "```",
            "",
            f"Total {total:.1f} s across {len(d['queries'])} queries.",
            "",
        ]
    return "\n".join(out) + "\n"


def main() -> None:
    text = render(sys.argv[1:])
    (REPO / "RESULTS.md").write_text(text)
    print(f"wrote {REPO / 'RESULTS.md'} ({len(text)} chars)")


if __name__ == "__main__":
    main()
