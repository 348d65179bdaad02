#!/usr/bin/env python
"""Bench regression tripwire (r5 verdict #5).

Diffs a new ``BENCH_DETAIL.json`` against the previous round's committed
copy and FLAGS any query that got more than ``--threshold`` (default
1.5×) slower AND lost more than ``--min-delta`` wall-clock seconds
(default 0.5 s — sub-second timings are host-noise dominated, a pure
ratio would spam flags on 0.3 s → 0.5 s jitter).

Usage:
    python tools/bench_diff.py                     # HEAD copy vs working copy
    python tools/bench_diff.py --old r4.json --new r5.json
    python tools/bench_diff.py --old HEAD~3        # any git rev works

Exit code 1 when regressions are flagged, so the bench workflow fails
loudly instead of requiring artifact archaeology (the r5 +4.6% suite
regression was only found by manually diffing BENCH_r0*.json).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DETAIL = REPO / "BENCH_DETAIL.json"


def _load(src: str) -> dict:
    """``src`` is a file path, or a git rev (resolved to BENCH_DETAIL.json
    at that rev), or ``rev:path`` for an explicit in-repo blob."""
    p = Path(src)
    if p.exists():
        return json.loads(p.read_text())
    # Absolute paths can only mean files (git revs are never absolute
    # paths); anything else gets a git try — `rev:path`, `origin/main`,
    # `HEAD~1` are all legal revs — and a combined error on failure
    # instead of a subprocess traceback.
    if p.is_absolute():
        raise SystemExit(f"bench_diff: no such file: {src}")
    spec = src if ":" in src else f"{src}:BENCH_DETAIL.json"
    proc = subprocess.run(
        ["git", "-C", str(REPO), "show", spec],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        detail = proc.stderr.strip().splitlines()
        raise SystemExit(
            f"bench_diff: {src!r} is neither an existing file nor a "
            f"resolvable git rev[:path]"
            + (f" ({detail[-1]})" if detail else "")
        )
    return json.loads(proc.stdout)


def diff_benches(
    old: dict,
    new: dict,
    threshold: float = 1.5,
    min_delta: float = 0.5,
) -> dict:
    """Pure diff logic (unit-tested): returns regressed / improved /
    added / removed plus common-set totals."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    flagged = new.get("noise_flagged", {})
    common = sorted(set(oq) & set(nq))
    regressed, improved, noise = {}, {}, {}
    for name in common:
        o, n = oq[name], nq[name]
        if o <= 0:
            continue
        ratio = n / o
        if ratio > threshold and (n - o) > min_delta:
            entry = {"old": o, "new": n, "ratio": round(ratio, 2)}
            # bench.py re-measured this swing and its rerun landed back
            # near the committed time: classify as host-window noise,
            # not a regression (r6 verdict #8)
            fl = flagged.get(name)
            if fl and fl.get("noise"):
                entry["rerun"] = fl.get("rerun")
                noise[name] = entry
            else:
                regressed[name] = entry
        elif ratio < 1.0 / threshold and (o - n) > min_delta:
            improved[name] = {"old": o, "new": n, "ratio": round(ratio, 2)}
    tot_old = round(sum(oq[n] for n in common), 3)
    tot_new = round(sum(nq[n] for n in common), 3)
    return {
        "threshold": threshold,
        "min_delta_sec": min_delta,
        "n_common": len(common),
        "common_total_old_sec": tot_old,
        "common_total_new_sec": tot_new,
        "common_total_ratio": round(tot_new / tot_old, 4) if tot_old else None,
        "regressed": regressed,
        "noise": noise,
        "improved": improved,
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--old", default="HEAD", help="path or git rev")
    ap.add_argument("--new", default=str(DETAIL), help="path or git rev")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=0.5)
    ap.add_argument(
        "--out", default=None, help="also write the report JSON here"
    )
    args = ap.parse_args(argv)

    report = diff_benches(
        _load(args.old), _load(args.new), args.threshold, args.min_delta
    )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")
    if report["regressed"]:
        print(
            f"FLAGGED: {len(report['regressed'])} queries regressed "
            f">{args.threshold}x (+{args.min_delta}s)",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
