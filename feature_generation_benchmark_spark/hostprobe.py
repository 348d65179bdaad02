"""Host-capacity calibration probes — ONE definition of the integer burn
loop shared by every timing harness (``bench.py``'s in-process probe and
``tools/bench_reference.py``'s per-rep / all-core probes), so the
"healthy ≈1.5–2 s" thresholds documented in COVERAGE.md can never drift
between harnesses.

This box (see COVERAGE.md host-variability notes) has multi-hour degraded
windows that slow Spark ~5× more than a pure-CPU loop, so probes are a
necessary-not-sufficient health signal: times moving while probes don't
is an engine regression; both moving together is host pathology.
"""

from __future__ import annotations

import time

#: Loop count of the SHORT probe used per-rep and in bench.py (~1.5-2 s
#: on this host when healthy).
SHORT_PROBE_LOOPS = 30_000_000


def burn(loops: int) -> None:
    """The calibration workload: a pure-Python integer accumulation."""
    x = 0
    for i in range(loops):
        x += i


def single_core_probe_sec(loops: int = SHORT_PROBE_LOOPS) -> float:
    """Wall seconds of one single-core burn."""
    t0 = time.time()
    burn(loops)
    return round(time.time() - t0, 2)
