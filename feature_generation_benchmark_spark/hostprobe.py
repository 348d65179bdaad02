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


#: Bytes the IO probe reads from the benchmark's own parquet (128 MB —
#: big enough to distinguish page-cache (GB/s) from storage (~100s MB/s),
#: small enough to not perturb a multi-GB cache footprint).
IO_PROBE_BYTES = 128 * 1024 * 1024


def io_cache_probe(sf_dir: str) -> dict:
    """Cheap IO-side health signal (r4 verdict #5): the closing r4 bench
    triplet spread 155→206 s on near-identical CPU probes — page-cache
    state of the sf parquet was the residual variance the CPU probe
    can't see. Returns:

    - ``io_mbps``: sequential read throughput over the first 128 MB of
      the largest parquet under ``sf_dir``. Cached reads land in the
      GB/s range, cold storage 10-100× lower, so warm/cold readings are
      self-labeling.
    - ``cached_mb``: /proc/meminfo ``Cached`` (page cache, MB) at probe
      time — corroborates whether a prior run's working set is resident.

    Best-effort: any failure yields ``-1`` fields, never an exception.
    """
    import os

    out = {"io_mbps": -1.0, "cached_mb": -1}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    out["cached_mb"] = int(line.split()[1]) // 1024
                    break
    except OSError:
        pass
    try:
        candidates = []
        for root, _dirs, files in os.walk(sf_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    candidates.append((os.path.getsize(p), p))
        if not candidates:
            return out
        _, path = max(candidates)
        t0 = time.time()
        read = 0
        with open(path, "rb", buffering=0) as f:
            while read < IO_PROBE_BYTES:
                chunk = f.read(8 * 1024 * 1024)
                if not chunk:
                    break
                read += len(chunk)
        dt = time.time() - t0
        if read and dt > 0:
            out["io_mbps"] = round(read / dt / 1024 / 1024, 1)
    except OSError:
        pass
    return out


def cpu_steal_ticks() -> int:
    """Cumulative hypervisor steal ticks from /proc/stat (field 8 of the
    aggregate cpu line), or -1 when unavailable. Callers take a delta
    across a timed region: this VM sees intermittent steal storms from
    noisy neighbors (r7: one bench run read 632 s vs 264-281 s for the
    same code while the single-core probe moved only 1.16 → 1.5 s —
    steal under full 32-thread load is invisible to a one-core probe),
    so the artifact must carry its own steal reading to be judgeable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])  # cpu user nice system idle iowait irq softirq steal
    except (OSError, IndexError, ValueError):
        return -1


def steal_pct(ticks_before: int, ticks_after: int, wall_sec: float,
              n_cpus: int) -> float:
    """Steal as a percentage of total cpu-time across the window; -1.0
    when either reading was unavailable."""
    if ticks_before < 0 or ticks_after < 0 or wall_sec <= 0 or n_cpus <= 0:
        return -1.0
    tick_hz = 100.0  # USER_HZ is 100 on linux
    return round(
        100.0 * (ticks_after - ticks_before) / tick_hz / (wall_sec * n_cpus),
        2,
    )
