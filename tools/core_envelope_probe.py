"""Measure this host's per-core-speed envelope for the scaling bench.

`bench.py --scaling` compares the same job at N and 4N pinned cores and
claims the wall-clock ratio as ENGINE scaling efficiency. That claim is
only honest if one core does the same amount of work per second at both
levels. On a shared virtualized host it often does not:

  - turbo / frequency scaling: 1-2 active cores run at boosted clocks,
    so the small leg is unfairly fast;
  - shared memory bandwidth / LLC: many active cores stall each other;
  - neither coupling exists when a real cluster grows N -> 4N executors,
    because 4x executors bring 4x sockets.

This probe runs the engine's REAL feature-pack kernels
(compute_feature_pack — the dominant compute of the scaling pipeline)
over a fixed synthetic workload at several pinned process counts and
reports the summed in-worker `time.process_time()`. Steal time cannot
inflate process_time (a preempted vCPU accrues steal, not CPU), so any
inflation of per-core work with the active-core count is frequency or
memory coupling — the host, not the engine. The flattest N -> 4N pair is
the one `BENCH_SCALING_LEVELS` should use; re-run this whenever the
kernels materially change speed (a faster kernel is more bandwidth-bound
and shrinks the flat envelope — it moved from 2..8 at round 3 to 4..16
at round 5 on this host).

Usage:
    python tools/core_envelope_probe.py            # levels 1 2 4 8 16
    python tools/core_envelope_probe.py 2 8 32     # explicit levels
Prints one JSON line per level: {"nproc": N, "wall_s": ..., "cpu_s": ...}
where cpu_s is the summed worker process_time for the SAME total work —
compare cpu_s across levels; the ratio is the per-core work inflation.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lens(n_series: int = 400, seed: int = 7) -> list[int]:
    rng = np.random.default_rng(seed)
    # Zipf-flavoured lengths like the bench corpus (mean ~1.2k, 60k whale cap)
    return list(
        np.minimum((rng.pareto(1.5, n_series) + 1) * 400, 60_000).astype(int)
    )


def _work(args: tuple[int, int]) -> tuple[float, float]:
    idx, length = args
    import warnings

    from feasts_spark.operators.features import compute_feature_pack

    rng = np.random.default_rng(idx)
    x = np.cumsum(rng.standard_normal(length)) + 10 * np.sin(
        np.arange(length) / 24
    )
    t0w, t0c = time.perf_counter(), time.process_time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # short-series kernels warn by design
        compute_feature_pack(x, period=24)
    return time.perf_counter() - t0w, time.process_time() - t0c


def probe(nproc: int, repeats: int = 3) -> dict:
    from multiprocessing import Pool

    os.sched_setaffinity(0, set(range(nproc)))
    lens = _lens()
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        with Pool(nproc) as p:
            res = p.map(_work, list(enumerate(lens)), chunksize=4)
        wall = time.perf_counter() - t0
        cpu = sum(r[1] for r in res)
        if best is None or cpu < best["cpu_s"]:
            best = {
                "nproc": nproc,
                "wall_s": round(wall, 2),
                "cpu_s": round(cpu, 2),
                "total_points": int(sum(lens)),
            }
    return best


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    for n in levels:
        print(json.dumps(probe(n)))
