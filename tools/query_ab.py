#!/usr/bin/env python
"""Interleaved re-measurement of driver-bench queries suspected of
weather drift (BENCH.md protocol, r5 verdict #4).

The three r5 "regressions" (extract_corpus −17%, event_histogram 2.0x,
decontaminate 1.5x) are all on code untouched since r4, so there is no
code A/B to run — the question is whether the r5 driver numbers were
host weather.  Protocol: ONE clean solo session (never concurrent with
pytest/bench — measured 8.5k vs 15k pages/s under contention), 2 warm
passes per query, then N round-robin-interleaved trials so slow minutes
hit every query equally; report per-query trial arrays + medians.

    python tools/query_ab.py [--sf-dir /root/testdata/sf0.1] [--trials 5]
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["extract_corpus", "event_histogram", "decontaminate"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--queries", nargs="*", default=QUERIES)
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry_mod

    spark = bench._spark(bench.CPUS)
    reg = entry_mod.queries()
    if "extract_corpus" in args.queries:
        bench.materialize_corpus(
            spark, args.sf_dir, bench.CORPUS_DIR, bench.FIXTURE_SCALE,
            bench.REPLICAS,
        )

    def run(name: str) -> float:
        if name == "extract_corpus":
            # use the harness's own timing (excludes the setup count())
            return bench.bench_extraction(
                spark, bench.CORPUS_DIR, warm_passes=0, trials=1
            )["seconds"]
        t0 = time.perf_counter()
        bench._force(reg[name](spark, args.sf_dir))
        return time.perf_counter() - t0

    for name in args.queries:  # warm: 2 passes each (JIT + cache)
        for _ in range(2):
            run(name)

    trials: dict[str, list[float]] = {q: [] for q in args.queries}
    for _ in range(args.trials):  # round-robin so weather hits all equally
        for name in args.queries:
            trials[name].append(round(run(name), 3))

    out = {
        q: {"trials": ts, "median": round(statistics.median(ts), 3)}
        for q, ts in trials.items()
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
