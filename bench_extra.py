#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Per-query isolation with the noop sink (guide §1.4), split into:
  * build_s   — q(spark, sf_dir) DataFrame construction (driver/py4j time)
  * first_s   — first noop write (includes plan analysis+optimization+exec)
  * warm runs — median of N noop writes after warmup (steady state)

Usage:
  python bench_extra.py [query ...]          # default: all queries
  python bench_extra.py --explain q1 q2      # also dump formatted plans
  python bench_extra.py --plandir plans/r07 --suffix _before --explain ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(cpus: int):
    from ocr_table_extractor_to_csv_spark.session import get_spark

    return get_spark(
        app_name=f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--plandir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--force-mode", choices=["noop", "bench"], default="bench",
                    help="bench = cache+count+noop (bench.py parity); noop = plain noop sink")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    spark = _spark(args.cpus)
    qmap = entry_mod.queries()
    names = args.queries or list(qmap)
    out = {}
    for name in names:
        q = qmap[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        df = q(spark, args.sf_dir)
        build_s = time.perf_counter() - t0

        if args.explain and args.plandir:
            os.makedirs(args.plandir, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plandir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)

        def force(d):
            if args.force_mode == "bench":
                d = d.cache()
                d.count()
                _noop(d)
                d.unpersist()
            else:
                _noop(d)

        t0 = time.perf_counter()
        force(df)
        first_s = time.perf_counter() - t0
        for _ in range(max(0, args.warm - 1)):
            force(q(spark, args.sf_dir))
        runs = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            force(q(spark, args.sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "build_s": round(build_s, 3),
            "first_s": round(first_s, 3),
            "median_s": round(statistics.median(runs), 3) if runs else None,
            "runs": runs,
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
