#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline extraction pipeline + every driver query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "pages_per_sec": ..., ...}

``--scaling`` evidences the north rule's two-cluster-size criterion (no real
cluster in this sandbox).  PRIMARY methodology — executor-process scaling,
the literal "N executors -> 4N executors": an executor is a separate JVM
with its own Python workers, so we run

  1 executor  = one  local[C] JVM pinned to C cores, full corpus
  4 executors = four local[C] JVMs pinned to DISJOINT C-core sets, each
                reading its OWN pre-split shard directory (a quarter of the
                corpus by url hash) — exactly how a cluster hands each
                executor its own input splits

  eff = sum(rate of the 4) / (4 x rate of the 1)

C defaults to 2 so the 4-executor level uses 8 of 32 cores — like a real
cluster, executors do not share last-level cache or turbo budget with each
other; at larger C the single box's shared LLC/frequency physics (measured:
pure-Python multiprocessing shows the SAME degradation with zero Spark
involved) pollutes the number.  SECONDARY evidence reported alongside:
single-JVM thread scaling (pinned local[8] vs local[32]) which saturates
the one-JVM Arrow pump by design, and 1-vs-2-executor independence.
Full measurement matrix + analysis: BENCH.md.

``--smoke`` runs a tiny end-to-end pass (used by the verify skill).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FIXTURE_SCALE = float(os.environ.get("BENCH_FIXTURE_SCALE", "8"))
REPLICAS = int(os.environ.get("BENCH_REPLICAS", "8"))
CORPUS_DIR = os.environ.get("BENCH_CORPUS_DIR", "/tmp/ocrx_bench_corpus")


def _spark(cpus: int, extra: dict | None = None):
    from ocr_table_extractor_to_csv_spark.session import get_spark

    conf = {"spark.ui.enabled": "false"}
    conf.update(extra or {})
    return get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=conf,
    )


def _force(df) -> int:
    """Materialize every column without writing (noop sink); returns rows."""
    df = df.cache()
    n = df.count()
    df.write.format("noop").mode("overwrite").save()
    df.unpersist()
    return n


def materialize_corpus(spark, sf_dir: str, path: str, fixture_scale: float, replicas: int) -> int:
    """Deterministic bench corpus -> parquet (grid pages replicated with
    unique urls + the full fixture-family mix incl. giants)."""
    from pyspark.sql import functions as F

    from ocr_table_extractor_to_csv_spark.sources.pages import (
        fixture_pages,
        pages_from_documents,
    )

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        grid = (
            pages_from_documents(docs)
            .crossJoin(spark.range(replicas).select(F.col("id").alias("rep")))
            .select(F.concat("url", F.lit("#"), F.col("rep")).alias("url"), "html")
        )
        fx = fixture_pages(spark, scale=fixture_scale, giant_tokens=20000).select("url", "html")
        grid.unionByName(fx).repartition(64).write.mode("overwrite").parquet(path)
        # pre-split shard dirs: a real cluster hands each executor its own
        # input splits; a shared-corpus scan+filter per worker measurably
        # drags the 4-executor level (redundant decode of 4x the data)
        full = spark.read.parquet(path)
        for i in range(4):
            full.where(F.pmod(F.xxhash64("url"), F.lit(4)) == i).repartition(
                8
            ).write.mode("overwrite").parquet(f"{path}_shard{i}")
    return spark.read.parquet(path).count()


def bench_extraction(spark, corpus_path: str, warm_passes: int = 1, trials: int = 3, shard=None):
    """Steady-state pages/sec through the full kernel.

    Input is parquet (bytes-proportional splits = inherent size-aware
    partitioning; no blanket shuffle — measured 30% tax).  Warm passes cover
    JVM JIT + Python worker spin-up; steady state is what scales to 100 TB.
    """
    from pyspark.sql import functions as F

    from ocr_table_extractor_to_csv_spark.operators.extract import extract_pages

    pages = spark.read.parquet(*corpus_path.split(","))
    if shard is not None:
        i, k = shard
        pages = pages.where(F.pmod(F.xxhash64("url"), F.lit(k)) == i)
    n_pages = pages.count()
    ext = extract_pages(pages, layout="auto")
    agg = [
        F.count("*").alias("n"),
        F.sum(F.octet_length("csv")).alias("csv_bytes"),
        F.sum(F.when(F.col("n_rows") > 0, 1).otherwise(0)).alias("tables"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
    ]
    for _ in range(warm_passes):
        ext.agg(F.count("*")).collect()
    rates, stats = [], None
    for _ in range(trials):
        t0 = time.perf_counter()
        stats = ext.agg(*agg).collect()[0]
        rates.append(n_pages / (time.perf_counter() - t0))
    assert stats.n == n_pages and stats.errors == 0, (stats.n, n_pages, stats.errors)
    rate = statistics.median(rates)
    return {
        "n_pages": n_pages,
        "pages_per_sec": round(rate, 1),
        "seconds": round(n_pages / rate, 3),
        "tables_per_sec": round(stats.tables * rate / n_pages, 1),
        "csv_bytes": int(stats.csv_bytes),
        "trial_rates": [round(r, 1) for r in rates],
    }


def bench_queries(spark, sf_dir: str, warm_passes: int = 1, trials: int = 3):
    """Per-query WARM MEDIANS (r2 verdict #1): one warm pass absorbs
    cold-JIT + first-query session spin-up, then the median of ``trials``
    runs is reported with the raw trial arrays alongside — so a reader can
    see variance without re-measuring."""
    import __spark_entry__ as entry_mod

    times, trial_arrays = {}, {}
    for name, q in entry_mod.queries().items():
        for _ in range(warm_passes):
            _force(q(spark, sf_dir))
        runs = []
        for _ in range(max(1, trials)):
            t0 = time.perf_counter()
            _force(q(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        times[name] = round(statistics.median(runs), 3)
        trial_arrays[name] = runs
    return times, trial_arrays


def run_default(args):
    spark = _spark(args.cpus)
    materialize_corpus(spark, args.sf_dir, args.corpus, args.fixture_scale, args.replicas)
    ext = bench_extraction(spark, args.corpus, warm_passes=args.warm, trials=args.trials)
    queries, trial_arrays = bench_queries(
        spark, args.sf_dir, warm_passes=args.warm, trials=args.trials
    )
    queries["extract_corpus"] = ext["seconds"]
    trial_arrays["extract_corpus"] = [
        round(ext["n_pages"] / r, 3) for r in ext["trial_rates"]
    ]
    total = round(sum(queries.values()), 3)
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "methodology": f"{args.warm} warm pass(es) then median of {args.trials} trials per query",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pages_per_sec": ext["pages_per_sec"],
        "tables_per_sec": ext["tables_per_sec"],
        "bench_pages": ext["n_pages"],
        "cpus": args.cpus,
        "full_report": "bench_out/report.json",
    }
    spark.stop()
    # full report (incl. per-query trial arrays) goes to a FILE — printing
    # it inline made the one-line stdout contract so long the driver's tail
    # capture truncated it (r3 BENCH parsed:null); stdout stays compact
    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/report.json", "w") as f:
        json.dump({**out, "query_trials": trial_arrays}, f, indent=1)
    print(json.dumps(out))


def run_extract_once(args):
    """Subprocess worker: pin affinity BEFORE the JVM starts, then bench."""
    if args.affinity:
        a, b = args.affinity.split("-")
        os.sched_setaffinity(0, set(range(int(a), int(b) + 1)))
    spark = _spark(args.cpus)
    shard = None
    if args.shard:
        i, k = args.shard.split("/")
        shard = (int(i), int(k))
    res = bench_extraction(
        spark, args.corpus, warm_passes=args.warm, trials=args.trials, shard=shard
    )
    spark.stop()
    print(json.dumps(res))


def _worker_cmd(args, cpus, affinity, shard=None):
    cmd = [
        sys.executable, os.path.abspath(__file__), "--extract-once",
        "--cpus", str(cpus), "--corpus", args.corpus,
        "--warm", str(args.warm), "--trials", str(args.trials),
        "--affinity", affinity,
    ]
    if shard:
        cmd += ["--shard", shard]
    return cmd


def run_scaling(args):
    spark = _spark(8)
    n_total = materialize_corpus(spark, args.sf_dir, args.corpus, args.fixture_scale, args.replicas)
    spark.stop()
    c = args.n  # cores per executor

    import copy

    all_shards = ",".join(f"{args.corpus}_shard{i}" for i in range(4))

    def solo():
        a = copy.copy(args)
        a.corpus = all_shards
        out = subprocess.run(
            _worker_cmd(a, c, f"0-{c-1}"), capture_output=True, text=True, check=True
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"1 executor local[{c}]: {r['pages_per_sec']} pages/s {r['trial_rates']}", file=sys.stderr)
        return r["pages_per_sec"]

    def quad():
        procs = []
        for i in range(4):
            a = copy.copy(args)
            a.corpus = f"{args.corpus}_shard{i}"
            procs.append(
                subprocess.Popen(
                    _worker_cmd(a, c, f"{i*c}-{(i+1)*c-1}"),
                    stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                )
            )
        rates = []
        for p in procs:
            stdout, _ = p.communicate()
            assert p.returncode == 0, stdout
            rates.append(json.loads(stdout.strip().splitlines()[-1])["pages_per_sec"])
        print(f"4 executors local[{c}]x4: {rates}", file=sys.stderr)
        return rates

    rounds = []
    for i in range(args.rounds):
        # alternate measurement order: host throughput drifts monotonically
        # over minutes, so a fixed solo-then-quad order biases the ratio in
        # whichever direction the machine is drifting
        if i % 2 == 0:
            s = solo()
            q = quad()
        else:
            q = quad()
            s = solo()
        rounds.append({"one": s, "four": round(sum(q), 1), "four_each": q,
                       "eff": round(sum(q) / (4 * s), 3)})
    effs = sorted(r["eff"] for r in rounds)
    eff = effs[len(effs) // 2]

    report = {
        "methodology": (
            f"executor-process scaling: 1 executor (one local[{c}] JVM pinned to {c} cores, "
            f"full corpus) vs 4 executors (four local[{c}] JVMs on disjoint {c}-core sets, "
            f"disjoint url-hash quarters); {args.rounds} round(s), fresh JVMs, {args.warm} "
            f"warm pass(es) + median of {args.trials} trials per worker; "
            "efficiency = median over rounds of sum(rate of 4)/(4 x rate of 1)"
        ),
        "corpus_pages": n_total,
        "cores_per_executor": c,
        "one_executor_pages_per_sec": statistics.median(r["one"] for r in rounds),
        "four_executors_pages_per_sec": statistics.median(r["four"] for r in rounds),
        "scaling_efficiency": eff,
        "criterion": ">= 0.8",
        "passed": eff >= 0.8,
        "rounds": rounds,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--fixture-scale", type=float, default=FIXTURE_SCALE)
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--corpus", default=CORPUS_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-once", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--affinity", default=None, help="pin to cores a-b before JVM start")
    ap.add_argument("--shard", default=None, help="i/k url-hash shard filter")
    ap.add_argument("--n", type=int, default=8, help="cores per simulated executor")
    # 2 warm passes: extraction-family queries need 2-3 passes to reach
    # steady state after JVM start (measured 26s -> 10s -> 4s -> ~1.7s on
    # the first query of a cold session); one pass recorded mid-warmup
    # medians for whichever query ran first
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3, help="interleaved scaling rounds")
    args = ap.parse_args()
    if args.smoke:
        args.sf_dir = "/root/testdata/sf0.001"
        args.cpus = min(args.cpus, 8)
        args.fixture_scale = 0.2
        args.replicas = 1
        args.corpus = "/tmp/ocrx_bench_corpus_smoke"
        args.warm = 0
        args.trials = 1
        run_default(args)
    elif args.extract_once:
        run_extract_once(args)
    elif args.scaling:
        run_scaling(args)
    else:
        run_default(args)
