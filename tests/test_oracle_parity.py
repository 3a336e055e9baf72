"""Pre-verify the driver's correctness gate: each queries() entry must match
its oracle_sql() twin on the sf0.01 test tables (row count + schema-ish +
value multiset).  This is the same comparison the driver runs, done locally
so regressions never reach CORRECTNESS_r{N}.json."""

import math
import os
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

# override with SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 for the 10x sweep
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{round(v, 6):.6f}"
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


def _type_kind(t: str) -> str:
    """Coarse type family: the driver's value-hash is typed, so e.g. a DuckDB
    HUGEINT sum vs a Spark BIGINT hash-mismatches even when values agree
    (the round-1 simhash red row).  Catch that drift locally."""
    t = t.lower()
    if "hugeint" in t:
        return "int128"
    if any(k in t for k in ("tinyint", "smallint", "bigint", "int", "long")):
        return "int"
    if any(k in t for k in ("float", "double", "real", "decimal")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("varchar", "char", "string", "text")):
        return "str"
    return t


def assert_gate_shape(sdf, name):
    """The external driver canonicalizes results with pandas.sort_values,
    which cannot sort list/dict-valued cells (the r5 `embedding_quantize`
    red row: ARRAY<INT> -> 'unhashable type: list').  No registry query
    may emit array/map/struct columns — serialize them (array_join /
    to_json) in the driver row, keep rich types for library callers."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: nested-type output columns {bad} break the external "
        "gate's pandas canonicalizer — serialize them in the driver row"
    )


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    assert_gate_shape(sdf, name)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    s_types = {c: _type_kind(t) for c, t in sdf.dtypes}

    rel = ddb.sql(entry_mod.oracle_sql()[name])
    d_cols = list(rel.columns)
    d_types = {c: _type_kind(str(t)) for c, t in zip(d_cols, rel.types)}
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    for c in s_cols:
        assert s_types[c] == d_types.get(c), (
            f"{name}.{c}: type family differs (spark {s_types[c]} vs oracle "
            f"{d_types.get(c)}) — the driver's typed value-hash will mismatch"
        )
    assert len(s_rows) == len(d_rows), f"{name}: row counts {len(s_rows)} vs {len(d_rows)}"
    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_queries_and_oracles_key_identical():
    """r4 verdict #1 insurance: EVERY queries() entry must carry an oracle
    (and vice versa) — a key drift would silently demote a query to the
    weaker rows-only check in the driver's sweep."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert q == o, f"only in queries: {sorted(q - o)}; only in oracles: {sorted(o - q)}"


def test_rows_only_queries_run(spark):
    oracles = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert_gate_shape(df, name)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "n_rows", "n_cols", "csv_md5", "text_md5"}
