"""Hand-derived and property checks for the KMV cardinality sketch.

Determinism is the operator's whole claim, so checks are ==-level: a
pure-Python twin over hashlib (same 60-bit md5 prefix, same integer
estimator), the exact small-cardinality path, mergeability, and
partitioning invariance.  Cross-engine value identity is separately
covered by the generated DuckDB oracle in test_oracle_parity.
"""

import hashlib

from ocr_table_extractor_to_csv_spark.operators.sketches import (
    HASH_SPACE,
    KMV_K,
    kmv_distinct,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, n=3):
    toks = text.lower().strip().split()
    if len(toks) >= n:
        grams = {"_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    else:
        grams = {"_".join(toks)}
    return {g for g in grams if g}


def _py_kmv(texts, k=KMV_K):
    hs = sorted({_h60(s) for t in texts for s in _shingles(t)})
    if len(hs) < k:
        return len(hs), None, len(hs)
    kth = hs[k - 1]
    return k, kth, (k - 1) * (HASH_SPACE // kth)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_small_cardinality_is_exact_and_kth_is_null(spark):
    # 2 docs, 3 distinct shingles total ("a b c d" and "c d e" overlap none)
    rows = [(0, "s1", "a b c d"), (1, "s1", "c d e")]
    [r] = kmv_distinct(_docs(spark, rows)).collect()
    want = _shingles("a b c d") | _shingles("c d e")
    assert (r["n_sketch"], r["kth_min"], r["distinct_est"]) == (
        len(want),
        None,
        len(want),
    )


def test_full_sketch_matches_python_twin_exactly(spark):
    # >> KMV_K distinct shingles in one source, a second source stays small
    texts = [" ".join(f"w{(i * 7 + j) % 211}" for j in range(40)) for i in range(60)]
    rows = [(i, "big", t) for i, t in enumerate(texts)] + [
        (999, "tiny", "x y z")
    ]
    got = {r["source"]: r for r in kmv_distinct(_docs(spark, rows)).collect()}
    n, kth, est = _py_kmv(texts)
    assert n == KMV_K and kth is not None
    assert (
        got["big"]["n_sketch"],
        got["big"]["kth_min"],
        got["big"]["distinct_est"],
    ) == (n, kth, est)
    assert got["tiny"]["distinct_est"] == len(_shingles("x y z"))
    # estimator sanity on this fixed input: within 35% of truth (KMV
    # stderr ~ 1/sqrt(k-2) ~= 13%; deterministic data, so not flaky)
    true = len({s for t in texts for s in _shingles(t)})
    assert true > KMV_K and abs(est - true) / true < 0.35


def test_partitioning_invariance_bit_exact(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(f"t{(i * 13 + j) % 97}" for j in range(20)))
        for i in range(90)
    ]
    df = _docs(spark, rows)
    key = lambda r: (r["source"], r["n_sketch"], r["kth_min"], r["distinct_est"])  # noqa: E731
    a = sorted(map(key, kmv_distinct(df.coalesce(1)).collect()))
    b = sorted(map(key, kmv_distinct(df.repartition(7, "doc_id")).collect()))
    assert a == b


def test_mergeability_union_equals_merged_sketch(spark):
    # min-k over A union B == min-k over (min-k(A) union min-k(B)):
    # computed on two halves, merged in Python, equals the one-shot sketch
    texts = [" ".join(f"m{(i * 11 + j) % 503}" for j in range(30)) for i in range(80)]
    rows = [(i, "s", t) for i, t in enumerate(texts)]
    [whole] = kmv_distinct(_docs(spark, rows)).collect()
    half_hashes = []
    for part in (rows[:40], rows[40:]):
        hs = sorted({_h60(s) for _i, _src, t in part for s in _shingles(t)})
        half_hashes.append(hs[:KMV_K])
    merged = sorted(set(half_hashes[0]) | set(half_hashes[1]))[:KMV_K]
    assert whole["n_sketch"] == KMV_K
    assert whole["kth_min"] == merged[KMV_K - 1]


def test_kmv_merge_law_state_api(spark, tmp_path):
    """The O(delta) incremental path: kmv_merge(state(half1), half2) must
    equal kmv_state(whole) ROW-FOR-ROW (the KMV merge law, == level),
    including after a parquet round-trip of the state (plain table, no
    session state); stats over either are identical."""
    from ocr_table_extractor_to_csv_spark.operators.sketches import (
        kmv_merge,
        kmv_state,
        kmv_stats,
    )

    rows = [
        (i, f"s{i % 3}", " ".join(f"g{(i * 19 + j) % 401}" for j in range(25)))
        for i in range(100)
    ]
    whole = _docs(spark, rows)
    path = str(tmp_path / "kmv_state.parquet")
    kmv_state(_docs(spark, rows[:50])).write.parquet(path)
    state1 = spark.read.parquet(path)
    merged = kmv_merge(state1, _docs(spark, rows[50:]))
    key = lambda r: (r["source"], r["h"])  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, kmv_state(whole).collect())
    )
    skey = lambda r: (r["source"], r["n_sketch"], r["kth_min"], r["distinct_est"])  # noqa: E731
    assert sorted(map(skey, kmv_stats(merged).collect())) == sorted(
        map(skey, kmv_distinct(whole).collect())
    )


def test_k_validation(spark):
    df = _docs(spark, [(0, "s", "a b c")])
    for bad in (1, 0, True, 2.0):
        try:
            kmv_distinct(df, k=bad)
        except ValueError:
            continue
        raise AssertionError(f"expected ValueError for k={bad}")
