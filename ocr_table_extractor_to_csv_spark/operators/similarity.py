"""Similarity search over the ``embeddings`` table (array<float>).

Two paths, as a training pipeline needs both:
  * ``brute_force_topk`` — exact cosine top-k for a deterministic query
    sample.  The dot product runs JVM-side (``F.aggregate`` over zipped
    arrays in DOUBLE) so there is no Python in the loop; candidate count is
    |queries| x |corpus|, which is the baseline/oracle, not the scale path.
  * ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit sketch per
    vector (md5-seeded deterministic hyperplanes), candidates share a
    bucket, exact cosine re-rank within buckets.  At 10^9 vectors this is
    the linear-cost ANN path; buckets shard naturally across executors.

Norms are precomputed once per side; cosine = dot / (norm_q * norm_c),
computed in double precision with strict left-to-right accumulation so the
DuckDB oracle (same fold order) matches bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIM_ROUND = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(
    embeddings: DataFrame, k: int = 5, query_mod: int = 50
) -> DataFrame:
    """Top-k cosine neighbors for vec_id % query_mod == 0 queries.

    Self-match excluded; rank ties broken by neighbor id (deterministic).
    """
    from pyspark.sql.window import Window

    base = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = base.where(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = q.join(base.where(F.col("nrm") > 0), F.col("vec_id") != F.col("query_id"))
    sim = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", SIM_ROUND).alias("cos_sim"))
    )


def hyperplane_sketch(
    embeddings: DataFrame, n_planes: int = 8, plane_offset: int = 0
) -> DataFrame:
    """Sign-bit sketch: bit_p = (sum_i emb[i] * w_p[i]) > 0 with
    deterministic pseudo-random weights w_p[i] = md5u(p||i) in [-1, 1].
    ``plane_offset`` decorrelates the planes of different hash tables."""
    dim = F.size(F.col("embedding"))
    plane = F.explode(
        F.sequence(F.lit(plane_offset), F.lit(plane_offset + n_planes - 1))
    ).alias("plane")
    e = embeddings.select("vec_id", "embedding", plane)
    # weight(p, i): fold md5 hex prefix to [-1,1]
    proj = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(0), dim - 1),
            lambda x, i: x.cast("double")
            * (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("plane").cast("string"), F.lit(":"), i.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(2147483647.5)
                - F.lit(1.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    bits = e.select("vec_id", "plane", (proj > 0).cast("int").alias("bit"))
    return bits.groupBy("vec_id").agg(
        F.sum(F.expr(f"shiftleft(CAST(bit AS BIGINT), plane - {plane_offset})")).alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    n_planes: int = 6,
    n_tables: int = 8,
) -> DataFrame:
    """ANN: exact cosine re-rank within multi-table hyperplane buckets.

    L independent hash tables (decorrelated plane sets) union their
    same-bucket candidates — the standard recall lever: expected candidate
    fraction ~ L / 2^planes; per-neighbor hit rate 1-(1-(1-theta/pi)^p)^L.
    The sf test embeddings are near-uniform random (theta ~ 60-70 deg, the
    LSH worst case): defaults measure recall@5 ~= 0.42 there (pinned as a
    regression floor in tests), while clustered real-world embeddings
    (theta ~ 20-35 deg) land ~0.9 at the same settings.  Everything stays
    JVM-side column expressions.
    """
    from pyspark.sql.window import Window

    tables = [
        hyperplane_sketch(embeddings, n_planes, plane_offset=t * 1000).withColumn(
            "table", F.lit(t)
        )
        for t in range(n_tables)
    ]
    sk = tables[0]
    for t in tables[1:]:
        sk = sk.unionByName(t)
    base = embeddings.join(sk, "vec_id").select(
        "vec_id", "embedding", "table", "bucket", _norm(F.col("embedding")).alias("nrm")
    )
    q = base.where(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("table").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = (
        q.join(
            base.where(F.col("nrm") > 0),
            (F.col("table") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "q_emb", "q_nrm", "vec_id", "embedding", "nrm")
        .dropDuplicates(["query_id", "vec_id"])  # union of tables
    )
    sim = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", SIM_ROUND).alias("cos_sim"))
    )
