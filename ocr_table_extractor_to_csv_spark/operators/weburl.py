"""URL canonicalization + URL-level deduplication.

Web-corpus pipelines dedup by canonical URL *before* any content pass
(the same page is crawled many times under cosmetically different URLs:
host case, default ports, fragments, tracking parameters, ``/index.html``
directory forms).  URL dedup is O(n) string work + one hash groupBy —
orders of magnitude cheaper than content dedup, so it runs first and
typically removes a double-digit percentage of a crawl.

No reference analogue (the reference operates on single local files, not
crawls); semantics follow the conventional canonicalization rules used by
web-archive tooling:

* scheme and host are case-insensitive -> lowercased
* default ports (``:80`` for http, ``:443`` for https) are dropped
* the fragment is client-side only -> dropped
* ``utm_*`` tracking query parameters are dropped (other parameters are
  preserved in their original order — reordering would conflate URLs
  whose servers are order-sensitive)
* a trailing ``/index.html`` is folded to the directory form ``/``
* an empty path becomes ``/``

Everything is built-in Spark column expressions (JVM codegen, no Python),
and every regex uses explicit character classes so the Java and RE2
(DuckDB oracle) engines accept the same language.

Scale shape: canonicalization is map-only; the dedup is ONE groupBy on
the canonical URL (high-cardinality, well-spread key; count/min combine
map-side).  At 100 TB this is the cheapest of the dedup family — no
candidate joins, no banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL as a pure column
    expression.  URLs without a ``scheme://`` prefix are returned
    unchanged (trimmed of fragment only) rather than mangled."""
    # fragment is dropped first: it can contain any character and would
    # otherwise confuse the query split
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)

    authority = F.when(
        (scheme == "http") & authority.rlike(":80$"),
        F.regexp_replace(authority, r":80$", ""),
    ).when(
        (scheme == "https") & authority.rlike(":443$"),
        F.regexp_replace(authority, r":443$", ""),
    ).otherwise(authority)

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)

    path = F.regexp_replace(path, r"/index\.html$", "/")
    # directory form: a trailing slash is dropped (except the root path),
    # so /a/index.html, /a/ and /a all fold together
    path = F.when(
        path.endswith("/") & (path != "/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    # drop utm_* params, preserve everything else in original order
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.startswith("utm_"),
    )
    query = F.array_join(kept, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def with_synth_url(documents: DataFrame, slot_mod: int = 13) -> DataFrame:
    """Attach a deterministic synthetic ``url`` column to the documents
    table (which carries no URL), for tests/benchmarks: the canonical
    identity of a page is ``(source, doc_id % slot_mod)`` and the raw URL
    wraps it in md5-chosen cosmetic noise — scheme/host case, ``:80``,
    ``/index.html``, ``utm_*`` params, a fragment — exactly the variants
    ``canonicalize_url`` must fold.  Pure column expressions (md5 bits),
    so the DuckDB oracle reproduces the same bytes."""
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("url:"), F.col("doc_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("int")
    )
    host = F.concat(F.col("source"), F.lit(".example.com"))
    slot = (F.col("doc_id") % slot_mod).cast("string")
    raw = F.concat(
        F.when(b.bitwiseAND(F.lit(1)) == 1, F.lit("HTTP://")).otherwise(
            F.lit("http://")
        ),
        F.when(b.bitwiseAND(F.lit(2)) == 2, F.upper(host)).otherwise(host),
        F.when(b.bitwiseAND(F.lit(4)) == 4, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        slot,
        F.when(b.bitwiseAND(F.lit(8)) == 8, F.lit("/index.html")).otherwise(
            F.lit("")
        ),
        F.when(b.bitwiseAND(F.lit(16)) == 16,
               F.lit("?utm_source=feed&utm_medium=rss")).otherwise(F.lit("")),
        F.when(b.bitwiseAND(F.lit(32)) == 32,
               F.concat(F.lit("#s"), (F.col("doc_id") % 7).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return documents.withColumn("url", raw)


def url_dedup(documents_with_url: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup: one row per canonical URL with the group size,
    the number of distinct raw spellings folded, and the keeper (min
    doc_id — deterministic on any partitioning).

    Returns (canon_url, n_docs, n_variants, keeper_doc_id) ordered by
    canon_url."""
    return (
        documents_with_url.select(
            "doc_id",
            F.col(url_col).alias("_raw"),
            canonicalize_url(F.col(url_col)).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_raw").alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("canon_url")
    )


def url_keepers(documents_with_url: DataFrame, url_col: str = "url") -> DataFrame:
    """The keeper-election half of :func:`url_dedup` as a reusable frame:
    one (doc_id) row per canonical URL — min doc_id, deterministic on any
    partitioning — for rows WITH a usable URL, plus EVERY row whose URL is
    null or empty.  URL-less documents cannot be URL-deduped; collapsing
    them onto the shared null/'' group key would silently keep one and
    drop the rest of them, so they pass through instead."""
    # split on the CANONICAL form, not the raw: a raw like '#frag' or '?x'
    # canonicalizes to '' and would otherwise collapse with every other
    # degenerate spelling into one group (same hazard as the null key)
    c = documents_with_url.select(
        "doc_id", canonicalize_url(F.col(url_col)).alias("_canon")
    )
    keyed = c.where(F.col("_canon").isNotNull() & (F.col("_canon") != ""))
    keyless = c.where(F.col("_canon").isNull() | (F.col("_canon") == ""))
    keepers = (
        keyed.groupBy("_canon")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return keepers.unionByName(keyless.select("doc_id"))
