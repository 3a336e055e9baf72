"""Distributed BPE merge training — the tokenizer-training pass of a
pretraining-data pipeline (Sennrich et al. 2016's byte-pair-encoding
algorithm, expressed as the classic map-reduce it is).

Shape (what makes this scale):
  * the CORPUS is touched exactly once — one groupBy builds the word
    frequency table, and everything after runs on the VOCABULARY, whose
    size is bounded by ``top_words`` (a deterministic freq-desc/word-asc
    cap, which is also how reference BPE trainers bound their alphabet) —
    at 100 TB the vocab table is a few MB regardless of corpus bytes;
  * the bounded vocab is collected ONCE and the k merge iterations run on
    the driver (pair counting weighted by word frequency + the argmax +
    the merge rewrite over <= top_words strings — the same bounded-collect
    class as the IVF trainer); the corpus is never touched again;
  * the merge rewrite is a literal ``replace`` over a DOUBLE-space
    delimited symbol string: symbols are framed as ``'  s1  s2  ...  '``
    and the pair (l, r) rewrites ``' l  r '`` -> ``' lr '``.  Each match
    consumes only the INNER half of the two-space delimiters on its
    flanks, so consecutive occurrences of the winning pair never share
    consumed characters: one left-to-right non-overlapping replace pass
    merges ``a a a a`` to ``aa aa`` and ``a b a b`` to ``ab ab`` —
    EXACTLY reference BPE's greedy in-word merge scan, including the
    odd-run tail position (``a x5`` -> ``aa aa a``).  Both Spark and
    DuckDB replace non-overlapping left-to-right, so the rewrite is
    identical across engines with no fold/UDF machinery.  (r5 shipped a
    single-space variant whose shared delimiters merged only the first
    pair of each immediately-repeated occurrence — a documented
    divergence from reference BPE; the double-space framing closes it
    at zero extra cost, still one replace per merge rank.)

Determinism: pair selection orders by (count DESC, left ASC, right ASC);
symbols are substrings of lowercased tokens, so the tie-break compares
identically under Spark's and DuckDB's binary collations.

Returns the merge table — the artifact a tokenizer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

BPE_MERGES = 6
BPE_TOP_WORDS = 5000


def _spaced_col(word) -> F.Column:
    """'  c1  c2  ...  cn  ' — DOUBLE-space-delimited character symbols
    (see module docstring: double delimiters make one replace pass equal
    reference BPE's greedy merge scan).  Built via substr over a position
    sequence (cross-engine exact; both engines' split-on-empty behaviors
    differ, substr does not).  Symbols never contain spaces (words come
    from whitespace tokenization), so '  ' occurs only at boundaries."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(F.lit("  "), F.array_join(syms, "  "), F.lit("  "))


def word_freqs(documents: DataFrame, top_words: int = BPE_TOP_WORDS) -> DataFrame:
    """(word, freq) — the bounded training vocabulary: ONE corpus pass,
    deterministically capped to the ``top_words`` most frequent words
    (freq DESC, word ASC)."""
    return (
        documents.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_words)
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = BPE_MERGES,
    top_words: int = BPE_TOP_WORDS,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus vocabulary —
    (rank, left_sym, right_sym, pair_count) ordered by rank.

    ``pair_count`` is the frequency-weighted number of adjacent
    occurrences of the winning pair at the time it was chosen (counting
    every occurrence within a word, as reference BPE does).

    r7: the merge loop runs ON THE DRIVER over the collected vocabulary.
    The vocab is bounded by ``top_words`` REGARDLESS of corpus size (the
    same bounded-collect class as the IVF trainer's 1,024-row sample), so
    the corpus still gets exactly one distributed pass (``word_freqs``)
    while the k merge iterations cost zero Spark jobs instead of
    2k jobs + 2k cache swaps over a 5,000-row table (measured: the loop's
    scheduling overhead dominated the whole operator at sf0.1).  The
    driver-side replay is spec-identical by construction: Python
    ``str.replace`` and Spark ``replace`` both rewrite left-to-right
    non-overlapping; Python string comparison (code points) and Spark's
    binary collation order identically because UTF-8 byte order preserves
    code-point order; ``strip(' ')`` mirrors Spark ``trim`` (ASCII space
    only — tokens may legally contain non-ASCII spaces).
    """
    spark = documents.sparkSession
    # '  c1  c2  ...  ' framing, the exact _spaced_col spec (Spark
    # substring iterates code points, as Python iteration does)
    vocab = [
        ("  " + "  ".join(r.word) + "  ", int(r.freq))
        for r in word_freqs(documents, top_words).collect()
    ]

    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for spaced, freq in vocab:
            syms = spaced.strip(" ").split("  ")
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break  # vocabulary fully merged (tiny corpora)
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        vocab = [
            (spaced.replace(f" {l}  {r} ", f" {l}{r} "), freq)
            for spaced, freq in vocab
        ]

    return spark.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, pair_count long"
    ).orderBy("rank")


def token_count_trained(
    documents: DataFrame,
    merges: list | None = None,
    n_merges: int = BPE_MERGES,
    top_words: int = BPE_TOP_WORDS,
) -> DataFrame:
    """Per-document token count under the TRAINED tokenizer — the number
    a pretraining budget actually pays, vs the whitespace/regex proxies
    in textstats — (doc_id, n_words, n_bpe_tokens, tokens_per_word).

    ``merges`` is a list of (left, right) pairs in rank order (e.g. from
    :func:`bpe_train`'s output rows); when None it is trained here first.
    Encoding applies the merges IN RANK ORDER to every word — exactly the
    reference BPE apply rule — as a chain of k map-only literal replaces
    over the sentinel-spaced symbol string (same engine-identical rewrite
    as training; k is the merge count, so the whole encode is ONE
    projection, no joins, no shuffle beyond the final per-doc count).
    Word segmentation and the double-space merge framing follow
    bpe_train, so encoding matches reference BPE's greedy apply scan.

    Scale shape: the merge table is k rows of driver state (a tokenizer
    artifact, like the IVF centroids); the corpus pass is map-only.
    ``tokens_per_word`` = n_bpe_tokens / n_words compression accounting.
    """
    if merges is None:
        merges = [
            (r.left_sym, r.right_sym)
            for r in bpe_train(documents, n_merges, top_words).collect()
        ]
    toks = tokens_col(F.col("text"))
    word = F.explode_outer(toks).alias("word")
    ex = documents.select("doc_id", word).where(
        F.col("word").isNotNull() & (F.col("word") != "")
    )
    spaced = _spaced_col(F.col("word"))
    for l, r in merges:
        spaced = F.replace(spaced, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    n_syms = F.size(F.split(F.trim(spaced), "  "))
    per_word = ex.select("doc_id", n_syms.alias("n_syms"))
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 5).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("doc_id")
    )
