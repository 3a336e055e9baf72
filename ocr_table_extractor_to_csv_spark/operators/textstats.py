"""Text-analysis operators for a training-data pipeline over ``documents``.

All pure built-in ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen, no Python in the hot path.  Each operator has an exact
ANSI-SQL twin (the DuckDB oracle in __spark_entry__.py); formulas are frozen
here as the single spec both sides implement.

Specs (shared with the SQL oracles — change together or not at all):
  tokens(text)   = split(trim(lower(text)), '\\s+'); [] when trim = ''
  fingerprint    = md5(trim(regexp_replace(lower(text), '\\s+', ' ')))
  punct_ratio    = punct_chars / max(1, n_chars);  punct = [.,;:!?]
  stopword_ratio = hits(lang stop set) / max(1, n_tokens)
  quality_score  = round(least(1, n_tokens/50) - punct_ratio, 5)
  lang_id        = argmax over per-language stopword hits, 'und' on ties/zero
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately tiny, frozen stopword sets (shared with the SQL oracle)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
}


def tokens_col(text: Column) -> Column:
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )


# GPT-2-style pretokenizer approximation (contractions, space-prefixed word /
# number / punctuation runs) — the "BPE-ish" token ESTIMATOR a data pipeline
# uses for budget accounting before real tokenization.  Kept to a regex
# subset that Java (Spark) and RE2 (DuckDB) treat identically: whitespace is
# an EXPLICIT class, not \s (Java's \s includes vertical tab, RE2's does
# not — a real divergence on OCR-ish text).
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^ \t\n\r\f\x0Ba-z0-9']+"


def token_count_bpe(documents: DataFrame) -> DataFrame:
    n = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_TOKEN_RE), F.lit(0))
    )
    return documents.select("doc_id", n.alias("n_bpe_tokens"))


def _stop_hits(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def quality_columns(text: Column) -> dict:
    """The quality formula as named Column expressions (single spec shared
    by text_quality and curation.curate)."""
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    punct_ratio = punct / F.greatest(F.lit(1), n_chars)
    stop_ratio = _stop_hits(toks, "en") / F.greatest(F.lit(1), n_tokens)
    avg_tok = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(F.lit(1), n_tokens)
    quality = F.least(F.lit(1.0), n_tokens / F.lit(50.0)) - punct_ratio
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(avg_tok, 5),
        "punct_ratio": F.round(punct_ratio, 5),
        "stopword_ratio": F.round(stop_ratio, 5),
        "quality_score": F.round(quality, 5),
    }


def text_quality(documents: DataFrame) -> DataFrame:
    cols = quality_columns(F.col("text"))
    return documents.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def lang_pred_col(text: Column) -> Column:
    """argmax-over-stopword-hits language prediction (single spec shared by
    lang_id and curation.curate)."""
    toks = tokens_col(text)
    hits = {lang: _stop_hits(toks, lang) for lang in STOPWORDS}
    pred = F.lit("und")
    # deterministic priority order on ties: declared language order, but only
    # a STRICT maximum wins; ties (incl. all-zero) stay 'und'
    for lang in STOPWORDS:
        others = [hits[o] for o in STOPWORDS if o != lang]
        pred = F.when(
            (hits[lang] > F.lit(0)) & (hits[lang] > F.greatest(*others)), F.lit(lang)
        ).otherwise(pred)
    return pred


def lang_id(documents: DataFrame) -> DataFrame:
    toks = tokens_col(F.col("text"))
    hits = {lang: _stop_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    return documents.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        best.alias("best_hits"),
        lang_pred_col(F.col("text")).alias("lang_pred"),
    )


def norm_text_col(text: Column) -> Column:
    """Whitespace-normalized lowercase text (the dedup fingerprint base)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(documents: DataFrame) -> DataFrame:
    return documents.select("doc_id", F.md5(norm_text_col(F.col("text"))).alias("fp"))
