"""Reusable column expressions (SURVEY.md §2.7 relational analogues).

These are the DF-level *analogues* of kernel scalar functions, for corpus
analytics over extracted tables.  They are NOT used in the byte-exact kernel
path — the kernel keeps its verbatim Python semantics (e.g. to_number's ')'
quirk is deliberately not reproducible with cast())."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def csv_text(csv_bin: Column) -> Column:
    """Decode a BINARY csv column (utf-8-sig) to text without the BOM."""
    return F.regexp_replace(F.decode(csv_bin, "UTF-8"), "^﻿", "")


def normalized_text(text: Column) -> Column:
    """lower + whitespace collapse + trim (the dedup fingerprint base)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def is_number_like_col(c: Column) -> Column:
    """DF analogue of postprocess._is_number_like (postprocess.py:9-16)."""
    z = F.regexp_replace(F.trim(c), " ", "")
    return (z == "-") | z.rlike(r"^\$?\(?-?\d{1,3}(?:[,\s]\d{3})*(?:\.\d+)?\)?$")


def to_number_col(c: Column) -> Column:
    """Approximate numeric coercion for analytics (NOT byte-exact: the
    kernel's to_number keeps e.g. '(57,519)' unconverted; this casts it)."""
    z = F.trim(c)
    neg = z.startswith("(") & z.endswith(")")
    digits = F.regexp_replace(z, r"[^\d\.\-]", "")
    val = digits.try_cast("double")  # ANSI-safe: malformed -> NULL
    return F.when(z == "-", F.lit(0.0)).otherwise(
        F.when(neg, -val).otherwise(val)
    )
