"""Token counting for training-data budgeting [SURVEY §2.11 N4]:
whitespace tokens plus a BPE-ish regex segmentation (GPT-2-style
pattern, rewritten lookahead-free so it runs identically on Java
regex (Spark) and RE2 (DuckDB oracle)).

Counting runs entirely JVM-side via regexp_extract_all — at 100 TB
this is a scan-plus-codegen pass, no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# GPT-2's segmentation pattern minus the `\s+(?!\S)` lookahead (RE2
# has no lookahead; trailing-space attachment differs only on runs of
# whitespace, which we count as single tokens either way).
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bpe_ish_tokens(text: Column | str) -> Column:
    return F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), F.lit(0))


def token_counts(text: Column | str) -> dict[str, Column]:
    t = _c(text)
    ws = F.split(F.trim(t), r"\s+")
    return {
        "n_ws_tokens": F.size(ws).cast("long"),
        "n_bpe_tokens": F.size(bpe_ish_tokens(t)).cast("long"),
        "n_chars": F.length(t).cast("long"),
        # chars-per-BPE-token: the usual budget heuristic sanity stat.
        "chars_per_tok": F.round(
            F.when(
                F.size(bpe_ish_tokens(t)) > 0,
                F.length(t) / F.size(bpe_ish_tokens(t)),
            ).otherwise(F.lit(0.0)),
            4,
        ),
    }
