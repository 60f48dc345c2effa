"""Text-analysis operators: token counting, quality scoring, fingerprinting,
language ID — the document-corpus views of the transcript rules.

All native expressions (whole-stage codegen); langid is the broadcast-model
pandas UDF from functions/udfs.py. Fingerprints use md5 (identical builtin
in Spark and DuckDB) plus a numpy rolling-hash variant for tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_RULESET, RuleSet
from ..functions import rules
from ..operators.dedup import normalize_text


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword-piece count (regex segmentation:
    letter runs / digit runs / single symbols — a deterministic proxy for
    BPE pre-tokenization)."""
    text = F.col(text_col)
    words = F.filter(F.split(text, rules.WS), lambda w: w != F.lit(""))
    pieces = F.filter(
        F.split(
            F.regexp_replace(
                text,
                "([A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^A-Za-z0-9À-ÖØ-öø-ÿ \t\n\r])",
                " $1 ",
            ),
            "[ \t\n\r]+",
        ),
        lambda w: w != F.lit(""),
    )
    return docs.select(
        "doc_id",
        F.coalesce(F.length(text), F.lit(0)).alias("n_chars"),
        F.coalesce(F.size(words), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.size(pieces), F.lit(0)).alias("n_pieces"),
    )


def quality_scores(docs: DataFrame, cfg: RuleSet = DEFAULT_RULESET,
                   text_col: str = "text") -> DataFrame:
    """Per-document heuristic quality features + pass/fail flag, reusing the
    transcript rule expressions verbatim."""
    text = F.col(text_col)
    feats = rules.feature_columns(text)
    flags = rules.heuristic_flags(feats, text, cfg)
    reasons = rules.reasons_array(flags)
    return docs.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["n_chars"].alias("n_chars"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["symbol_ratio"].alias("symbol_ratio"),
        feats["stopword_frac"].alias("stopword_frac"),
        feats["alpha_frac"].alias("alpha_frac"),
        reasons.alias("fail_reasons"),
        (F.size(reasons) == 0).alias("passes"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over normalized text (stable across
    engines), used as the exact-dedup key."""
    return docs.select(
        "doc_id",
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )


def rolling_fingerprint_np(texts: list, window: int = 16) -> np.ndarray:
    """Numpy rolling-hash fingerprint (min-of-window polynomial hashes) —
    winnowing-style; used in tests as the non-cryptographic variant."""
    from ..models import hashing

    n = len(texts)
    buf, starts, _ = hashing.encode_batch(texts, max_bytes=4096)
    h, seg = hashing.ngram_hashes(buf, starts, min(window, 8))
    out = np.full(n, (1 << 61) - 1, dtype=np.int64)
    if h.size:
        np.minimum.at(out, seg, h.astype(np.int64) * 2654435761 % ((1 << 61) - 1))
    return out


def langid_table(docs: DataFrame, bc_models, text_col: str = "text") -> DataFrame:
    """Language-ID over a document corpus via the broadcast numpy model."""
    from ..functions.udfs import make_scores_udf

    scores = make_scores_udf(bc_models)
    return (
        docs.withColumn("_s", scores(F.col(text_col)))
        .select("doc_id", F.col("_s.lang").alias("lang_pred"),
                F.col("_s.lang_conf").alias("lang_conf"),
                F.col("_s.ppl").alias("ppl"))
    )
