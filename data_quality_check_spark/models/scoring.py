"""Fused batch scorer: langid + perplexity from ONE shared hashing pass.

Both models consume the same trigram buckets of the same UTF-8 buffer, so
the encode + hash + segment work (the dominant cost) is done once per Arrow
batch instead of once per model. Bit-identical to calling
langid.predict() and ngram.perplexity() separately (same formulas, same
float64 order) — asserted by tests/test_models.py.
"""

from __future__ import annotations

import numpy as np

from . import hashing, langid, ngram


def score_batch(texts, m_lang: dict, m_lm: dict):
    """Returns (lang, lang_conf, ppl) arrays for a batch of texts."""
    n = len(texts)
    if n == 0:
        e = np.empty(0, dtype=np.float64)
        return np.empty(0, dtype=object), e, e
    a, _starts, h3, seg, vpos = hashing.trigram_pass(texts)
    lang, conf = langid.predict_pass(n, h3, seg, m_lang)
    ppl = ngram.perplexity_pass(n, a, h3, seg, vpos, m_lm)
    return lang, conf, ppl
