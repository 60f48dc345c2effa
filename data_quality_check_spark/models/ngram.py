"""KenLM-style character n-gram language model with stupid backoff, in numpy.

Order-3 character LM over hashed buckets, trained on the embedded seed
corpus (all supported languages combined). Per-window log-probability:

    lp(w) = log P3(w)                      if trigram bucket seen in training
          = log(ALPHA) + log P2s(suffix)   otherwise (stupid backoff to the
                                           add-k-smoothed bigram estimate)

Perplexity of a text = exp(-mean window lp). Scoring is fully vectorized
over one concatenated buffer (models/hashing.py); float64 per-row math so
values are independent of batch geometry.

Texts with no complete trigram get PPL_EMPTY (a deterministic sentinel far
above any real perplexity) so the max_perplexity rule drops them.
"""

from __future__ import annotations

import numpy as np

from .. import corpus
from . import hashing

ORDER = 3
ALPHA = 0.4
PPL_EMPTY = 1.0e6


def train(sentences: list[str] | None = None) -> dict:
    """Train the LM; returns dict of numpy arrays (broadcast-friendly)."""
    if sentences is None:
        # all four languages, so natural text in any supported language
        # scores in-domain; junk/symbol-soup stays far out-of-domain
        sentences = [
            s for lang in sorted(corpus.SENTENCES)
            for s in corpus.SENTENCES[lang]
        ]
    c3 = hashing.count_table(sentences, ORDER)
    c2 = hashing.count_table(sentences, ORDER - 1)
    total3 = c3.sum()
    total2 = c2.sum()
    # log P3 only valid where c3>0; store -inf elsewhere (never read there)
    with np.errstate(divide="ignore"):
        lp3 = np.log(c3 / total3)
    lp2s = np.log((c2 + 0.5) / (total2 + 0.5 * hashing.N_BUCKETS))
    seen3 = c3 > 0
    return {"lp3": lp3, "lp2s": lp2s, "seen3": seen3}


def perplexity(texts, model: dict) -> np.ndarray:
    """Char-LM perplexity per text (float64 ndarray)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    buf, starts, _ = hashing.encode_batch(texts)
    h3, seg3 = hashing.ngram_hashes(buf, starts, ORDER)
    # stupid backoff: bigram suffix (bytes p+1, p+2) of each trigram window
    lp = np.where(
        model["seen3"][h3],
        model["lp3"][h3],
        np.log(ALPHA) + model["lp2s"][_suffix_bigram_hash(buf, starts, h3, seg3)],
    )
    total = hashing.segment_sum(lp, seg3, n)
    cnt = np.bincount(seg3, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.exp(-total / np.maximum(cnt, 1.0))
    return np.where(cnt < 1.0, PPL_EMPTY, ppl)


def _suffix_bigram_hash(buf, starts, h3, seg3):
    """Bigram-bucket hash of the last two bytes of each valid trigram window.

    Recomputes the same polynomial hash as hashing.ngram_hashes(order=2) at
    the trigram window's suffix position, vectorized.
    """
    n = int(buf.size)
    if h3.size == 0:
        return np.empty(0, dtype=np.int64)
    # positions of valid trigram windows: reconstruct from seg boundaries.
    # hashing.ngram_hashes masked invalid windows, so we must recompute the
    # valid positions identically here.
    m = n - ORDER + 1
    pos = np.arange(m, dtype=np.int64)
    seg = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + ORDER <= starts[seg + 1]
    vpos = pos[valid]
    a = buf.astype(np.int64)
    h = a[vpos + 1] * 31 + a[vpos + 2]
    h = (h * 2654435761) & 0xFFFFFFFF
    return (h >> 7) & (hashing.N_BUCKETS - 1)
