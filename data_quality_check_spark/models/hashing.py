"""Vectorized byte n-gram hashing shared by langid and the char-ngram LM.

Design goal: zero per-row Python in the scoring hot path. A whole Arrow
batch of texts is concatenated into ONE uint8 buffer; rolling n-gram hashes
over the buffer are computed with numpy array ops; windows that cross text
boundaries are masked out; per-text reductions use np.bincount with segment
ids. This is the Spark-idiomatic replacement for the reference's per-record
field loop (/root/reference/dynamic-message/src/lib.rs:11-258).

All arithmetic is int64/float64 → results are bit-identical regardless of
batch geometry, partitioning, or parallelism level.
"""

from __future__ import annotations

import numpy as np

N_BUCKETS = 1 << 16
_MASK = N_BUCKETS - 1


def encode_batch(texts, max_bytes: int = 512):
    """Encode a sequence of (possibly None) strings to one flat uint8 buffer.

    Returns (buf, starts, lens) where starts has len(texts)+1 entries and
    text i occupies buf[starts[i]:starts[i+1]].
    """
    bufs = []
    for t in texts:
        if t is None:
            bufs.append(b"")
        else:
            bufs.append(t.encode("utf-8", "ignore")[:max_bytes])
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return buf, starts, lens


def ngram_hashes(buf: np.ndarray, starts: np.ndarray, order: int,
                 raw: bool = False):
    """Hashes of all `order`-byte windows that do not cross a text boundary.

    Returns (hashes, seg): bucket ids in [0, N_BUCKETS) — or full 32-bit
    mixed hashes when raw=True (MinHash/SimHash need the resolution) — and
    the owning text index per window. Deterministic polynomial hash, int64.
    """
    n = int(buf.size)
    if n < order:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    a = buf.astype(np.int64)
    m = n - order + 1
    h = np.zeros(m, dtype=np.int64)
    for k in range(order):
        h = (h * 31 + a[k : k + m]) & 0xFFFFFFFFFFFF
    h = (h * 2654435761) & 0xFFFFFFFF
    if not raw:
        h = (h >> 7) & _MASK
    pos = np.arange(m, dtype=np.int64)
    seg = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + order <= starts[seg + 1]
    return h[valid], seg[valid]


def trigram_pass(texts, max_bytes: int = 512):
    """ONE shared hashing pass for langid + perplexity scoring.

    Returns (a, starts, h3, seg, vpos):
      a     int64 view of the concatenated buffer
      h3    bucket ids of all valid trigram windows (same values as
            ngram_hashes(order=3) — identical formula, bit-identical)
      seg   owning text index per window
      vpos  buffer position of each window (for suffix-bigram backoff)

    The segment mapping uses np.repeat over text lengths instead of
    searchsorted — O(m) instead of O(m log n), and computed once instead of
    once per model.
    """
    buf, starts, lens = encode_batch(texts, max_bytes)
    n = len(lens)
    a = buf.astype(np.int64)
    m = int(buf.size) - 2
    if m <= 0:
        e = np.empty(0, dtype=np.int64)
        return a, starts, e, e, e
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)[:m]
    pos = np.arange(m, dtype=np.int64)
    valid = pos + 3 <= starts[seg + 1]
    h = (a[:m] * 31 + a[1:m + 1]) * 31 + a[2:m + 2]
    h = (h * 2654435761) & 0xFFFFFFFF
    h3 = (h >> 7) & _MASK
    return a, starts, h3[valid], seg[valid], pos[valid]


def count_table(texts, order: int) -> np.ndarray:
    """Bucketed n-gram counts over a training corpus (float64, N_BUCKETS)."""
    buf, starts, _ = encode_batch(texts, max_bytes=1 << 20)
    h, _ = ngram_hashes(buf, starts, order)
    return np.bincount(h, minlength=N_BUCKETS).astype(np.float64)


def segment_sum(values: np.ndarray, seg: np.ndarray, n: int) -> np.ndarray:
    """Sum `values` grouped by segment id into an array of length n."""
    return np.bincount(seg, weights=values, minlength=n)
