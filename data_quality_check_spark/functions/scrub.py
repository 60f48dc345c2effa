"""Compiled-regex PII/toxicity scrubbing with one canonical pattern list.

The reference's content check (`validate_json_message_content`,
/root/reference/data-quality-server/src/json_validation.rs:165-194) is a
single field-equality predicate; the north rule generalizes it to an ordered
chain of regex replacements over turn text.

One pattern list drives THREE implementations that must agree byte-for-byte:
  * Spark:   chained native F.regexp_replace (JVM regex, whole-stage codegen
             — the fast path; no Python in the hot loop)
  * DuckDB:  regexp_replace(..., 'g') chain (the driver's oracle)
  * Python:  re.sub chain (the in-repo oracle, tests/)

To make tri-engine byte equality structural rather than lucky, patterns are
restricted to the common subset of Java regex / RE2 / Python re semantics:
explicit ASCII character classes (never \\d \\w \\s or \\b — their Unicode
behavior differs across engines), no lookaround, no backreferences, and a
leading (?i) only where all three engines accept it.

Order is significant (e.g. URL before IPv4 so hosts aren't half-scrubbed;
credit-card before phone so a 16-digit run isn't partially phone-masked).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .. import corpus

# (name, pattern, replacement) — applied strictly in this order.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "url",
        r"https?://[^ \t\n\r<>\"']+",
        "<URL>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "credit_card",
        r"[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}",
        "<CC>",
    ),
    (
        "ssn",
        r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
        "<SSN>",
    ),
    (
        "phone",
        r"(?:\+[0-9]{1,2}[-. ])?(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}",
        "<PHONE>",
    ),
    (
        "toxic",
        "(?i)(?:" + "|".join(re.escape(t) for t in corpus.TOXIC_TERMS) + ")",
        "<TOXIC>",
    ),
)


def scrub_column(col):
    """Spark Column: apply the full scrub chain via native regexp_replace.

    The six PII patterns all require a digit, '@', or the literal 'http'
    (email needs '@'; url needs 'http'; ipv4/cc/ssn/phone need digits), so
    rows without any of those skip the whole PII chain behind one cheap
    guard — semantically identical output, ~6 fewer regex passes on clean
    text (most of a natural corpus).

    (r6 note: a finer per-family guard — email behind contains('@'), url
    behind contains('http'), digit family behind rlike('[0-9]') — was
    measured byte-identical and ~25% faster in a standalone scrub
    projection, but each staged `when(out...) .otherwise(out)` references
    the running expression 3x, and the resulting expression-tree blowup
    inside label_turns' already-huge projection made the FULL pipeline
    ~20% slower. Rejected; guards stay single-level.)
    """
    from pyspark.sql import functions as F

    pii = col
    for _name, pat, repl in PATTERNS:
        if _name == "toxic":
            continue
        pii = F.regexp_replace(pii, pat, repl)
    guarded = F.when(
        col.rlike("[0-9@]") | col.contains("http"), pii
    ).otherwise(col)
    toxic = PATTERNS[-1]
    assert toxic[0] == "toxic"
    return F.regexp_replace(guarded, toxic[1], toxic[2])


def scrub_sql(expr: str) -> str:
    """DuckDB SQL expression applying the same chain to `expr`."""
    out = expr
    for _name, pat, repl in PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


@lru_cache(maxsize=1)
def _compiled() -> tuple[tuple[re.Pattern, str], ...]:
    return tuple((re.compile(p), r) for _n, p, r in PATTERNS)


def scrub_py(text: str | None) -> str | None:
    """Python oracle: identical chain with compiled re patterns."""
    if text is None:
        return None
    for pat, repl in _compiled():
        text = pat.sub(repl, text)
    return text
