"""THE north-rule gate: Spark pipeline output vs the pure-Python oracle.

Per-turn byte-for-byte scrubbed-text equality, drop_reasons equality, and
keep/drop F1 >= 0.99 (in practice exactly 1.0), at sf0.001 — plus invariance
of every labeled value under different partitionings (repartition(1) vs
repartition(16)) so correctness cannot depend on batch geometry.

Verified with `python -m pytest -x -q` as BASELINE.json input_hint demands.
"""

from __future__ import annotations

import pytest

from data_quality_check_spark import oracle
from data_quality_check_spark.plans import pipeline


def _spark_rows(df):
    rows = df.collect()
    return {(r["conv_id"], r["turn_idx"], r["role"], r["text"]): r
            for r in rows}


@pytest.fixture(scope="module")
def labeled(spark, transcripts_tiny, bc_models):
    return pipeline.label_turns(
        transcripts_tiny, with_models=True, bc_models=bc_models).collect()


@pytest.fixture(scope="module")
def oracle_rows(transcripts_tiny, models):
    raw = [r.asDict() for r in transcripts_tiny.collect()]
    return oracle.label_turns(raw, with_models=True, models=models)


def _key(r):
    return (r.conv_id if hasattr(r, "conv_id") else r["conv_id"],
            r["turn_idx"] if not hasattr(r, "turn_idx") else r.turn_idx)


def _index_oracle(rows):
    # keys may repeat (injected dup_turn anomalies) → multimap
    idx = {}
    for r in rows:
        idx.setdefault((r.conv_id, r.turn_idx, r.text), []).append(r)
    return idx


def test_full_parity(labeled, oracle_rows):
    assert len(labeled) == len(oracle_rows)
    idx = _index_oracle(oracle_rows)
    f1_pairs = []
    for s in labeled:
        cands = idx[(s["conv_id"], s["turn_idx"], s["text"])]
        o = cands[0]
        assert s["drop_reasons"] == o.drop_reasons, (
            f"{s['conv_id']}/{s['turn_idx']}: spark={s['drop_reasons']} "
            f"oracle={o.drop_reasons} text={s['text']!r}")
        assert s["keep"] == o.keep
        assert s["text_scrubbed"] == o.text_scrubbed  # byte-for-byte
        assert s["lang"] == o.lang
        assert s["lang_conf"] == pytest.approx(o.lang_conf, abs=0.0)
        assert s["ppl"] == pytest.approx(o.ppl, abs=0.0)
        f1_pairs.append((o.keep, s["keep"]))
    f1 = oracle.keep_drop_f1([a for a, _ in f1_pairs],
                             [b for _, b in f1_pairs])
    assert f1 >= 0.99  # north-rule bound; exact equality above implies 1.0
    assert f1 == 1.0


def test_anomalies_actually_exercised(oracle_rows):
    """The derived fixture must hit every reason at least once — otherwise
    parity is vacuous for that rule."""
    seen = {r for o in oracle_rows for r in o.drop_reasons}
    required = {"null_text", "bad_role", "neg_turn_idx", "tool_mismatch",
                "null_ts", "dup_turn", "too_few_words", "symbol_ratio",
                "perplexity"}
    assert required <= seen, f"missing: {required - seen}"
    # and scrubbing actually rewrote something
    assert any(o.text_scrubbed != o.text
               for o in oracle_rows if o.text is not None)


def test_partitioning_invariance(spark, transcripts_tiny, bc_models):
    """Same labels/scores under radically different partitionings."""
    def run(df):
        out = pipeline.label_turns(df, with_models=True, bc_models=bc_models)
        rows = out.select("conv_id", "turn_idx", "text", "keep",
                          "drop_reasons", "text_scrubbed", "lang",
                          "lang_conf", "ppl").collect()
        return sorted(
            ((r["conv_id"], r["turn_idx"], r["text"],
              r["keep"], tuple(r["drop_reasons"]), r["text_scrubbed"],
              r["lang"], r["lang_conf"], r["ppl"]) for r in rows),
            key=lambda x: (x[0], x[1] if x[1] is not None else -1, str(x[2])),
        )

    one = run(transcripts_tiny.repartition(1))
    many = run(transcripts_tiny.repartition(16))
    assert one == many
