"""Model unit tests: accuracy on held-out-ish seeds, batch-geometry
invariance (the determinism requirement behind "keep/drop must not flip with
partitioning"), and perplexity calibration."""

from __future__ import annotations

import numpy as np

from data_quality_check_spark import corpus
from data_quality_check_spark.config import DEFAULT_RULESET as CFG
from data_quality_check_spark.models import langid, ngram


def test_langid_classifies_training_languages(models):
    texts, labels = [], []
    for lang, sents in corpus.SENTENCES.items():
        texts.extend(sents)
        labels.extend([lang] * len(sents))
    pred, conf = langid.predict(texts, models["langid"])
    acc = np.mean([p == y for p, y in zip(pred, labels)])
    assert acc >= 0.99
    assert conf.min() >= CFG.min_lang_conf


def test_langid_batch_geometry_invariance(models):
    texts = [s for ss in corpus.SENTENCES.values() for s in ss]
    whole_l, whole_c = langid.predict(texts, models["langid"])
    # one-at-a-time must be bit-identical to whole-batch
    for i, t in enumerate(texts[:20]):
        l1, c1 = langid.predict([t], models["langid"])
        assert l1[0] == whole_l[i]
        assert c1[0] == whole_c[i]


def test_langid_empty_and_none(models):
    lang, conf = langid.predict(["", None, "ab"], models["langid"])
    assert list(lang) == ["und", "und", "und"]  # < 3 bytes → unknown
    assert conf.tolist() == [0.0, 0.0, 0.0]


def test_perplexity_separates_natural_from_junk(models):
    natural = [s for ss in corpus.SENTENCES.values() for s in ss[:5]]
    junk = ["qzxjv wkpfh zzzz qqqq xkcd vvvv",
            "@@@ ### $$$ %%% ^^^ &&&",
            "zxqj" * 40]
    p_nat = ngram.perplexity(natural, models["lm"])
    p_junk = ngram.perplexity(junk, models["lm"])
    assert p_nat.max() < CFG.max_perplexity
    assert p_junk.min() > CFG.max_perplexity


def test_perplexity_batch_geometry_invariance(models):
    texts = [s for ss in corpus.SENTENCES.values() for s in ss[:3]]
    whole = ngram.perplexity(texts, models["lm"])
    for i, t in enumerate(texts):
        one = ngram.perplexity([t], models["lm"])
        assert one[0] == whole[i]  # bit-identical


def test_perplexity_empty_sentinel(models):
    p = ngram.perplexity(["", None, "ab"], models["lm"])
    assert (p == ngram.PPL_EMPTY).all()


def test_fused_scorer_bit_identical(models):
    from data_quality_check_spark.models import scoring

    texts = [s for ss in corpus.SENTENCES.values() for s in ss[:4]]
    texts += ["", None, "ab", "@@@ ###", "zxqj" * 40, "héllo wörld"]
    l1, c1 = langid.predict(texts, models["langid"])
    p1 = ngram.perplexity(texts, models["lm"])
    l2, c2, p2 = scoring.score_batch(texts, models["langid"], models["lm"])
    assert list(l1) == list(l2)
    assert (c1 == c2).all()
    assert (p1 == p2).all()


def test_models_are_broadcast_friendly():
    import pickle

    m = {"langid": langid.train(), "lm": ngram.train()}
    payload = pickle.dumps(m)
    assert len(payload) < 8 << 20  # broadcast stays small (< 8 MB)
    m2 = pickle.loads(payload)
    t = ["The weather today is sunny with a light breeze."]
    assert langid.predict(t, m2["langid"])[0][0] == "en"
