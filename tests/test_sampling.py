"""Deterministic sampling: rate accuracy, reproducibility, and the
gate's portability contract (hex-threshold math)."""

from __future__ import annotations

from data_ingestion_pipeline_spark.operators import sampling
from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST


def test_rate_to_hex_bounds():
    assert sampling.rate_to_hex(0.0) == "00000000"
    assert sampling.rate_to_hex(0.125) == "20000000"
    assert sampling.rate_to_hex(0.5) == "80000000"
    import pytest

    with pytest.raises(ValueError):
        sampling.rate_to_hex(1.0)


def test_stratified_sample_rates_and_determinism(spark):
    docs = load_table(spark, SF_TEST, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    out1 = sampling.stratified_sample_docs(spark, SF_TEST).collect()
    out2 = sampling.stratified_sample_docs(spark, SF_TEST).collect()
    # bit-for-bit reproducible (hash gate, not rand())
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    kept = {}
    for r in out1:
        kept[r.lang] = kept.get(r.lang, 0) + 1
    for lang, n in totals.items():
        rate = sampling.SAMPLE_RATES.get(lang, sampling.SAMPLE_DEFAULT_RATE)
        # 4-sigma binomial tolerance on small strata
        sigma = (n * rate * (1 - rate)) ** 0.5
        assert abs(kept.get(lang, 0) - n * rate) <= 4 * sigma + 1, (
            lang,
            kept.get(lang, 0),
            n * rate,
        )


def test_weighted_sample_tracks_weights(spark):
    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "n_chars").collect()
    kept = {r.doc_id for r in sampling.weighted_sample_docs(spark, SF_TEST).collect()}
    # expected keep count = sum of per-doc probabilities
    probs = {
        r.doc_id: sampling.WEIGHTED_BASE_RATE
        * min(r.n_chars, sampling.WEIGHTED_CHAR_CAP)
        / sampling.WEIGHTED_CHAR_CAP
        for r in docs
    }
    mu = sum(probs.values())
    sigma = (sum(p * (1 - p) for p in probs.values())) ** 0.5
    assert abs(len(kept) - mu) <= 4 * sigma + 1, (len(kept), mu)
    # long docs must be kept at a visibly higher rate than short docs
    long_ids = [d for d, p in probs.items() if p >= 0.4]
    short_ids = [d for d, p in probs.items() if p <= 0.2]
    if long_ids and short_ids:
        long_rate = sum(d in kept for d in long_ids) / len(long_ids)
        short_rate = sum(d in kept for d in short_ids) / len(short_ids)
        assert long_rate > short_rate, (long_rate, short_rate)
