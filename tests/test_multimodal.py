"""Multimodal binary-column plumbing: metadata parity with python
hashlib, Pandas-UDF histogram parity with direct numpy, stub contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from data_ingestion_pipeline_spark.operators import multimodal
from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST


def test_binary_metadata_matches_hashlib(spark):
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_TEST, "documents").select("doc_id", "text").collect()
    }
    meta = {r.doc_id: r for r in multimodal.binary_metadata(spark, SF_TEST).collect()}
    assert set(meta) == set(texts)
    for doc_id in list(texts)[:25]:
        raw = texts[doc_id].encode("utf-8")
        assert meta[doc_id].n_bytes == len(raw)
        assert meta[doc_id].content_sha256 == hashlib.sha256(raw).hexdigest()
        assert meta[doc_id].sniffed_format == "unknown"  # text payloads


def test_byte_histogram_matches_numpy(spark):
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_TEST, "documents").select("doc_id", "text").collect()
    }
    docs = multimodal.with_binary_payload(
        load_table(spark, SF_TEST, "documents")
    ).select("doc_id", "payload")
    hists = {
        r.doc_id: (r.n_bytes, r.hist)
        for r in multimodal.byte_histogram_features(docs).collect()
    }
    assert set(hists) == set(texts)
    for doc_id in list(texts)[:25]:
        buf = np.frombuffer(texts[doc_id].encode("utf-8"), dtype=np.uint8)
        expected = np.bincount(buf >> 4, minlength=multimodal.N_BINS) / len(buf)
        n_bytes, hist = hists[doc_id]
        assert n_bytes == len(buf)
        assert len(hist) == multimodal.N_BINS
        assert np.allclose(hist, expected)
        assert abs(sum(hist) - 1.0) < 1e-9


def test_byte_histogram_registry_entry_is_flat(spark):
    # The registry entry explodes to (doc_id, bin, frac): 16 rows per
    # doc, fracs exactly the array entries (no type drift in explode).
    rows = multimodal.binary_byte_histogram(spark, SF_TEST).collect()
    n_docs = load_table(spark, SF_TEST, "documents").count()
    assert len(rows) == n_docs * multimodal.N_BINS
    by_doc: dict[int, float] = {}
    for r in rows:
        assert 0 <= r.bin < multimodal.N_BINS
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0.0) + r.frac
    assert all(abs(s - 1.0) < 1e-9 for s in by_doc.values())


def test_decode_image_stub_contract(spark):
    docs = multimodal.with_binary_payload(
        load_table(spark, SF_TEST, "documents")
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(docs)
