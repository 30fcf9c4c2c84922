"""Multimodal binary-column plumbing: metadata parity with python
hashlib, Pandas-UDF histogram parity with direct numpy, stub contract.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

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


def test_decode_dispatch_falls_back_to_standin(spark):
    """With no codec libs importable (this container), decode_image /
    decode_audio dispatch to the deterministic stand-ins — output
    byte-identical to calling the stand-ins directly, pinning that
    the seam swaps the codec and nothing else."""
    docs = (
        multimodal.with_binary_payload(load_table(spark, SF_TEST, "documents"))
        .select("doc_id", "payload")
        .limit(20)
    )
    if multimodal._pillow_available() or multimodal._soundfile_available():
        pytest.skip("codec libs present: the real-codec parity tests apply")
    img = {r.doc_id: r for r in multimodal.decode_image(docs).collect()}
    fake = {r.doc_id: r for r in multimodal.decode_image_fake(docs).collect()}
    assert set(img) == set(fake)
    for k in img:
        assert (img[k].width, img[k].height, bytes(img[k].pixels)) == (
            fake[k].width,
            fake[k].height,
            bytes(fake[k].pixels),
        )
    au = {r.doc_id: r for r in multimodal.decode_audio(docs).collect()}
    fau = {r.doc_id: r for r in multimodal.decode_audio_fake(docs).collect()}
    assert set(au) == set(fau)
    for k in au:
        assert (au[k].sample_rate, bytes(au[k].samples)) == (
            fau[k].sample_rate,
            bytes(fau[k].samples),
        )


def test_codec_dispatch_is_pinnable(spark, monkeypatch):
    """ADVICE r15: the codec dispatch must be an explicit plan-time
    pin, not an inference from the driver's site-packages.
    MULTIMODAL_CODEC=standin forces the stand-in regardless of what
    the driver can import; =real with no driver codec fails AT PLAN
    TIME (never a silent fallback or a mid-stage surprise); an
    unknown value is rejected."""
    docs = (
        multimodal.with_binary_payload(load_table(spark, SF_TEST, "documents"))
        .select("doc_id", "payload")
        .limit(5)
    )
    monkeypatch.setenv("MULTIMODAL_CODEC", "standin")
    img = {r.doc_id: r for r in multimodal.decode_image(docs).collect()}
    fake = {r.doc_id: r for r in multimodal.decode_image_fake(docs).collect()}
    assert {k: bytes(v.pixels) for k, v in img.items()} == {
        k: bytes(v.pixels) for k, v in fake.items()
    }

    monkeypatch.setenv("MULTIMODAL_CODEC", "real")
    if not multimodal._pillow_available():
        with pytest.raises(ImportError, match="pinned"):
            multimodal.decode_image(docs)
    if not multimodal._soundfile_available():
        with pytest.raises(ImportError, match="pinned"):
            multimodal.decode_audio(docs)

    monkeypatch.setenv("MULTIMODAL_CODEC", "bogus")
    with pytest.raises(ValueError, match="auto|real|standin"):
        multimodal.decode_image(docs)


_REAL_CODECS = pytest.mark.skipif(
    os.environ.get("MULTIMODAL_REAL_CODECS") != "1",
    reason="MULTIMODAL_REAL_CODECS=1 not set (container ships no codec "
    "libs); recipe: docs/real_codecs_test.md",
)


@_REAL_CODECS
def test_real_codec_image_parity(spark):
    """Codec-equipped host only: decode_image over real PNG bytes
    matches a direct driver-side Pillow decode pixel-for-pixel, and
    the decoded frames flow through image_resize unchanged."""
    import io

    from PIL import Image

    rng = np.random.RandomState(7)
    rows = []
    for i in range(6):
        w, h = 16 + i, 20 + 2 * i
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, format="PNG")
        rows.append((i, buf.getvalue(), arr))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in multimodal.decode_image(df).collect()}
    for i, _, arr in rows:
        r = got[i]
        assert (r.width, r.height, r.channels) == (arr.shape[1], arr.shape[0], 3)
        assert bytes(r.pixels) == arr.tobytes()
    small = multimodal.image_resize(multimodal.decode_image(df)).collect()
    assert all(
        (s.width, s.height) == (multimodal.RESIZE_W, multimodal.RESIZE_H)
        for s in small
    )


@_REAL_CODECS
def test_real_codec_audio_parity(spark):
    """Codec-equipped host only: decode_audio over real WAV bytes
    returns the exact PCM16 frames written, and the RMS pipeline
    consumes them unchanged."""
    import io

    import soundfile as sf

    rng = np.random.RandomState(11)
    rows = []
    for i in range(4):
        pcm = rng.randint(-3000, 3000, size=500 + 100 * i).astype(np.int16)
        buf = io.BytesIO()
        sf.write(buf, pcm, 16000, format="WAV", subtype="PCM_16")
        rows.append((i, buf.getvalue(), pcm))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in multimodal.decode_audio(df).collect()}
    for i, _, pcm in rows:
        r = got[i]
        assert r.sample_rate == 16000 and r.n_samples == len(pcm)
        assert bytes(r.samples) == pcm.astype("<i2").tobytes()
    assert (
        multimodal.audio_rms_windows(multimodal.decode_audio(df)).count() > 0
    )


def _python_image_stats(text: str):
    """Pure-python replica of decode_image_fake → image_resize →
    per-channel means, independent of the Spark pipeline."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    w = 16 + (int(b[0]) % 16 if len(b) > 0 else 0)
    h = 16 + (int(b[1]) % 16 if len(b) > 1 else 0)
    c = multimodal.IMAGE_CHANNELS
    need = w * h * c
    px = np.tile(b, -(-need // len(b)))[:need] if len(b) else np.zeros(need, np.uint8)
    img = px.reshape(h, w, c)
    yi = (np.arange(multimodal.RESIZE_H) * h) // multimodal.RESIZE_H
    xi = (np.arange(multimodal.RESIZE_W) * w) // multimodal.RESIZE_W
    small = img[yi][:, xi].reshape(-1, c).astype(np.float64)
    return small.mean(axis=0)


def test_image_pipeline_matches_python(spark):
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_TEST, "documents").select("doc_id", "text").collect()
    }
    got = {r.doc_id: r for r in multimodal.decoded_image_stats(spark, SF_TEST).collect()}
    assert set(got) == set(texts)
    for doc_id in list(texts)[:25]:
        exp = _python_image_stats(texts[doc_id])
        r = got[doc_id]
        assert (r.width, r.height) == (multimodal.RESIZE_W, multimodal.RESIZE_H)
        # integer pixel sums / fixed count: bit-exact, not approximate
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(exp), doc_id


def test_image_resize_shapes(spark):
    docs = multimodal.with_binary_payload(
        load_table(spark, SF_TEST, "documents")
    ).select("doc_id", "payload")
    decoded = multimodal.decode_image_fake(docs)
    row = decoded.first()
    assert 16 <= row.width < 32 and 16 <= row.height < 32
    assert len(row.pixels) == row.width * row.height * row.channels
    resized = multimodal.image_resize(decoded).first()
    assert len(resized.pixels) == (
        multimodal.RESIZE_W * multimodal.RESIZE_H * multimodal.IMAGE_CHANNELS
    )


def test_audio_rms_matches_python(spark):
    """Audio pipeline ground truth (registry rows-only evidence):
    decode → windowed RMS re-derived in pure Python from the same
    payload bytes, compared EXACTLY — int16 squares sum to exact
    float64 integers under any summation order, so sqrt inputs are
    bit-identical."""
    import math
    import struct

    got = {}
    for r in multimodal.audio_window_rms(spark, SF_TEST).collect():
        got[(r.doc_id, r.frame_idx)] = (r.n, r.rms)

    texts = load_table(spark, SF_TEST, "documents").select("doc_id", "text").collect()
    want = {}
    for r in texts:
        b = r.text.encode("utf-8")
        n_pcm = len(b) // 2
        pcm = struct.unpack(f"<{n_pcm}h", b[: n_pcm * 2]) if n_pcm else ()
        if not pcm:
            want[(r.doc_id, 0)] = (0, 0.0)
            continue
        for fi in range(0, (len(pcm) + multimodal.AUDIO_FRAME - 1) // multimodal.AUDIO_FRAME):
            chunk = pcm[fi * multimodal.AUDIO_FRAME : (fi + 1) * multimodal.AUDIO_FRAME]
            sq = sum(s * s for s in chunk)
            want[(r.doc_id, fi)] = (len(chunk), math.sqrt(sq / len(chunk)))
    assert got == want


def test_decoded_audio_meta_rate_domain(spark):
    rows = multimodal.decoded_audio_meta(spark, SF_TEST).collect()
    assert rows
    assert {r.sample_rate for r in rows} <= {8000, 16000, 24000}
    for r in rows:
        assert r.n_samples >= 0


def test_image_phash_buckets_duplicates(spark):
    """Identical payloads collide on the full hash; the band-bucket
    equi-join surfaces the duplicate pair without any all-pairs
    comparison; distinct payloads (different decoded dims/content)
    do not collide on all bands."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        PHASH_BANDS,
        image_phash,
    )

    rows = [
        (1, b"the quick brown fox jumps over the lazy dog"),
        (2, b"the quick brown fox jumps over the lazy dog"),  # dup of 1
        (3, b"a completely different image payload with other bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    idx = image_phash(df)
    got = {r.doc_id: r for r in idx.collect()}
    assert got[1].phash == got[2].phash
    for i in range(PHASH_BANDS):
        assert got[1][f"band{i}"] == got[2][f"band{i}"]

    # candidate generation: equal-band self-join, no cross join
    cands = set()
    for i in range(PHASH_BANDS):
        a = idx.alias("a")
        b = idx.alias("b")
        pairs = (
            a.join(
                b,
                (F.col(f"a.band{i}") == F.col(f"b.band{i}"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
            .collect()
        )
        cands |= {(r.x, r.y) for r in pairs}
    assert (1, 2) in cands


def test_video_frame_overlap_finds_injected_pairs(spark):
    """Every injected duplicate upload (doc_id + 1e6) must pair with
    its original, sharing every (capped) sampled frame; the pair
    count is bounded by the df cap, never quadratic."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        MIN_SHARED_FRAMES,
        video_frame_overlap,
    )

    pairs = video_frame_overlap(spark, SF_TEST)
    rows = pairs.collect()
    got = {(r.doc_a, r.doc_b): r.shared_frames for r in rows}
    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "text")
    injected = [r.doc_id for r in docs.filter("doc_id % 10 = 0").collect()]
    # docs long enough to clear the shared-frames floor MUST pair with
    # their duplicate (frames can be capped away only if ≥ cap docs
    # share them — the duplicate pair itself still shares the rest)
    n_frames = {
        r.doc_id: len(range(0, -(-len(r.text.encode()) // 32), 4))
        for r in docs.collect()
    }
    for d in injected:
        if n_frames.get(d, 0) >= MIN_SHARED_FRAMES:
            assert (d, d + 1_000_000) in got, d
    # symmetry/orientation: every pair is emitted once, a < b
    assert all(a < b for (a, b) in got)


def test_audio_fingerprint_matches_python(spark):
    """The fingerprint pipeline (decode → window energy → mantissa
    level → shingle key) vs a pure-Python replay over raw bytes."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        AUDIO_FP_FRAME,
        AUDIO_FP_MANTISSA_BITS,
        audio_fingerprint,
        with_binary_payload,
    )

    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {
        (r.doc_id, r.shingle_idx): r.fp_key
        for r in audio_fingerprint(
            with_binary_payload(docs).select("doc_id", "payload")
        ).collect()
    }

    expect = {}
    for doc_id, text in texts.items():
        pcm = np.frombuffer(
            text.encode()[: (len(text.encode()) // 2) * 2], dtype="<i2"
        ).astype(np.int64)
        levels = []
        for k in range(0, len(pcm), AUDIO_FP_FRAME):
            ss = int((pcm[k : k + AUDIO_FP_FRAME] ** 2).sum())
            levels.append(
                ss
                if ss.bit_length() <= AUDIO_FP_MANTISSA_BITS
                else ss >> (ss.bit_length() - AUDIO_FP_MANTISSA_BITS)
            )
        for i in range(len(levels) - 3):
            key = ((levels[i] * 128 + levels[i + 1]) * 128
                   + levels[i + 2]) * 128 + levels[i + 3]
            expect[(doc_id, i)] = key
    assert got == expect


def test_audio_near_dup_finds_injected_pairs(spark):
    """Every injected shifted+truncated re-upload long enough to carry
    MIN_VOTES aligned shingles must pair with its original at
    frame_offset = +2 (the prepended 2-window intro); vote counts
    match the shared-shingle geometry and no pair is emitted twice."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        AUDIO_FP_FRAME,
        AUDIO_FP_INTRO_BYTES,
        AUDIO_FP_MIN_VOTES,
        audio_near_dup_pairs,
    )

    rows = audio_near_dup_pairs(spark, SF_TEST).collect()
    got = {(r.doc_a, r.doc_b, r.frame_offset): r.votes for r in rows}
    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "text")

    intro_frames = AUDIO_FP_INTRO_BYTES // (2 * AUDIO_FP_FRAME)
    assert intro_frames == 2
    for r in docs.filter("doc_id % 10 = 0").collect():
        n_bytes = len(r.text.encode())
        # dup keeps 3/4 of the bytes: shared FULL windows in the dup
        dup_body_samples = ((n_bytes * 3) // 4) // 2
        shared_windows = dup_body_samples // AUDIO_FP_FRAME
        # a shared shingle needs 4 consecutive shared windows
        expected_votes = max(0, shared_windows - 3)
        if expected_votes >= AUDIO_FP_MIN_VOTES:
            key = (r.doc_id, r.doc_id + 1_000_000, intro_frames)
            assert key in got, r.doc_id
            # votes can only exceed geometry via extra chance
            # collisions at the same offset; never fall below it
            # (df-cap can only remove keys shared by >cap docs,
            # which the doc-specific body shingles are not)
            assert got[key] >= expected_votes
    # orientation: a < b, and (pair, offset) rows are unique by
    # construction (groupBy) — spot the orientation invariant
    assert all(a < b for (a, b, _o) in got)


def test_audio_fingerprint_amplitude_quantization(spark):
    """The property a content-hash join lacks: two clips whose window
    energies differ by less than a quantization cell fingerprint
    IDENTICALLY. Perturb one sample per window by a sub-cell amount
    and check the fingerprints are unchanged."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        AUDIO_FP_FRAME,
        audio_fingerprint,
    )

    base = np.arange(20000, 20000 + 16 * AUDIO_FP_FRAME, dtype="<i2")
    # ss per window ~ 8·4e8 ≈ 3.2e9 (32 bits): one quantization cell
    # spans 2^(32-7) = 2^25 ≈ 3.4e7 of ss; nudging one sample by +1
    # moves ss by ~2·s ≈ 4e4 ≪ cell — far below the mantissa floor
    pert = base.copy()
    pert[::AUDIO_FP_FRAME] += 1
    df = spark.createDataFrame(
        [(1, bytearray(base.tobytes())), (2, bytearray(pert.tobytes()))],
        "doc_id long, payload binary",
    )
    fp = audio_fingerprint(df).collect()
    a = sorted((r.shingle_idx, r.fp_key) for r in fp if r.doc_id == 1)
    b = sorted((r.shingle_idx, r.fp_key) for r in fp if r.doc_id == 2)
    assert a and a == b


def test_image_near_dup_finds_injected_pairs(spark):
    """Every injected duplicated upload pairs with its original at
    Hamming 0; pair orientation unique; the df-cap bounds bucket
    fan-out rather than dropping true-dup pairs (a dup pair shares
    EVERY band, so one surviving bucket suffices)."""
    from data_ingestion_pipeline_spark.operators.multimodal import (
        IMAGE_BAND_DF_CAP,
        PHASH_BANDS,
        image_near_dup_pairs,
        image_phash,
        with_binary_payload,
    )

    rows = image_near_dup_pairs(spark, SF_TEST).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "text")
    injected = [r.doc_id for r in docs.filter("doc_id % 10 = 0").collect()]

    # which injected pairs CAN survive: a pair is dropped only if all
    # 4 of its (shared) band buckets exceed the cap — compute from the
    # same phash table the operator uses
    corpus = with_binary_payload(
        docs.unionByName(
            docs.filter("doc_id % 10 = 0").select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    ).select("doc_id", "payload")
    ph = {r.doc_id: r for r in image_phash(corpus).collect()}
    from collections import Counter
    band_pop = Counter()
    for r in ph.values():
        for i in range(PHASH_BANDS):
            band_pop[(i, getattr(r, f"band{i}"))] += 1
    for d in injected:
        r = ph[d]
        survivable = any(
            band_pop[(i, getattr(r, f"band{i}"))] <= IMAGE_BAND_DF_CAP
            for i in range(PHASH_BANDS)
        )
        if survivable:
            assert got.get((d, d + 1_000_000)) == 0, d
    assert all(a < b for (a, b) in got)
    assert all(h <= 3 for h in got.values())
