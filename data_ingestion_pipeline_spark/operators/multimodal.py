"""Multimodal columns: opaque binary payloads with typed metadata.

A training-data pipeline carries image/audio/video as opaque
``binary`` columns plus typed metadata, with decode / feature-extract
steps as Arrow-batched Pandas UDFs. The reference has no multimodal
surface (SURVEY.md §2.9); this module is north-star scope
(BASELINE.json), built so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested even
though actual codecs are absent from this environment.

Three layers:

1. ``with_binary_payload`` — binary column synthesis (UTF-8 bytes of
   the document text, standing in for real media bytes; the testdata
   ships no binary column). Everything downstream treats the payload
   as opaque bytes.
2. ``binary_metadata`` — JVM-side metadata extraction (byte length,
   SHA-256 content address, magic-byte format sniff). Oracle-checked.
3. ``byte_histogram_features`` — REAL feature extraction in a
   ``mapInPandas`` UDF: per-payload normalized 16-bin byte histogram
   via numpy over Arrow batches. This is the exact execution shape a
   CLIP-embed or mel-spectrogram step would use: batched zero-copy
   columnar transfer, one Python worker per partition, output schema
   declared up front. Verified row-by-row against numpy in
   tests/test_multimodal.py.
4. ``decode_image`` / ``decode_audio`` — the codec step, a RUNTIME
   DISPATCH: the real codec (Pillow / soundfile) when importable, the
   deterministic stand-in otherwise (this container ships neither).
   Both paths share one signature, output schema, and Arrow batching,
   so every downstream stage is codec-agnostic; real-codec parity is
   env-guarded (MULTIMODAL_REAL_CODECS=1, docs/real_codecs_test.md).

Scale notes: payloads stay columnar end-to-end (no collect); the
histogram UDF is compute-bound per batch with Arrow transfer
amortized; for real media, pair the binary column with
``spark.sql.files.maxPartitionBytes`` sizing so one partition's
payloads fit executor memory.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

N_BINS = 16

# magic-byte prefixes → sniffed format (tiny illustrative table)
_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"OggS": "ogg",
}


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of the text —
    deterministic stand-in for media bytes)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads: size, content address,
    sniffed format. All JVM-side (length/sha2/startswith on binary) —
    the scan shape is one pass, no Python."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        fmt = F.when(
            F.col("payload").startswith(F.lit(magic)), F.lit(name)
        ).otherwise(fmt)
    return docs.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("content_sha256"),
        fmt.alias("sniffed_format"),
    )


def byte_histogram_features(
    df: DataFrame, payload_col: str = "payload", n_bins: int = N_BINS
) -> DataFrame:
    """Normalized byte-value histogram per payload — a real, cheap
    content feature (useful for corrupt-file triage and format
    clustering), computed the way a heavy extractor would be:
    ``mapInPandas`` over Arrow record batches, numpy inside."""
    import numpy as np  # local import: executors re-import per worker

    out_schema = "doc_id long, n_bytes long, hist array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            sizes = []
            for payload in pdf[payload_col]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                sizes.append(len(buf))
                counts = np.bincount(buf >> 4, minlength=n_bins).astype(np.float64)
                hists.append(
                    (counts / max(len(buf), 1)).tolist()
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": sizes, "hist": hists}
            )

    return df.mapInPandas(extract, out_schema)


def binary_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: histogram features for every document payload,
    exploded to one row per (doc_id, bin) so the result is flat
    (sortable, hashable) and DuckDB-oracle-checkable — the oracle
    recomputes the same nibble counts from hex(payload) in SQL.
    numpy parity for the underlying feature extractor is pinned in
    tests/test_multimodal.py.
    """
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    feats = byte_histogram_features(docs)
    return feats.select(
        "doc_id", F.posexplode("hist").alias("bin", "frac")
    )


# ---- image pipeline: decode → resize → features ---------------------------

DECODED_IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, pixels binary"
)
IMAGE_CHANNELS = 3
RESIZE_W = 8
RESIZE_H = 8


def _pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def _use_real_codec(driver_has_it: bool, label: str) -> bool:
    """Resolve the codec dispatch ONCE, at plan time, on the driver —
    and make it pinnable (ADVICE r15): inferring from the driver's
    site-packages alone means a driver/executor divergence either
    fails mid-stage (driver has the codec, executors don't) or flips
    a run between real and stand-in output for consumers that assumed
    one codec. ``MULTIMODAL_CODEC`` pins it:

    - ``real``    — real codec, no fallback; raises AT PLAN TIME if
                    the driver can't import it, and the executor-side
                    import error names the pin and the remedy (ship
                    the wheel via --py-files/pex, or repin). Never
                    silently degrades.
    - ``standin`` — deterministic stand-in everywhere, even on a
                    codec-equipped cluster (what the oracle-graded
                    entries and any reproducibility-sensitive corpus
                    build want).
    - ``auto``    — (default) driver probe, the r15 behavior.

    The resolved branch is captured in the plan's closure, so a run's
    output codec is a plan-time constant either way; the env var makes
    it an EXPLICIT, recordable one."""
    mode = os.environ.get("MULTIMODAL_CODEC", "auto").lower()
    if mode not in ("auto", "real", "standin"):
        raise ValueError(
            f"MULTIMODAL_CODEC={mode!r}: expected auto|real|standin"
        )
    if mode == "standin":
        return False
    if mode == "real":
        if not driver_has_it:
            raise ImportError(
                f"MULTIMODAL_CODEC=real is pinned but {label} is not "
                "importable on the driver; install it or repin"
            )
        return True
    return driver_has_it


_EXECUTOR_IMPORT_HINT = (
    "the codec was resolved 'real' at plan time on the driver, but "
    "this executor cannot import it — driver/executor environments "
    "diverge; ship the wheel with the job (--py-files / pex / conda "
    "env) or pin MULTIMODAL_CODEC=standin for a deterministic run"
)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads — REAL codec (Pillow) when importable,
    the deterministic stand-in otherwise (this container ships no
    codec libraries, documented in docs/real_codecs_test.md).

    The dispatch is the production seam: on a codec-equipped cluster
    this function decodes actual JPEG/PNG bytes via
    ``Image.open(io.BytesIO(payload)).convert("RGB")`` inside the same
    Arrow-batched ``mapInPandas`` stage, emitting the exact
    DECODED_IMAGE_SCHEMA every downstream stage (``image_resize``,
    ``decoded_image_stats``, the dHash near-dup index) consumes — so
    the plumbing tested here IS the real pipeline, only the codec call
    swaps. Availability is probed on the driver; executors import the
    codec themselves inside the stage (local mode shares the env; on a
    cluster ship the wheel with the job). The oracle-graded registry
    entries pin ``decode_image_fake`` explicitly — their DuckDB twins
    recompute the stand-in's byte arithmetic, which a real codec by
    design cannot match. Env-guarded parity:
    tests/test_multimodal.py (MULTIMODAL_REAL_CODECS=1), recipe in
    docs/real_codecs_test.md — the Kafka-live pattern applied to
    codecs. Dispatch is resolved at plan time and pinnable via
    MULTIMODAL_CODEC=auto|real|standin (see _use_real_codec)."""
    if not _use_real_codec(_pillow_available(), "Pillow"):
        return decode_image_fake(df, payload_col)
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image
        except ImportError as e:
            raise ImportError(
                f"decode_image: {_EXECUTOR_IMPORT_HINT}"
            ) from e

        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "channels": [], "pixels": []}
            for payload in pdf[payload_col]:
                img = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
                arr = np.asarray(img, dtype=np.uint8)  # (h, w, 3)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["channels"].append(IMAGE_CHANNELS)
                out["pixels"].append(arr.tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(
        dec, DECODED_IMAGE_SCHEMA
    )


def decode_image_fake(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in codec: 'decodes' any payload into an
    HxWx3 pixel buffer (dimensions 16-31 derived from the leading
    bytes, pixels = payload tiled to size). A pure function of the
    bytes — same image on any engine, any retry — so the downstream
    stages are testable without codec libraries while keeping the
    production shape: Arrow-batched ``mapInPandas``, opaque binary in,
    (metadata, binary) out, one Python worker per partition."""
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "channels": [], "pixels": []}
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload, dtype=np.uint8)
                w = 16 + (int(b[0]) % 16 if len(b) > 0 else 0)
                h = 16 + (int(b[1]) % 16 if len(b) > 1 else 0)
                need = w * h * IMAGE_CHANNELS
                if len(b):
                    px = np.tile(b, -(-need // len(b)))[:need]
                else:
                    px = np.zeros(need, dtype=np.uint8)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(IMAGE_CHANNELS)
                out["pixels"].append(px.tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(dec, DECODED_IMAGE_SCHEMA)


def image_resize(
    df: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers to a fixed
    grid — the normalization step before any embedding model. Real
    resample math (floor-index grid sampling, the standard NN kernel)
    over Arrow batches; output buffers are fixed-size, so downstream
    batches are uniform."""
    import numpy as np

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for w, h, c, buf in zip(
                pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                pixels.append(img[yi][:, xi].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(rs, DECODED_IMAGE_SCHEMA)


def decoded_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the decode stage's scalar metadata (decoded
    width/height per document). The stand-in codec derives dimensions
    from the two leading payload bytes (decode_image_fake), which ARE
    SQL-expressible — DuckDB recomputes them from hex(encode(text)) —
    so this entry hash-checks the decode boundary that the full pixel
    pipeline (decoded_image_stats, rows-only) builds on."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return decode_image_fake(docs).select("doc_id", "width", "height")


def decoded_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the full image pipeline — synthesize payloads,
    (fake-)decode, resize to 8×8, per-channel mean features. Three
    chained mapInPandas stages, which is exactly how a real
    decode → preprocess → embed pipeline lays out (each stage keeps
    columnar Arrow batches; nothing collects). No SQL oracle (binary
    pipelines aren't SQL-expressible); ground truth is a pure-python
    replica in tests/test_multimodal.py.
    """
    import numpy as np

    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    resized = image_resize(decode_image_fake(docs))
    schema = "doc_id long, width int, height int, mean_r double, mean_g double, mean_b double"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            means = np.stack(
                [
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(-1, IMAGE_CHANNELS)
                    .mean(axis=0)
                    for buf in pdf["pixels"]
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                }
            )

    return resized.mapInPandas(stats, schema)


# ---- perceptual-hash image near-dup ---------------------------------------

PHASH_ROWS = 8
PHASH_COLS = 7  # adjacent-pair comparisons per row → 56 bits total
PHASH_BANDS = 4
PHASH_BAND_BITS = 14


def image_phash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Perceptual dHash over decoded images — the image analog of
    SimHash near-dup: decode → 8×8 NN-resize → integer-floor
    grayscale ((r+g+b)//3) → 8 rows × 7 adjacent brightness
    comparisons packed row-major into a 56-bit hash → 4 LSH bands of
    14 bits. Equal-band equi-join buckets are the candidate
    generator: two images within Hamming distance 3 share a band by
    pigeonhole (the SimHash banding argument verbatim), so near-dup
    image search is a bucketed join, never all-pairs — at 100 TB the
    shuffle key is the band value, exactly the text pipeline's shape.
    Gradient structure (not absolute brightness) makes dHash robust
    to global exposure shifts under a real codec; with the stand-in
    codec the property pinned is determinism + bucketing, and the
    whole pipeline is SQL-expressible, so the driver hash-checks it
    end to end (registry oracle)."""
    import numpy as np

    resized = image_resize(
        decode_image_fake(df, payload_col), PHASH_ROWS, PHASH_ROWS
    )
    schema = "doc_id long, phash long, " + ", ".join(
        f"band{i} long" for i in range(PHASH_BANDS)
    )

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = []
            for buf in pdf["pixels"]:
                img = np.frombuffer(buf, dtype=np.uint8).reshape(
                    PHASH_ROWS, PHASH_ROWS, IMAGE_CHANNELS
                )
                gray = img.astype(np.int64).sum(axis=2) // IMAGE_CHANNELS
                bits = gray[:, : PHASH_COLS] > gray[:, 1:]
                h = 0
                for y in range(PHASH_ROWS):
                    for x in range(PHASH_COLS):
                        if bits[y, x]:
                            h |= 1 << (y * PHASH_COLS + x)
                hashes.append(h)
            out = {"doc_id": pdf["doc_id"], "phash": hashes}
            for i in range(PHASH_BANDS):
                out[f"band{i}"] = [
                    (h >> (i * PHASH_BAND_BITS)) & ((1 << PHASH_BAND_BITS) - 1)
                    for h in hashes
                ]
            yield pd.DataFrame(out)

    return resized.mapInPandas(ph, schema)


def image_phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the per-document perceptual-hash index
    (56-bit dHash + 4 LSH bands) over synthesized image payloads —
    the candidate-generation substrate for image near-dup. The DuckDB
    oracle replays decode, NN-resize, grayscale and bit-packing in
    pure SQL (the stand-in codec is byte math), hash-checking the
    whole three-stage Arrow pipeline; bucketing behavior (identical
    payloads collide, band join finds them without all-pairs) is
    pinned in tests/test_multimodal.py."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return image_phash(docs)


# ---- video-style frame sampling -------------------------------------------

FRAME_BYTES = 32  # bytes per (stand-in) frame block
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame


def frame_sample(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic frame sampling over a video-style payload: the
    byte stream is a sequence of FRAME_BYTES-sized frame blocks; keep
    every FRAME_SAMPLE_EVERY-th frame — the ffmpeg-decode→stride-
    sample step of a video training pipeline, with the codec replaced
    by fixed-size blocks (none installed here) and the PLUMBING real:
    an Arrow ``mapInPandas`` stage whose batches FAN OUT (one input
    row → one row per sampled frame), the shape that distinguishes
    video extraction from the 1:1 decode/resize stages above. Each
    sampled frame carries its index, byte offset, length, and SHA-256
    content address (tail frames run short, like real containers).
    """
    import hashlib

    out_schema = (
        "doc_id long, frame_idx int, frame_offset long, "
        "frame_bytes int, frame_sha256 string"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "frame_offset", "frame_bytes",
                     "frame_sha256")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                buf = bytes(payload)
                n_frames = -(-len(buf) // FRAME_BYTES)
                for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
                    frame = buf[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(idx * FRAME_BYTES)
                    rows["frame_bytes"].append(len(frame))
                    rows["frame_sha256"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, out_schema)


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: sampled-frame table for every document payload.

    Oracle note: the Spark side slices BYTES of the payload (the real
    video semantics); the DuckDB twin slices CHARACTERS of the source
    text and hashes them — equal here because the stand-in payload is
    the UTF-8 bytes of pure-ASCII text (byte offset == char offset).
    A real media column keeps the byte semantics unchanged.
    """
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return frame_sample(docs)


# ---- audio branch: PCM decode + windowed RMS features --------------

DECODED_AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, samples binary"
)
AUDIO_FRAME = 256  # samples per RMS analysis window


def decode_audio_fake(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in audio codec: 'decodes' any payload into
    16-bit PCM — sample_rate ∈ {8,16,24} kHz derived from the leading
    byte, samples = the payload truncated to even length viewed as
    little-endian int16. Pure function of the bytes (same waveform on
    any engine/retry); a real codec (ffmpeg/soundfile) slots into the
    identical signature the way decode_image documents for images.
    Shape: Arrow-batched ``mapInPandas``, opaque binary in,
    (metadata, binary) out.
    """
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "sample_rate": [], "n_samples": [],
                   "samples": []}
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload, dtype=np.uint8)
                rate = 8000 * (1 + (int(b[0]) % 3 if len(b) else 0))
                even = b[: (len(b) // 2) * 2]
                pcm = even.view("<i2") if len(even) else np.zeros(0, dtype="<i2")
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(pcm))
                out["samples"].append(pcm.tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(dec, DECODED_AUDIO_SCHEMA)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode audio payloads — REAL codec (soundfile/libsndfile) when
    importable, the deterministic stand-in otherwise. Same dispatch
    seam as ``decode_image``: on a codec-equipped cluster this decodes
    actual WAV/FLAC/OGG bytes via ``soundfile.read`` inside the same
    Arrow-batched stage, emitting the exact DECODED_AUDIO_SCHEMA the
    RMS/fingerprint pipeline consumes (first channel, 16-bit PCM
    little-endian — the stand-in's sample contract). Env-guarded
    parity: tests/test_multimodal.py (MULTIMODAL_REAL_CODECS=1),
    recipe in docs/real_codecs_test.md. Dispatch is resolved at plan
    time and pinnable via MULTIMODAL_CODEC=auto|real|standin (see
    _use_real_codec)."""
    if not _use_real_codec(_soundfile_available(), "soundfile"):
        return decode_audio_fake(df, payload_col)
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            import soundfile as sf
        except ImportError as e:
            raise ImportError(
                f"decode_audio: {_EXECUTOR_IMPORT_HINT}"
            ) from e

        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "sample_rate": [],
                   "n_samples": [], "samples": []}
            for payload in pdf[payload_col]:
                data, rate = sf.read(
                    io.BytesIO(bytes(payload)), dtype="int16", always_2d=True
                )
                mono = np.ascontiguousarray(data[:, 0], dtype="<i2")
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(len(mono))
                out["samples"].append(mono.tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(
        dec, DECODED_AUDIO_SCHEMA
    )


def audio_rms_windows(df: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Windowed RMS over decoded PCM — the canonical first feature of
    any audio pipeline (VAD, loudness normalization, silence
    trimming). Fan-out Arrow stage: each doc yields
    ceil(n_samples/frame) rows of (frame_idx, rms, n). All arithmetic
    is exact-integer squares summed in float64 (int16² · frame ≪ 2⁵³)
    with one final sqrt — deterministic under any partitioning."""
    import numpy as np

    schema = "doc_id bigint, frame_idx int, n int, rms double"

    def win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["samples"]):
                pcm = np.frombuffer(buf, dtype="<i2").astype(np.float64)
                for k in range(0, max(len(pcm), 1), frame):
                    chunk = pcm[k : k + frame]
                    ids.append(doc_id)
                    idxs.append(k // frame)
                    ns.append(len(chunk))
                    rms.append(
                        float(np.sqrt((chunk * chunk).sum() / len(chunk)))
                        if len(chunk)
                        else 0.0
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n": ns, "rms": rms}
            )

    return df.select("doc_id", "samples").mapInPandas(win, schema)


def decoded_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the audio decode's scalar metadata (rate,
    sample count) — SQL-expressible from the payload bytes, so this
    entry hash-checks the decode boundary the RMS pipeline
    (audio_window_rms, rows-only) builds on; the decoded_image_meta
    pattern applied to the audio branch."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return decode_audio_fake(docs).select("doc_id", "sample_rate", "n_samples")


def audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: full decode → windowed-RMS pipeline over the
    documents' payload bytes (rows-only evidence; the pure-Python
    parity twin is tests/test_multimodal.py::test_audio_rms_matches_python)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return audio_rms_windows(decode_audio_fake(docs))


# ---- raw-file ingestion: the binaryFile source ----------------------
# A real multimodal corpus starts as FILES ON DISK/OBJECT STORE
# (images, audio clips), not as a binary column in parquet. Spark's
# built-in `binaryFile` source is the distributed raw-file reader for
# that boundary: one scan plans over the file listing, partitions are
# sized by spark.sql.files.maxPartitionBytes, pathGlobFilter +
# modifiedAfter push file-level pruning into the listing, and each row
# carries (path, modificationTime, length, content). At 100 TB this is
# the ingestion edge every decode/feature step downstream consumes —
# the same opaque-payload contract with_binary_payload fakes from
# parquet text.

BINARY_FILE_DOCS = 64  # files materialized per sf fixture


FRAME_DF_CAP = 16  # drop frames shared by more docs (stop-frames)
MIN_SHARED_FRAMES = 2


def video_frame_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: video near-dup via CONTENT-ADDRESSED FRAME
    OVERLAP — the first-pass video dedup construction: sampled frames
    carry SHA-256 content addresses (frame_sample), so two videos
    sharing footage share hash keys, and near-dup candidates are an
    equi-join on frame hash → per-pair shared-frame count → pairs
    with ≥ MIN_SHARED_FRAMES. Document-frequency cap (the dup_clusters
    discipline): a frame hash seen in > FRAME_DF_CAP docs is a
    stop-frame (intros, black frames, silence) and is dropped before
    the join, bounding per-key fan-out to df·(df−1)/2 — sub-quadratic
    by construction, never all-pairs. Fixture: every 10th document is
    re-emitted as a shifted doc_id (the duplicated-upload case); the
    oracle replays slicing, hashing, cap and join in SQL."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = with_binary_payload(docs.unionByName(dups)).select(
        "doc_id", "payload"
    )
    frames = (
        frame_sample(corpus)
        .select("doc_id", "frame_sha256")
        .distinct()
    )
    rare = (
        frames.groupBy("frame_sha256")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= FRAME_DF_CAP)
        .select("frame_sha256")
    )
    keyed = frames.join(rare, "frame_sha256")
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.frame_sha256") == F.col("b.frame_sha256"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared_frames"))
        .filter(F.col("shared_frames") >= MIN_SHARED_FRAMES)
    )


def _binary_file_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a deterministic on-disk file tree (one `.bin` per
    doc_id < BINARY_FILE_DOCS, payload = the doc's UTF-8 text) under a
    per-sf scratch dir — harness setup standing in for a media drop
    zone, like the streaming feed fixtures. Idempotent: content is
    rewritten only when changed and stale files are removed, so a
    shrunk source (e.g. the empty-input sweep) leaves an empty tree."""
    import glob
    import os

    from data_ingestion_pipeline_spark.operators.upsert import scratch_path

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    d = scratch_path("binfiles", sf_name, "tree")
    os.makedirs(d, exist_ok=True)
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BINARY_FILE_DOCS)
        .select("doc_id", "text")
        .collect()  # ≤ BINARY_FILE_DOCS rows — fixture-bounded
    )
    keep = set()
    for r in rows:
        p = os.path.join(d, f"doc_{r.doc_id:05d}.bin")
        data = r.text.encode("utf-8")
        keep.add(p)
        try:
            with open(p, "rb") as fh:
                if fh.read() == data:
                    continue
        except FileNotFoundError:
            pass
        with open(p, "wb") as fh:
            fh.write(data)
    for p in set(glob.glob(os.path.join(d, "*.bin"))) - keep:
        os.remove(p)
    return d


def binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ingest a raw-file tree through the binaryFile
    source and emit per-file metadata (name, byte size, content
    address). The content hash is computed on the HEX encoding of the
    bytes so the DuckDB oracle (sha256 over hex(read-from-documents
    bytes)) reproduces it exactly — both engines uppercase hex and
    lower-hex the digest. The scan itself is the production shape:
    distributed file listing, no driver I/O, pathGlobFilter pruning."""
    d = _binary_file_fixture(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return bf.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.sha2(F.hex(F.col("content")), 256).alias("content_sha256"),
    )


# ---- audio near-dup: energy fingerprint + offset-voting join --------
# Completes the multimodal dedup triad (image: image_phash_index,
# video: video_frame_overlap). The construction is Shazam's in
# miniature: per-window energy features are quantized to a log-scale
# code, consecutive codes are shingled into fingerprint keys, and
# near-dup candidates come from an equi-join on key followed by
# ALIGNMENT-OFFSET VOTING — a pair of clips sharing footage
# accumulates many key matches at ONE consistent frame offset, while
# chance collisions scatter across offsets. The candidate generator
# is a df-capped banded equi-join, never all-pairs (same shuffle
# discipline as MinHash-LSH / simhash / video frame overlap); at
# 100 TB the shuffle key is the fingerprint key and per-key fan-out
# is bounded by AUDIO_FP_DF_CAP.
#
# Quantization = top-AUDIO_FP_MANTISSA_BITS bits of the window's
# exact-integer sum of squares (a log-scale energy code with ~1%
# resolution): two windows whose energies differ by less than a
# quantization cell fingerprint identically — amplitude-robust in the
# way a raw content hash (video_frame_overlap's sha256) is not. All
# arithmetic is exact integers (Σs² ≤ 8·2³⁰ ≪ 2⁵³), so the DuckDB
# oracle replays decode → windows → levels → shingles → df-cap →
# voting join end to end, bit-for-bit.

AUDIO_FP_FRAME = 8  # samples per fingerprint window (docs are short)
AUDIO_FP_MANTISSA_BITS = 7  # log-scale energy code width → level < 128
AUDIO_FP_DF_CAP = 16  # fingerprint keys in more docs are stop-shingles
AUDIO_FP_MIN_VOTES = 4  # shared aligned shingles to call a candidate
AUDIO_FP_INTRO_BYTES = 32  # injected-dup intro: exactly 2 whole windows


def audio_window_energy(
    df: DataFrame, frame: int = AUDIO_FP_FRAME
) -> DataFrame:
    """Exact-integer window energy over decoded PCM: one row per
    (doc, window) with n samples and ss = Σ sample² held exactly in
    float64 (int16² · frame ≪ 2⁵³). The feature substrate of the
    audio fingerprint — same fan-out Arrow shape as
    audio_rms_windows, but emitting the RAW integer energy so
    downstream quantization is engine-exact (a sqrt here would
    reintroduce the float boundary the fingerprint avoids). Zero-
    sample docs emit no windows (nothing to fingerprint)."""
    import numpy as np

    schema = "doc_id bigint, frame_idx int, n int, ss double"

    def win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sss = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["samples"]):
                pcm = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                for k in range(0, len(pcm), frame):
                    chunk = pcm[k : k + frame]
                    ids.append(doc_id)
                    idxs.append(k // frame)
                    ns.append(len(chunk))
                    sss.append(float((chunk * chunk).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n": ns, "ss": sss}
            )

    return df.select("doc_id", "samples").mapInPandas(win, schema)


def audio_fingerprint(payloads: DataFrame) -> DataFrame:
    """(doc_id, shingle_idx, fp_key) fingerprint table: decode →
    window energy → log-quantized level (top-7-bit mantissa of the
    integer energy, via bit-length + variable shift — exact in any
    engine) → 4-gram shingle of consecutive levels packed base-128
    into one BIGINT key. Everything after the Arrow energy stage is
    JVM-side (bin/shiftright/lead inside whole-stage codegen); the
    per-doc window sort is the only shuffle and its key is doc_id."""
    from pyspark.sql import Window

    lev = (
        audio_window_energy(decode_audio_fake(payloads))
        .withColumn("ss_l", F.col("ss").cast("long"))
        .withColumn(
            "level",
            F.when(F.col("ss_l") <= 0, F.lit(0).cast("long")).otherwise(
                F.expr(
                    f"CASE WHEN length(bin(ss_l)) <= {AUDIO_FP_MANTISSA_BITS} "
                    "THEN ss_l ELSE shiftright(ss_l, length(bin(ss_l)) - "
                    f"{AUDIO_FP_MANTISSA_BITS}) END"
                )
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    key = (
        (
            (F.col("level") * 128 + F.lead("level", 1).over(w)) * 128
            + F.lead("level", 2).over(w)
        )
        * 128
        + F.lead("level", 3).over(w)
    )
    return (
        lev.select(
            "doc_id",
            F.col("frame_idx").alias("shingle_idx"),
            key.alias("fp_key"),
        )
        .filter(F.col("fp_key").isNotNull())
    )


def audio_fingerprint_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the per-document audio fingerprint index over
    synthesized audio payloads — the candidate-generation substrate
    for audio near-dup, hash-checked end to end by the DuckDB oracle
    (audio_fingerprint_oracle_sql replays decode, windowing, mantissa
    quantization and shingling in pure SQL)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return audio_fingerprint(docs)


def _audio_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents plus injected near-duplicates: every 10th doc
    re-emitted under doc_id+1e6 with a 32-byte '#' intro PREPENDED
    (exactly 2 fingerprint windows — a shifted re-upload) and the
    tail quarter TRUNCATED (a clipped re-upload). The offset-voting
    join must find each (orig, dup) pair at frame_offset = +2 — the
    shift tolerance a raw content-address join does not have."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            f"concat(repeat('#', {AUDIO_FP_INTRO_BYTES}), "
            "substring(text, 1, CAST((length(text) * 3) DIV 4 AS INT)))"
        ).alias("text"),
    )
    return with_binary_payload(docs.unionByName(dups)).select(
        "doc_id", "payload"
    )


def audio_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: audio near-dup candidates via fingerprint-key
    equi-join + alignment-offset voting. df-cap first (a key in more
    than AUDIO_FP_DF_CAP docs is a stop-shingle — silence, intros —
    and is dropped BEFORE the join, bounding per-key fan-out), then
    votes are counted per (doc pair, shingle-index offset) and pairs
    below AUDIO_FP_MIN_VOTES aligned matches are rejected. Output is
    every surviving (pair, offset) with its vote count — sub-
    quadratic by construction, never all-pairs. Injected-pair recall
    is pinned in tests/test_multimodal.py."""
    # pin the fingerprint table once: it feeds THREE consumers (the
    # df-cap aggregate and both join sides) and Spark shares no
    # non-exchange subtrees, so without the barrier the decode chain
    # would re-execute per branch (PLANS.md showed 8 scans). At scale
    # this is the persisted audio_fingerprint_index table; in-query,
    # localCheckpoint is the same pin.
    fp = audio_fingerprint(_audio_dup_corpus(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    rare = (
        fp.groupBy("fp_key")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= AUDIO_FP_DF_CAP)
        .select("fp_key")
    )
    keyed = fp.join(rare, "fp_key")
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp_key") == F.col("b.fp_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (F.col("b.shingle_idx") - F.col("a.shingle_idx")).alias(
                "frame_offset"
            ),
        )
        .agg(F.count("*").alias("votes"))
        .filter(F.col("votes") >= AUDIO_FP_MIN_VOTES)
    )


# Shared oracle scaffolding: decode → 8-sample window energies →
# 7-bit-mantissa levels → 4-gram shingles, over a `corpus(doc_id,
# text)` CTE the two entries prepend. Sample extraction is the
# audio_window_rms oracle's hex(encode(text)) construction verbatim.
_AUDIO_FP_CORE_SQL = """
        raw AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) // 2 AS ns
            FROM corpus
        ), samp AS (
            SELECT doc_id, i // 8 AS frame_idx,
                   (strpos('0123456789ABCDEF', substr(h, 4*i+1, 1)) - 1) * 16
                   + strpos('0123456789ABCDEF', substr(h, 4*i+2, 1)) - 1
                   + ((strpos('0123456789ABCDEF', substr(h, 4*i+3, 1)) - 1) * 16
                      + strpos('0123456789ABCDEF', substr(h, 4*i+4, 1)) - 1
                     ) * 256 AS u16
            FROM (SELECT doc_id, h, unnest(range(0, ns)) AS i FROM raw)
        ), wins AS (
            SELECT doc_id, frame_idx,
                   SUM(CAST(
                       (CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
                       * (CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
                   AS BIGINT)) AS ss
            FROM samp GROUP BY 1, 2
        ), lev AS (
            SELECT doc_id, frame_idx,
                   CASE WHEN ss <= 0 THEN 0
                        WHEN strlen(bin(ss)) <= 7 THEN ss
                        ELSE ss >> (strlen(bin(ss)) - 7) END AS level
            FROM wins
        ), sh AS (
            SELECT doc_id, frame_idx AS shingle_idx,
                   ((level * 128 + lead(level, 1) OVER w) * 128
                    + lead(level, 2) OVER w) * 128
                   + lead(level, 3) OVER w AS fp_key
            FROM lev WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        ), fp AS (
            SELECT doc_id, CAST(shingle_idx AS INTEGER) AS shingle_idx,
                   CAST(fp_key AS BIGINT) AS fp_key
            FROM sh WHERE fp_key IS NOT NULL
        )
"""


def audio_fingerprint_oracle_sql() -> str:
    return (
        "WITH corpus AS (SELECT doc_id, text FROM documents),\n"
        + _AUDIO_FP_CORE_SQL
        + "\n        SELECT doc_id, shingle_idx, fp_key FROM fp"
    )


def audio_near_dup_oracle_sql() -> str:
    # ASCII caveat (same as video_frame_overlap): the dup corpus is
    # built with CHARACTER repeat/substr on both engines — equal
    # because the stand-in payload is UTF-8 bytes of pure-ASCII text.
    return (
        """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000,
                   repeat('#', 32)
                   || substr(text, 1, (strlen(text) * 3) // 4)
            FROM documents WHERE doc_id % 10 = 0
        ),
"""
        + _AUDIO_FP_CORE_SQL
        + """,
        rare AS (
            SELECT fp_key FROM fp
            GROUP BY fp_key HAVING COUNT(DISTINCT doc_id) <= 16
        ), keyed AS (
            SELECT f.* FROM fp f JOIN rare USING (fp_key)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(b.shingle_idx - a.shingle_idx AS INTEGER)
                   AS frame_offset,
               COUNT(*) AS votes
        FROM keyed a JOIN keyed b
          ON a.fp_key = b.fp_key AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= 4
"""
    )


# ---- image near-dup candidate pairs (completes the image branch) ----

IMAGE_BAND_DF_CAP = 16  # band buckets in more docs are stop-buckets
IMAGE_HAMMING_MAX = 3   # the banding guarantee: <=3 => a band collides


def _image_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus every 10th re-emitted under doc_id+1e6 — the
    duplicated-upload fixture, same construction as the video/audio
    near-dup entries (the oracle replays it in SQL)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return with_binary_payload(docs.unionByName(dups)).select(
        "doc_id", "payload"
    )


def image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: image near-dup CANDIDATE PAIRS end to end —
    the join the image_phash_index substrate exists for: melt the 4
    LSH bands to (band_idx, band_val) keys, drop stop-buckets
    (> IMAGE_BAND_DF_CAP docs — uniform/black images), equi-join on
    the band key, dedupe pairs, and keep pairs within Hamming
    distance IMAGE_HAMMING_MAX over the full 56-bit dHash (the
    pigeonhole guarantee: any pair at <=3 bit flips shares at least
    one 14-bit band, so the bucketed join has perfect recall for the
    radius — never all-pairs, per-key fan-out bounded by the cap).
    The phash table is pinned once (localCheckpoint): it feeds the
    cap aggregate and both join sides; at scale it is the persisted
    image_phash_index."""
    ph = image_phash(_image_dup_corpus(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    melted = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"band{i}").alias("band_val"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_idx", "b.band_val")
    rare = (
        melted.groupBy("band_idx", "band_val")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= IMAGE_BAND_DF_CAP)
        .select("band_idx", "band_val")
    )
    keyed = melted.join(rare, ["band_idx", "band_val"])
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("int").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= IMAGE_HAMMING_MAX)
    )


# the dHash pipeline in DuckDB SQL, parameterized by the corpus CTE —
# shared by the index entry (corpus = documents) and the pairs entry
# (corpus = documents + injected dups)
_IMAGE_PHASH_CORE_SQL = """
        raw AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) AS L
            FROM corpus
        ), dims AS (
            SELECT doc_id, h, L,
                   16 + (CASE WHEN L > 0 THEN
                       (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1
                   ELSE 0 END) % 16 AS w,
                   16 + (CASE WHEN L > 1 THEN
                       (strpos('0123456789ABCDEF', substr(h, 3, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h, 4, 1)) - 1
                   ELSE 0 END) % 16 AS hh
            FROM raw
        ), gy AS (
            SELECT *, unnest(range(0, 8)) AS y FROM dims
        ), gx AS (
            SELECT *, unnest(range(0, 8)) AS x FROM gy
        ), gc AS (
            SELECT *, unnest(range(0, 3)) AS c FROM gx
        ), px AS (
            SELECT doc_id, y, x,
                   CASE WHEN L = 0 THEN 0 ELSE
                       (strpos('0123456789ABCDEF', substr(h,
                           2 * ((((y * hh // 8) * w + (x * w // 8)) * 3 + c)
                                % L) + 1, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h,
                           2 * ((((y * hh // 8) * w + (x * w // 8)) * 3 + c)
                                % L) + 2, 1)) - 1
                   END AS byte
            FROM gc
        ), gray AS (
            SELECT doc_id, y, x, SUM(byte) // 3 AS g
            FROM px GROUP BY doc_id, y, x
        ), bits AS (
            SELECT a.doc_id,
                   CASE WHEN a.g > b.g THEN
                       CAST(1 AS BIGINT) << (a.y * 7 + a.x)
                   ELSE 0 END AS bit
            FROM gray a JOIN gray b
              ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
            WHERE a.x < 7
        ), hashes AS (
            SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS phash
            FROM bits GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, phash,
                   (phash >> 0) & 16383 AS band0,
                   (phash >> 14) & 16383 AS band1,
                   (phash >> 28) & 16383 AS band2,
                   (phash >> 42) & 16383 AS band3
            FROM hashes
        )
"""


def image_phash_oracle_sql() -> str:
    return (
        "WITH corpus AS (SELECT doc_id, text FROM documents),\n"
        + _IMAGE_PHASH_CORE_SQL
        + "\n        SELECT doc_id, phash, band0, band1, band2, band3"
        "\n        FROM banded"
    )


def image_near_dup_oracle_sql() -> str:
    return (
        """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text
            FROM documents WHERE doc_id % 10 = 0
        ),
"""
        + _IMAGE_PHASH_CORE_SQL
        + f""",
        melted AS (
            SELECT doc_id, phash, u.band_idx, u.band_val
            FROM banded,
                 LATERAL (
                     SELECT * FROM (VALUES
                         (0, band0), (1, band1), (2, band2), (3, band3)
                     ) AS v(band_idx, band_val)
                 ) AS u
        ), rare AS (
            SELECT band_idx, band_val FROM melted
            GROUP BY 1, 2
            HAVING COUNT(DISTINCT doc_id) <= {IMAGE_BAND_DF_CAP}
        ), keyed AS (
            SELECT m.* FROM melted m JOIN rare USING (band_idx, band_val)
        ), pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER)
                       AS hamming
            FROM keyed a JOIN keyed b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, hamming FROM pairs
        WHERE hamming <= {IMAGE_HAMMING_MAX}
"""
    )
