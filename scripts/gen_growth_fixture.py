"""Deterministic 10x-scale fixture for the growth-curve harness.

The committed growth exponents extrapolate 500 -> 5,000 rows (sf0.01
-> sf0.1) — a thin base for 100 TB claims. This generator produces an
"sf1-equivalent" documents/embeddings pair, one decade above sf0.1
(50,000 docs / 20,000 embeddings), mirroring the driver testdata's
statistical shape so the candidate-generation operators run unchanged:

- documents: same 31-word vocabulary, 45-100 token lengths, same
  lang/source columns; ~4% of docs are planted near-duplicates of an
  earlier ORIGINAL doc (3% token mutations — high shingle overlap,
  the structure MinHash/SimHash/PPJoin candidates key on).
- embeddings: unit-norm float32[64]; ~6% planted near-duplicates of
  an earlier ORIGINAL vector (small additive noise, renormalized —
  cosine ~0.99 against the source, matching the testdata's dup
  family).

Duplicate family sizes are CAPPED at 3 (each original takes at most 2
copies, copies never copy copies): without the cap, dup-of-dup chains
compound into large mutually-similar families whose TRUE pair count —
the exact output any correct near-dup operator must emit — grows
quadratically, and the growth gate would then measure the data's pair
density, not the operator's join strategy.

Everything is seeded (RandomState(42)); the fixture is regenerated on
demand (scripts/growth_curve.py calls ensure()) and ignored by git —
~20 MB of parquet is derived state, not source. Do NOT use it for
oracle grading: it extends the SCALING evidence, not correctness.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / ".growth_fixture" / "sf1"
N_DOCS = 50_000
N_EMB = 20_000
DIM = 64
SEED = 42

VOCAB = np.array([
    "the", "line", "small", "group", "spark", "fast", "customer",
    "batch", "data", "sort", "value", "hash", "filter", "big", "dup",
    "column", "order", "a", "vector", "part", "scan", "slow", "agg",
    "key", "window", "table", "merge", "join", "query", "row",
    "stream",
])
LANGS = np.array(["en", "de", "fr", "es", "zh"])


def _documents(rng: np.random.RandomState):
    import pandas as pd

    texts: list[str] = []
    toks_of: list[np.ndarray] = []
    originals: list[int] = []
    copies = np.zeros(N_DOCS, dtype=np.int32)
    for i in range(N_DOCS):
        j = originals[rng.randint(0, len(originals))] if originals else -1
        if i > 100 and rng.rand() < 0.04 and j >= 0 and copies[j] < 2:
            # near-dup: clone an earlier ORIGINAL, mutate ~3% of tokens
            copies[j] += 1
            toks = toks_of[j].copy()
            n_mut = max(1, int(0.03 * len(toks)))
            pos = rng.choice(len(toks), size=n_mut, replace=False)
            toks[pos] = VOCAB[rng.randint(0, len(VOCAB), size=n_mut)]
        else:
            n = rng.randint(45, 101)
            toks = VOCAB[rng.randint(0, len(VOCAB), size=n)]
            originals.append(i)
        toks_of.append(toks)
        texts.append(" ".join(toks))
    lang = LANGS[rng.randint(0, len(LANGS), size=N_DOCS)]
    source = np.array([f"src{j}" for j in rng.randint(0, 20, size=N_DOCS)])
    return pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def _embeddings(rng: np.random.RandomState):
    import pandas as pd

    E = rng.randn(N_EMB, DIM)
    dup_mask = (np.arange(N_EMB) > 100) & (rng.rand(N_EMB) < 0.06)
    copies = np.zeros(N_EMB, dtype=np.int32)
    for i in np.flatnonzero(dup_mask):
        j = rng.randint(0, i)
        if dup_mask[j] or copies[j] >= 2:
            continue  # copies never copy copies; family size ≤ 3
        copies[j] += 1
        E[i] = E[j] + 0.05 * rng.randn(DIM)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(N_EMB, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in E],
            "label": rng.randint(0, 10, size=N_EMB).astype(np.int32),
        }
    )


def ensure() -> str:
    """Generate the fixture if absent; return its directory path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = OUT / "_GENERATED"
    if done.is_file():
        return str(OUT)
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.RandomState(SEED)
    docs = _documents(rng)
    emb = _embeddings(rng)
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        OUT / "documents.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            emb,
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
            preserve_index=False,
        ),
        OUT / "embeddings.parquet",
    )
    done.write_text("seed=42 docs=50000 emb=20000\n")
    return str(OUT)


# ---- sf10-equivalent (500k docs) — the jaccard_prefix_join decade ----
# VERDICT r12 task 4: alpha 1.42 on the 5k→50k segment is the repo's
# steepest curve; one more decade tells whether prefix selectivity
# holds. Vocabulary is the load-bearing modeling decision here: the
# smaller fixtures reuse the testdata's FIXED 31-word vocabulary, whose
# ~31³ trigram-shingle space SATURATES — at 500k docs every shingle's
# document frequency grows ~linearly with n, prefix buckets grow with
# it, and ANY exact AllPairs-family join degenerates quadratically (the
# true candidate set itself does; no join strategy can beat
# enumerating it). Natural corpora don't behave that way: vocabulary
# grows with corpus size (Heaps' law, V ∝ n^β, β≈0.4-0.6), so shingle
# document frequencies stay roughly FLAT as the corpus grows. The XL
# fixture models that: its vocabulary scales by β=0.5 (31 → 98 words
# for 50k → 500k docs), holding per-shingle df comparable across the
# decade — so the measured exponent isolates the JOIN STRATEGY, which
# is the claim under test, not the synthetic vocabulary's saturation.
# The saturation bound itself is documented on jaccard_prefix_join.
OUT_XL = ROOT / ".growth_fixture" / "sf10"
N_DOCS_XL = 500_000
HEAPS_BETA = 0.5


def _vocab_for(n_docs: int) -> np.ndarray:
    """Heaps-law vocabulary for a corpus of n_docs: the base 31 words
    extended with deterministic synthetic words to V = 31·(n/50k)^β."""
    v = max(len(VOCAB), int(round(len(VOCAB) * (n_docs / N_DOCS) ** HEAPS_BETA)))
    extra = [f"w{i:03d}" for i in range(v - len(VOCAB))]
    return np.concatenate([VOCAB, np.array(extra)]) if extra else VOCAB


def _documents_sized(
    rng: np.random.RandomState, n_docs: int, vocab: np.ndarray
):
    """_documents generalized to (n_docs, vocab) — same dup structure:
    ~4% near-dups of an earlier original, family size ≤ 3."""
    import pandas as pd

    texts: list[str] = []
    toks_of: list[np.ndarray] = []
    originals: list[int] = []
    copies = np.zeros(n_docs, dtype=np.int32)
    for i in range(n_docs):
        j = originals[rng.randint(0, len(originals))] if originals else -1
        if i > 100 and rng.rand() < 0.04 and j >= 0 and copies[j] < 2:
            copies[j] += 1
            toks = toks_of[j].copy()
            n_mut = max(1, int(0.03 * len(toks)))
            pos = rng.choice(len(toks), size=n_mut, replace=False)
            toks[pos] = vocab[rng.randint(0, len(vocab), size=n_mut)]
        else:
            n = rng.randint(45, 101)
            toks = vocab[rng.randint(0, len(vocab), size=n)]
            originals.append(i)
        toks_of.append(toks)
        texts.append(" ".join(toks))
    lang = LANGS[rng.randint(0, len(LANGS), size=n_docs)]
    source = np.array([f"src{j}" for j in rng.randint(0, 20, size=n_docs)])
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def ensure_xl() -> str:
    """Generate the 500k-doc fixture if absent; return its path.
    Documents only — the XL decade exists for the text-join family."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = OUT_XL / "_GENERATED"
    if done.is_file():
        return str(OUT_XL)
    os.makedirs(OUT_XL, exist_ok=True)
    rng = np.random.RandomState(SEED + 1)
    docs = _documents_sized(rng, N_DOCS_XL, _vocab_for(N_DOCS_XL))
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        OUT_XL / "documents.parquet",
    )
    done.write_text(
        f"seed={SEED + 1} docs={N_DOCS_XL} "
        f"vocab={len(_vocab_for(N_DOCS_XL))} beta={HEAPS_BETA}\n"
    )
    return str(OUT_XL)


if __name__ == "__main__":
    print(ensure())


# ---- sf10-equivalent embeddings (200k) — the LSH flattening decade --
# r15: LSH_BANDS.json attributes embedding_near_dup_lsh's 1.343 alpha
# to T ∝ n^ρ growth that CAPS at MAX_BAND_TABLES between the 2k and
# 20k decades; the analysis predicts the exponent FALLS past the cap
# (T frozen, per-table collisions ≈ n by the b ≈ log₂n design). This
# fixture is the decade that tests the prediction. Same dup structure
# as _embeddings (6% near-dups, family ≤ 3, cosine ~0.99), seeded.
OUT_XL_EMB = ROOT / ".growth_fixture" / "sf10emb"
N_EMB_XL = 200_000


def ensure_xl_emb() -> str:
    """Generate the 200k-embedding fixture if absent; return its dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = OUT_XL_EMB / "_GENERATED"
    if done.is_file():
        return str(OUT_XL_EMB)
    os.makedirs(OUT_XL_EMB, exist_ok=True)
    rng = np.random.RandomState(SEED + 7)
    E = rng.randn(N_EMB_XL, DIM)
    dup_mask = (np.arange(N_EMB_XL) > 100) & (rng.rand(N_EMB_XL) < 0.06)
    copies = np.zeros(N_EMB_XL, dtype=np.int32)
    for i in np.flatnonzero(dup_mask):
        j = rng.randint(0, i)
        if dup_mask[j] or copies[j] >= 2:
            continue  # copies never copy copies; family size ≤ 3
        copies[j] += 1
        E[i] = E[j] + 0.05 * rng.randn(DIM)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    import pandas as pd

    emb = pd.DataFrame(
        {
            "vec_id": np.arange(N_EMB_XL, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in E],
            "label": rng.randint(0, 10, size=N_EMB_XL).astype(np.int32),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(
            emb,
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
            preserve_index=False,
        ),
        OUT_XL_EMB / "embeddings.parquet",
    )
    done.write_text(f"seed={SEED + 7} emb={N_EMB_XL}\n")
    return str(OUT_XL_EMB)
