"""Empirical sub-quadratic growth check for the dedup/LSH family.

The scale claims for the candidate-generation operators are pinned by
plan shape (no CartesianProduct, banded/bucketed equi-joins), but plan
shape alone doesn't bound CONSTANTS — a hot bucket can still make a
"banded" join quadratic in practice. This harness measures wall time
across scale factors and fits the growth exponent

    alpha = log(t_big / t_small) / log(n_big / n_small)

over TWO decades: sf0.01 -> sf0.1 (500 -> 5,000 docs / 2,000
embeddings, driver testdata) and sf0.1 -> sf1-equivalent (50,000 docs
/ 20,000 embeddings, the deterministic generated fixture —
scripts/gen_growth_fixture.py). The second decade exists because a
single 10x step is a thin extrapolation base for 100 TB claims; two
consecutive exponents that agree are much harder to fake with fixed
overheads. sf0.01 is run first untimed as warmup so fixed job overhead
doesn't inflate the small point. All-pairs work is alpha ~= 2; the
gate is alpha < 1.5 on EVERY segment, matching the operators'
advertised O(n·~const) / O(n^1.5) shapes.

Each operator also reports its OUTPUT row count per SF — deterministic
corroborating evidence for candidate volume. Caveat on reading
alpha_out for the exact-output operators (embedding_near_dup_lsh,
simhash_candidates): at a FIXED similarity threshold over near-random
vectors/short-vocab docs, the TRUE pair count itself grows ~n² (random
background pairs cross the threshold at a constant per-pair rate), so
any CORRECT operator's output is quadratic there — which is why the
gate is on alpha_TIME: the join strategy's cost must stay sub-
quadratic even when the data's answer volume doesn't.

Writes GROWTH_CURVE.json (committed per round) and prints one line per
operator. Exits non-zero if any exponent breaches the gate.

Usage: python scripts/growth_curve.py   (~5-10 min, local[32])
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from gen_growth_fixture import ensure as ensure_fixture  # noqa: E402
from gen_growth_fixture import ensure_xl as ensure_fixture_xl  # noqa: E402

from data_ingestion_pipeline_spark.operators import (  # noqa: E402
    dedup,
    multimodal,
    similarity,
)
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402
from data_ingestion_pipeline_spark.sources.tables import load_table  # noqa: E402

ALPHA_GATE = 1.5
SEGMENTS = ["sf0.01->sf0.1", "sf0.1->sf1eq(generated)"]

# production candidate-generation paths (the bench_fn side — grading
# joins would re-introduce the quadratic oracle these exist to avoid).
# The multimodal trio (r14, VERDICT r13 task 3): image_phash_index is
# the map-only banding substrate (expected alpha ~1), while
# video_frame_overlap and audio_near_dup_pairs include their df-capped
# candidate joins — the class the alpha gate exists for.
OPS = {
    "minhash_lsh_candidates": dedup.minhash_lsh_candidates,
    "minhash_incremental_probe": dedup.minhash_incremental_candidates,
    "simhash_candidates": dedup.simhash_candidates,
    "embedding_near_dup_lsh": similarity.embedding_near_dup_lsh,
    "embedding_index_probe": similarity.embedding_index_incremental_pairs,
    "jaccard_prefix_join": dedup.jaccard_prefix_join,
    "dup_clusters": dedup.dup_clusters,
    "semantic_dedup": similarity.semantic_dedup,
    "image_phash_index": multimodal.image_phash_index,
    "image_near_dup_pairs": multimodal.image_near_dup_pairs,
    "video_frame_overlap": multimodal.video_frame_overlap,
    "audio_near_dup_pairs": multimodal.audio_near_dup_pairs,
}
EMB_OPS = {
    "embedding_near_dup_lsh",
    "embedding_index_probe",
    "semantic_dedup",
}
# ops measured one decade further (500k docs, Heaps-law vocabulary —
# see gen_growth_fixture.ensure_xl): the steepest curves, where the
# standard two decades are the thinnest extrapolation base
XL_OPS = {"jaccard_prefix_join"}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = os.environ.get("SPARK_GRAFT_GROWTH_ONLY", "").strip()
    ops = OPS
    if only:
        want = {s.strip() for s in only.split(",") if s.strip()}
        unknown = want - set(OPS)
        if unknown:
            raise SystemExit(f"unknown growth ops: {sorted(unknown)}")
        ops = {k: v for k, v in OPS.items() if k in want}
    spark = get_spark("growth-curve", cpus=cpus)
    sf_dirs = [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        ensure_fixture(),  # sf1-equivalent, generated + gitignored
    ]
    xl_dir = ensure_fixture_xl()  # sf10-equivalent, documents only

    # rows per sf: documents for the text family, embeddings for LSH
    doc_rows = {d: load_table(spark, d, "documents").count() for d in sf_dirs}
    doc_rows[xl_dir] = load_table(spark, xl_dir, "documents").count()
    emb_rows = {d: load_table(spark, d, "embeddings").count() for d in sf_dirs}
    rows_for = lambda name: emb_rows if name in EMB_OPS else doc_rows  # noqa: E731

    out, failed = {}, []
    for name, fn in ops.items():
        # FRESH SESSION PER OPERATOR: the candidate-generation ops
        # localCheckpoint large intermediates, and those blocks live in
        # the block manager for the session's lifetime — by the time
        # the 500k-doc decade ran, earlier ops' lingering blocks plus
        # its own shuffle spill exceeded local disk (SPILL_OUT_OF_
        # MEMORY, observed r13). A session restart is the deterministic
        # reclaim; the per-op small-SF warmup below re-absorbs the JVM/
        # codegen boot it resets, so timed points stay engine
        # measurements.
        spark.stop()
        spark = get_spark(f"growth-{name}", cpus=cpus)
        # per-operator warmup at the small SF: codegen/compile cost
        # otherwise inflates the small point and with it the exponent
        fn(spark, sf_dirs[0]).count()
        dirs = sf_dirs + ([xl_dir] if name in XL_OPS else [])
        times, counts = [], []
        for d in dirs:
            t0 = time.perf_counter()
            n_out = fn(spark, d).count()
            times.append(round(time.perf_counter() - t0, 2))
            counts.append(n_out)
        n = [rows_for(name)[d] for d in dirs]
        alphas, alphas_out = [], []
        for i in range(1, len(dirs)):
            alphas.append(
                round(
                    math.log(times[i] / times[i - 1])
                    / math.log(n[i] / n[i - 1]),
                    3,
                )
            )
            alphas_out.append(
                round(
                    math.log(max(counts[i], 1) / max(counts[i - 1], 1))
                    / math.log(n[i] / n[i - 1]),
                    3,
                )
            )
        ok = all(a < ALPHA_GATE for a in alphas)
        out[name] = {
            "rows": n,
            "sec": times,
            "out_rows": counts,
            "alpha_time": alphas,
            "alpha_out": alphas_out,
            "gate": ALPHA_GATE,
            "ok": ok,
            **(
                {"segments": SEGMENTS + ["sf1eq->sf10eq(generated)"]}
                if name in XL_OPS
                else {}
            ),
        }
        print(
            f"{name}: n={n} sec={times} out={counts} "
            f"alpha_time={alphas} alpha_out={alphas_out} "
            f"{'OK' if ok else 'BREACH'}",
            flush=True,
        )
        if not ok:
            failed.append(name)

    root = pathlib.Path(__file__).resolve().parents[1]
    gc_path = root / "GROWTH_CURVE.json"
    # merge-preserve the metadata-path block scripts/metadata_growth.py
    # maintains (and symmetrically there)
    prev = json.loads(gc_path.read_text()) if gc_path.is_file() else {}
    merged_ops = {**prev.get("ops", {}), **out} if only else out
    doc = {
        "gate": ALPHA_GATE,
        "segments": SEGMENTS,
        "ops": merged_ops,
    }
    for k in ("metadata_path", "merge_commit", "cdc_loop"):
        if k in prev:
            doc[k] = prev[k]
    gc_path.write_text(json.dumps(doc, indent=1))
    spark.stop()
    if failed:
        print(f"GROWTH GATE BREACH: {failed}")
        sys.exit(1)
    print("all operators sub-quadratic (alpha < 1.5) on every segment")


if __name__ == "__main__":
    main()
