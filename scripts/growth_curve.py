"""Empirical sub-quadratic growth check for the dedup/LSH family.

The scale claims for the candidate-generation operators are pinned by
plan shape (no CartesianProduct, banded/bucketed equi-joins), but plan
shape alone doesn't bound CONSTANTS — a hot bucket can still make a
"banded" join quadratic in practice. This harness measures wall time
across scale factors and fits the growth exponent

    alpha = log(t_big / t_small) / log(n_big / n_small)

on the sf0.01 -> sf0.1 segment — the only real scale step in the
testdata (documents/embeddings are both 500 rows at sf0.001 AND
sf0.01; sf0.1 has 5000 docs / 2000 embeddings). sf0.01 is run first
untimed as warmup so the fixed job overhead doesn't inflate the small
point. All-pairs work is alpha ~= 2; the gate is alpha < 1.5, matching
the operators' advertised O(n·~const) / O(n^1.5) shapes.

Each operator also reports its OUTPUT row count per SF — deterministic
corroborating evidence that candidate volume, not just time, grows
sub-quadratically.

Writes GROWTH_CURVE.json (committed per round) and prints one line per
operator. Exits non-zero if any exponent breaches the gate.

Usage: python scripts/growth_curve.py   (~2-4 min, local[32])
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from data_ingestion_pipeline_spark.operators import dedup, similarity  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402
from data_ingestion_pipeline_spark.sources.tables import load_table  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
ALPHA_GATE = 1.5

# production candidate-generation paths (the bench_fn side — grading
# joins would re-introduce the quadratic oracle these exist to avoid)
OPS = {
    "minhash_lsh_candidates": dedup.minhash_lsh_candidates,
    "simhash_candidates": dedup.simhash_candidates,
    "embedding_near_dup_lsh": similarity.embedding_near_dup_lsh,
    "jaccard_prefix_join": dedup.jaccard_prefix_join,
    "dup_clusters": dedup.dup_clusters,
}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("growth-curve", cpus=cpus)

    # rows per sf: documents for the text family, embeddings for LSH
    doc_rows = {d: load_table(spark, d, "documents").count() for d in SF_DIRS}
    emb_rows = {d: load_table(spark, d, "embeddings").count() for d in SF_DIRS}
    rows_for = lambda name: emb_rows if name == "embedding_near_dup_lsh" else doc_rows  # noqa: E731

    # untimed warmup (JVM/codegen boot otherwise lands on the first op)
    load_table(spark, SF_DIRS[0], "documents").count()

    out, failed = {}, []
    for name, fn in OPS.items():
        # per-operator warmup at the small SF: codegen/compile cost
        # otherwise inflates the small point and with it the exponent
        fn(spark, SF_DIRS[0]).count()
        times, counts = [], []
        for d in SF_DIRS:
            t0 = time.perf_counter()
            n_out = fn(spark, d).count()
            times.append(round(time.perf_counter() - t0, 2))
            counts.append(n_out)
        n = [rows_for(name)[d] for d in SF_DIRS]
        alpha_time = math.log(times[1] / times[0]) / math.log(n[1] / n[0])
        alpha_out = (
            math.log(max(counts[1], 1) / max(counts[0], 1))
            / math.log(n[1] / n[0])
        )
        out[name] = {
            "rows": n,
            "sec": times,
            "out_rows": counts,
            "alpha_time": round(alpha_time, 3),
            "alpha_out": round(alpha_out, 3),
            "gate": ALPHA_GATE,
            "ok": alpha_time < ALPHA_GATE,
        }
        line = (
            f"{name}: n={n} sec={times} out={counts} "
            f"alpha_time={alpha_time:.3f} alpha_out={alpha_out:.3f} "
            f"{'OK' if alpha_time < ALPHA_GATE else 'BREACH'}"
        )
        print(line, flush=True)
        if alpha_time >= ALPHA_GATE:
            failed.append(name)

    root = pathlib.Path(__file__).resolve().parents[1]
    (root / "GROWTH_CURVE.json").write_text(
        json.dumps(
            {"gate": ALPHA_GATE, "segment": "sf0.01->sf0.1", "ops": out},
            indent=1,
        )
    )
    spark.stop()
    if failed:
        print(f"GROWTH GATE BREACH: {failed}")
        sys.exit(1)
    print("all operators sub-quadratic (alpha < 1.5)")


if __name__ == "__main__":
    main()
