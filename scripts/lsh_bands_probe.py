"""Band-bucket occupancy probe for embedding_near_dup_lsh
(VERDICT r14 task 4: alpha_time 1.343 on the 2k→20k decade is the
closest approach to the 1.5 gate — is it bucket skew, the SimHash r4
lesson, or something structural?).

Measures, per scale factor:
  - (band_bits, n_tables) the operator derives, and whether T hit
    MAX_BAND_TABLES (the cost ceiling);
  - bucket occupancy of the banded key table: top-10 bucket sizes,
    Σc·(c−1)/2 (the exact pre-dedup candidate volume the equi-join
    produces), and the fraction of that volume contributed by the
    top 0.1% of buckets — the skew number;
  - per-stage row counts: distinct candidate pairs, post-Hamming
    survivors, final cosine-threshold output (the TRUE answer volume).

Writes LSH_BANDS.json (committed) — the evidence behind SCALING.md's
note on this operator's growth exponent.

Usage: python scripts/lsh_bands_probe.py   (~3 min, local[32])
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from gen_growth_fixture import ensure as ensure_fixture  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_pipeline_spark.operators import similarity as S  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402
from data_ingestion_pipeline_spark.sources.tables import load_table  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    emb = S._with_norm(load_table(spark, sf_dir, "embeddings"))
    n = emb.count()
    dim = S._vector_dim(emb)
    band_bits, n_tables = S._lsh_params(n, S.NEAR_DUP_COSINE)
    bk = S._band_keys(emb, n_tables, band_bits, dim).localCheckpoint(
        eager=True
    )

    occ = (
        bk.groupBy("band_table", "band_key")
        .count()
        .select("count")
        .localCheckpoint(eager=True)
    )
    top10 = [
        r["count"]
        for r in occ.orderBy(F.desc("count")).limit(10).collect()
    ]
    stats = occ.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("count") * (F.col("count") - 1)) / 2).alias("pair_vol"),
        F.max("count").alias("max_occ"),
    ).collect()[0]
    n_buckets = stats["n_buckets"]
    k_top = max(1, int(n_buckets * 0.001))
    top_vol = (
        occ.orderBy(F.desc("count"))
        .limit(k_top)
        .agg(F.sum((F.col("count") * (F.col("count") - 1)) / 2))
        .collect()[0][0]
        or 0
    )

    pairs = (
        bk.select(F.col("vec_id").alias("vec_a"), "band_table", "band_key")
        .join(
            bk.select(F.col("vec_id").alias("vec_b"), "band_table", "band_key"),
            ["band_table", "band_key"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    distinct_pairs = pairs.dropDuplicates().count()
    t0 = time.perf_counter()
    out_rows = S.embedding_near_dup_lsh(spark, sf_dir).count()
    op_sec = round(time.perf_counter() - t0, 2)

    return {
        "n_vectors": n,
        "band_bits": band_bits,
        "n_tables": n_tables,
        "t_capped": n_tables == S.MAX_BAND_TABLES,
        "bk_rows": n * n_tables,
        "n_buckets": n_buckets,
        "top10_occupancy": top10,
        "pair_volume_pre_dedup": int(stats["pair_vol"]),
        "top_0p1pct_share": round(float(top_vol) / max(float(stats["pair_vol"]), 1.0), 4),
        "max_occupancy": stats["max_occ"],
        "distinct_candidate_pairs": distinct_pairs,
        "final_output_pairs": out_rows,
        "operator_sec": op_sec,
    }


def main() -> None:
    spark = get_spark("lsh-bands-probe")
    dirs = ["/root/testdata/sf0.1", ensure_fixture()]
    out = {}
    for d in dirs:
        out[os.path.basename(d.rstrip("/"))] = probe(spark, d)
        print(json.dumps(out, indent=1), flush=True)
    (ROOT / "LSH_BANDS.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
