"""Third-decade measurement for embedding_near_dup_lsh (r15).

LSH_BANDS.json's analysis: the 1.343 alpha on 2k→20k is the
multi-table construction's T ∝ n^0.62 growth, which hit
MAX_BAND_TABLES (1024) inside that decade — so past the cap the
prediction is a FALLING exponent (T frozen; per-table collisions ≈ n
by the b ≈ log₂n design point). This script measures the 20k→200k
decade (ensure_xl_emb) with the same occupancy probe, appends the
result + the measured third alpha to LSH_BANDS.json, and prints it.
Both decades are timed inside ONE session by the same probe, so the
ratio is apples-to-apples.

Usage: python scripts/lsh_third_decade.py   (quiet host; ~15-40 min)
"""

from __future__ import annotations

import json
import math
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from gen_growth_fixture import ensure as ensure_sf1  # noqa: E402
from gen_growth_fixture import ensure_xl_emb  # noqa: E402
from lsh_bands_probe import probe  # noqa: E402

from data_ingestion_pipeline_spark.operators import similarity as S  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("lsh-third-decade")
    sf1 = ensure_sf1()
    xl = ensure_xl_emb()
    # warmup: absorb JVM/codegen on the small decade untimed
    S.embedding_near_dup_lsh(spark, "/root/testdata/sf0.1").count()

    r1 = probe(spark, sf1)
    print(json.dumps({"sf1eq": r1}, indent=1), flush=True)
    r2 = probe(spark, xl)
    print(json.dumps({"sf10eq": r2}, indent=1), flush=True)

    alpha = round(
        math.log(r2["operator_sec"] / r1["operator_sec"])
        / math.log(r2["n_vectors"] / r1["n_vectors"]),
        3,
    )
    path = ROOT / "LSH_BANDS.json"
    doc = json.loads(path.read_text()) if path.is_file() else {}
    doc["third_decade"] = {
        "segments": "sf1eq(20k) -> sf10eq(200k), same-session probe pair",
        "sf1eq": r1,
        "sf10eq": r2,
        "alpha_time": alpha,
        "prediction": "falls below the 2k->20k 1.343 once T is capped "
        "at both decades (LSH_BANDS analysis)",
    }
    path.write_text(json.dumps(doc, indent=1))
    print(f"third-decade alpha_time = {alpha}")
    spark.stop()


if __name__ == "__main__":
    main()
