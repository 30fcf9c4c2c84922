"""Bucketed co-located join: the analytics docstrings claim that at
scale the orders⋈lineitem shuffle disappears when both tables are
bucketed on orderkey at write time — this test proves the claim on
this engine: bucketed tables join with NO Exchange in the plan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST

N_BUCKETS = 8


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    load_table(spark, SF_TEST, "orders").write.bucketBy(
        N_BUCKETS, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    load_table(spark, SF_TEST, "lineitem").write.bucketBy(
        N_BUCKETS, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        # co-located: bucket layout satisfies the join AND the groupBy
        # distribution — no Exchange anywhere before the join
        join_part = plan.split("Join")[0]
        assert "Exchange" not in join_part, join_part
        # correctness unchanged vs unbucketed join
        base = (
            load_table(spark, SF_TEST, "lineitem")
            .join(
                load_table(spark, SF_TEST, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.agg(F.sum("n")).first()[0] == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("orders_b", "lineitem_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
