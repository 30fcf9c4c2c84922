"""Profile the two regressed versioned roundtrips (VERDICT r12 finding b).

Times each phase of versioned_cow_roundtrip / versioned_table_roundtrip
at the bench SF so the grown constant can be localized, not guessed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_ingestion_pipeline_spark.session import apply_session_conf

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("profile-versioned")
        .getOrCreate()
    )
    apply_session_conf(spark)
    from data_ingestion_pipeline_spark.operators import versioned as V
    from data_ingestion_pipeline_spark.sources.tables import load_table
    from data_ingestion_pipeline_spark.operators.upsert import scratch_path
    import shutil

    # warm the session/catalyst
    load_table(spark, SF, "events").count()

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        print(f"  {name:45s} {time.time()-t0:6.2f}s")
        return out

    for trial in range(2):
        print(f"== cow roundtrip trial {trial}")
        path = scratch_path("prof_cow", "sf", "table")
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        ev = load_table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        phase("commit_version_partitioned v1", lambda: V.commit_version_partitioned(spark, path, ev))
        updates = ev.filter(F.to_date("ts") == F.lit("2024-01-10").cast("date")).withColumn(
            "value", F.col("value") + 1000.0
        )
        phase("upsert_version_cow", lambda: V.upsert_version_cow(spark, path, updates, ["event_id"]))
        phase("read_version.count", lambda: V.read_version(spark, path).count())

        print(f"== table roundtrip trial {trial}")
        path2 = scratch_path("prof_tbl", "sf", "table")
        shutil.rmtree(path2, ignore_errors=True)
        os.makedirs(path2, exist_ok=True)
        phase("commit_version v1", lambda: V.commit_version(spark, path2, ev))
        up2 = ev.filter(F.col("event_id") % 10 == 0).withColumn("value", F.col("value") + 1000.0)
        phase("upsert_version", lambda: V.upsert_version(spark, path2, up2, ["event_id"]))
        phase("read_version(v1).count", lambda: V.read_version(spark, path2, version=1).count())

        print(f"== dv delete trial {trial}")
        path3 = scratch_path("prof_dv", "sf", "table")
        shutil.rmtree(path3, ignore_errors=True)
        os.makedirs(path3, exist_ok=True)
        phase("commit v1 (8 parts)", lambda: V.commit_version(spark, path3, ev.repartition(8)))
        phase("delete_rows_dv #1", lambda: V.delete_rows_dv(spark, path3, F.col("event_type") == "error"))
        phase("delete_rows_dv #2", lambda: V.delete_rows_dv(spark, path3, F.col("value") < 10.0))
        phase("read_version.count", lambda: V.read_version(spark, path3).count())

    spark.stop()


if __name__ == "__main__":
    main()
