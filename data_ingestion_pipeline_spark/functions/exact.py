"""Order-independent (exact) floating-point aggregation.

Why this exists: ``SUM(double)`` depends on summation order, and
Spark's partial aggregation order depends on partitioning — so the
same query can return different last-bits on 32 partitions vs 3,200,
and will rarely bit-match a single-threaded engine (the DuckDB
oracle). Summing exact decimals instead is associative and
commutative, so the result is identical on one core or a
1000-executor cluster, and identical across engines.

Pattern: cast each double term to DECIMAL(38, s) (one rounding, done
identically per-row in every engine), sum exactly, and cast the final
sum back to double. AVG is the exact sum divided by COUNT — one final
double division, deterministic.

Cost: decimal sum is slower than double sum but stays inside
whole-stage codegen (no Python); at 100 TB the scan dominates and
the delta is noise. Use these for any result a user would diff.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits comfortably covers the testdata's 2-decimal
# measures; 38 total digits means overflow needs >1e31 row-sums.
SCALE = 6


def dec_sum(col: Column | str, scale: int = SCALE) -> Column:
    """Exact SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = SCALE) -> Column:
    """Exact-sum AVG of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def dec_sum_expr(expr: str, scale: int = SCALE) -> str:
    """SQL-string form of dec_sum for spark.sql / DuckDB oracles."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def dec_avg_expr(expr: str, scale: int = SCALE) -> str:
    """SQL-string form of dec_avg (exact sum / count)."""
    return f"({dec_sum_expr(expr, scale)} / COUNT({expr}))"
