"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship parse->enrich->route fan-out on sf0.001
queries()     -> one entry per implemented operator (SURVEY.md section 2)
oracle_sql()  -> DuckDB-equivalent SQL per query (correctness gate)

The transcripts input table (BASELINE.json input_hint) is synthesized
deterministically from the driver's events table and materialized under
data/<sf>/transcripts.parquet so both engines read identical bytes
(skewer_spark/datagen.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.queries import q_route_fanout

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ensure_transcripts(sf)
    return q_route_fanout(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from skewer_spark.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from skewer_spark.datagen import ensure_rawlines, ensure_transcripts
    from skewer_spark.queries import ORACLE_SF_DIR, build_oracles

    ensure_transcripts(ORACLE_SF_DIR)
    ensure_rawlines(ORACLE_SF_DIR)
    return build_oracles()
