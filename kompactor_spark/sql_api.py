"""ANSI-SQL entry point (engine facade).

The reference's data plane is a SQL string handed to DuckDB
(kompactor.ts:106-113); our engine's equivalent surface is Spark SQL
over the same tables. ``register_views`` pins the testdata tables as
temp views once per (session, sf_dir); ``run_sql`` then executes any
ANSI query through Catalyst — same optimizer, same plans as the
DataFrame API (they meet at the logical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kompactor_spark.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def observed(df, name: str, *metrics):
    """Attach named in-flight metrics to a DataFrame (Spark Observation).

    Returns (df_with_observation, observation). The metrics are computed
    DURING the job's one pass — no second scan — and read from
    ``observation.get`` after any action. This is how a 100 TB pipeline
    job reports row counts / null rates / value bounds without paying an
    extra pass: attach, run the write, then assert the data contract.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
