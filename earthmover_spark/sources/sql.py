"""SQL query sources (reference: SqlSource, earthmover/nodes/source.py:521-622).

The reference runs a SQL ``query`` over a SQLAlchemy ``connection`` URL
and loads the whole result into a frame. Spark-first mapping:

- ``jdbc:...`` connections use Spark's JDBC source — executors pull
  partition ranges in parallel (``partition_column``/``num_partitions``),
  so a 100 TB table never funnels through the driver.
- ``duckdb://`` / ``sqlite://`` / ``sqlite:///`` URLs (embedded
  databases, no JDBC driver jar needed) are read driver-side via Arrow
  and distributed with ``createDataFrame`` — correct for dimension-size
  results, which is what the reference uses SqlSource for.
- other SQLAlchemy-style URLs fall back to sqlalchemy when installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from earthmover_spark.util import EarthmoverSparkError


def read_sql(
    spark: SparkSession,
    connection: str,
    query: str,
    *,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    **jdbc_options,
) -> DataFrame:
    """Run ``query`` against ``connection`` and return the result frame."""
    if connection.startswith("jdbc:"):
        reader = (
            spark.read.format("jdbc")
            .option("url", connection)
            .option("query", query)
        )
        if partition_column:
            if num_partitions is None or lower_bound is None or upper_bound is None:
                raise EarthmoverSparkError(
                    "read_sql: partition_column requires num_partitions, "
                    "lower_bound and upper_bound"
                )
            # partitioned JDBC reads require dbtable, not query
            reader = (
                spark.read.format("jdbc")
                .option("url", connection)
                .option("dbtable", f"({query}) AS em_sql_source")
                .option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
            )
        for k, v in jdbc_options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    if connection.startswith("duckdb://"):
        import duckdb

        path = connection[len("duckdb://"):] or ":memory:"
        con = duckdb.connect(path, read_only=path != ":memory:")
        try:
            table = con.sql(query).arrow()
        finally:
            con.close()
        return spark.createDataFrame(table.to_pandas())

    if connection.startswith(("sqlite://", "sqlite:///")):
        import sqlite3

        import pandas as pd

        # sqlalchemy convention: sqlite:///rel.db, sqlite:////abs/path.db
        rest = connection.split("://", 1)[1]
        path = rest[1:] if rest.startswith("/") else rest
        con = sqlite3.connect(path)
        try:
            pdf = pd.read_sql_query(query, con)
        finally:
            con.close()
        return spark.createDataFrame(pdf)

    try:
        import pandas as pd
        import sqlalchemy

        engine = sqlalchemy.create_engine(connection)
        with engine.connect() as con:
            pdf = pd.read_sql_query(query, con)
        return spark.createDataFrame(pdf)
    except ImportError as e:
        raise EarthmoverSparkError(
            f"read_sql: connection {connection.split('://')[0]!r} requires "
            f"sqlalchemy, which is not installed: {e}"
        ) from e
