"""earthmover_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of edanalytics/earthmover.

A brand-new engine, not a port: the YAML-declared DAG of sources,
transformation operations and templated destinations (reference:
earthmover/earthmover.py:158-279) is compiled into lazy Spark DataFrame
plans. Relational operations run on Catalyst/Tungsten; per-row Jinja
compute runs as Arrow-vectorized pandas UDFs with a peephole lowering
pass that turns simple templates into native Column expressions.
"""

__version__ = "0.1.0"

from earthmover_spark.session import get_spark  # noqa: F401
