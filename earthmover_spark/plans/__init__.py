"""Project compiler + DAG executor: YAML config -> node graph -> lazy
Spark DataFrame plans -> destinations."""

from earthmover_spark.plans.config import ProjectConfig, compile_config  # noqa: F401
from earthmover_spark.plans.executor import Executor  # noqa: F401
