from earthmover_spark.sources.ftp import read_ftp  # noqa: F401
from earthmover_spark.sources.readers import read_source  # noqa: F401
from earthmover_spark.sources.sql import read_sql  # noqa: F401
