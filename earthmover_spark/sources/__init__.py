from earthmover_spark.sources.readers import read_source  # noqa: F401
