"""Scalar-function layer: Jinja row-compute (with native lowering),
pandas-query -> Spark SQL translation, strftime -> Spark pattern
translation."""
