from earthmover_spark.destinations.file_destination import (  # noqa: F401
    render_lines,
    write_columnar,
    write_destination,
)
