from shifu_spark.sources.reader import (  # noqa: F401
    read_dataset,
    read_header,
    safe_double,
    write_dataset,
)
