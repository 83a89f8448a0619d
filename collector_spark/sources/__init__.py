"""Sources (the reference's "inputs")."""

from collector_spark.sources.sources import (  # noqa: F401
    FileSource,
    SOURCE_REGISTRY,
    make_source,
)
