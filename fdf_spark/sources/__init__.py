from fdf_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
from fdf_spark.sources.versioned import (  # noqa: F401
    commit_version,
    list_versions,
    merge_versioned,
    read_version,
    stream_merge_sink,
    vacuum,
)
