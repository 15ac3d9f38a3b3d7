from vectorsearch_spark.sources.tables import (
    TABLE_SCHEMAS,
    load_table,
    read_events,
    read_with_schema,
)

__all__ = ["TABLE_SCHEMAS", "load_table", "read_events", "read_with_schema"]
