"""Sources & sinks (SURVEY.md §2.F)."""

from sparvi_spark.sources.layout import (
    file_column_spans,
    write_zordered,
    zorder_key_expr,
)
from sparvi_spark.sources.readers import read_corpus, read_table
from sparvi_spark.sources.state import StateStore

__all__ = [
    "read_table", "read_corpus", "StateStore",
    "zorder_key_expr", "write_zordered", "file_column_spans",
]
