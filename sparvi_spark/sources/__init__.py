"""Sources & sinks (SURVEY.md §2.F)."""

from sparvi_spark.sources.readers import read_table
from sparvi_spark.sources.state import StateStore

__all__ = ["read_table", "StateStore"]
