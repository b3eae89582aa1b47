"""sparvi_spark — a PySpark-native data-quality / profiling / analytics engine.

Re-implements the capabilities of the reference data-quality engine
(sparvidata/sparvi, surveyed in SURVEY.md) as idiomatic Spark DataFrame
programs, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md §7):
- One wide ``df.agg()`` pass per table for the whole profile (the reference
  batches per-type-class queries; we fuse all type classes into one scan).
- Declarative DataFrame/SQL everywhere so Catalyst does pushdown/pruning.
- ``exact=True`` (oracle mode) vs approx mode (approx_count_distinct,
  percentile_approx) for the 100 TB path.
- No driver-side collect inside operators; results stay DataFrames until the
  caller materializes a (small) result document.
"""

from sparvi_spark.session import get_spark

__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: Engine pulls in operator modules; keep bare import light.
    if name == "Engine":
        from sparvi_spark.engine import Engine

        return Engine
    raise AttributeError(name)
