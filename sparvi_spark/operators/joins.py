"""Join strategies for skewed keys (scale utilities).

AQE's skew-join splitting (on in session.py) handles most skew at runtime
for sort-merge joins. ``salted_join`` is the explicit fallback for the cases
AQE can't fix — aggregations-after-join on a hot key, or a skewed key joined
against a non-broadcastable mid-size table: the hot side's key space is
split into ``salt`` shards, the other side replicated per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt`` ways.

    ``skewed`` gets a random shard per row; ``other`` is exploded ×salt so
    every (key, shard) pair can meet. Shuffle keys become (key, shard) —
    a hot key's rows spread over ``salt`` tasks instead of one straggler.
    Cost: ``other`` is replicated ×salt, so keep salt × |other| modest
    (for larger dims prefer AQE; for small ones broadcast beats both).
    Only inner/left are salting-safe: right/full would emit one unmatched
    copy of a right row per shard.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if how in ("left_semi", "leftsemi"):
        raise ValueError("semi join does not need salting of the probe side")
    left = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def broadcast_threshold_join(
    fact: DataFrame, dim: DataFrame, on: str, how: str = "left",
    force_broadcast: bool | None = None,
) -> DataFrame:
    """Join a fact to a dim, broadcasting when the dim is plan-estimated
    small (or forced). The explicit hint keeps the plan stable when
    statistics are missing (fresh parquet without ANALYZE)."""
    if force_broadcast is None:
        # No stats? The safe default for dimension tables is to hint: AQE
        # will still demote if the build side turns out too large.
        force_broadcast = True
    d = F.broadcast(dim) if force_broadcast else dim
    return fact.join(d, on, how)
