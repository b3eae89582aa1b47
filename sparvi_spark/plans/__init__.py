"""Collection plans (SURVEY.md §2.A tiers)."""

from sparvi_spark.plans.collection import CollectionPlan, collect_metadata

__all__ = ["CollectionPlan", "collect_metadata"]
