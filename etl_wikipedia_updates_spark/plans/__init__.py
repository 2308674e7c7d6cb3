"""Declared query plans (the SURVEY.md §2.3 contract) + registry."""

from etl_wikipedia_updates_spark.plans.base import DeclaredQuery, QueryRegistry

__all__ = ["DeclaredQuery", "QueryRegistry"]
