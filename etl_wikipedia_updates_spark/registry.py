"""Global query registry — single source of truth for __spark_entry__,
tests, and bench. Import order = SURVEY.md §2.3 declaration order."""

from __future__ import annotations

from etl_wikipedia_updates_spark.plans.base import QueryRegistry
from etl_wikipedia_updates_spark.plans.clustering import CLUSTERING_QUERIES
from etl_wikipedia_updates_spark.plans.events import EVENTS_QUERIES
from etl_wikipedia_updates_spark.plans.northstar import NORTHSTAR_QUERIES
from etl_wikipedia_updates_spark.plans.relational import RELATIONAL_QUERIES
from etl_wikipedia_updates_spark.plans.wiki import WIKI_QUERIES

REGISTRY = QueryRegistry()
REGISTRY.extend(RELATIONAL_QUERIES)
REGISTRY.extend(EVENTS_QUERIES)
REGISTRY.extend(NORTHSTAR_QUERIES)
REGISTRY.extend(CLUSTERING_QUERIES)
REGISTRY.extend(WIKI_QUERIES)
