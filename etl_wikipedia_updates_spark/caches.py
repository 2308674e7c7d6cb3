"""Session-scoped driver-side caches: one shared eviction policy.

Several modules memoize small driver-side artifacts per Spark session —
logical plans (plans.base), table handles (tables), fitted models
(plans.northstar, plans.clustering), built Column trees
(operators.clustering). Every cache keys entries by
``(applicationId, ...)`` and purges foreign-session entries on insert:
a stopped session's py4j handles are dead weight and error if reused
after a SparkContext restart, and one-live-session-at-a-time is the
process model here, so purge-on-insert bounds every cache at one
session's working set. The policy lives HERE so it cannot drift
between the caches.
"""

from __future__ import annotations


def purge_stale(cache: dict, app_id: str) -> None:
    """Drop every entry whose key[0] (applicationId) is not ``app_id``.

    Call right before inserting under the live session's id.
    """
    for stale in [k for k in cache if k[0] != app_id]:
        del cache[stale]
