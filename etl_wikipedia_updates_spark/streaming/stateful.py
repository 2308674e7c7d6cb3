"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the escape hatch for stateful semantics the built-in operators
(windowed aggs, ``session_window``, ``dropDuplicatesWithinWatermark``)
can't express: user code holds an explicit per-key state value across
micro-batches, Arrow-batched per group. The reference has exactly one
stateful behavior — the cumulative row count its dashboard polls
(/root/reference/dashboard.py:37-49, delta per poll) — which the
built-in aggregates already cover (streaming/ingest.py); the operator
here shows the general mechanism with a running per-key counter +
threshold alarm.

Scale: state lives in the executor state store partitioned by key —
the same bounded-state story as every streaming agg (one shuffle on
the key; state size = one tuple per live key). Use a watermark +
timeout to expire idle keys; here keys are users, state is 16 bytes.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(
    stream: DataFrame,
    key: str = "user_id",
    alarm_threshold: int | None = None,
) -> DataFrame:
    """Per-key running event count across micro-batches.

    Emits one row per (key, micro-batch-with-activity): the cumulative
    count so far and whether it just crossed ``alarm_threshold``. The
    final row per key therefore carries the total — equal to the batch
    ``groupBy(key).count()`` (asserted in tests/test_streaming.py).
    """

    def fn(
        key_tuple: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        prev = state.get[0] if state.exists else 0
        seen = prev + sum(len(p) for p in pdfs)
        state.update((seen,))
        crossed = (
            alarm_threshold is not None
            and prev < alarm_threshold <= seen
        )
        yield pd.DataFrame(
            {key: [key_tuple[0]], "cnt": [seen], "alarm": [bool(crossed)]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} long, cnt long, alarm boolean",
        stateStructType="cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
