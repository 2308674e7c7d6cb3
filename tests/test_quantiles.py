"""exact_quantiles_refined: the approx-pivot two-pass EXACT quantile
path (operators/quantiles.py) — must be bit-identical to the
registered percentiles query's rank selection at any accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.operators.quantiles import (
    exact_quantiles_refined,
)

QS = [(1, 2), (9, 10), (99, 100)]


def _reference(df, group_col, value_col, qs):
    """Independent reference: the registered percentiles plan's full
    ranking-window rank selection."""
    from pyspark.sql import Window as W

    wo = W.partitionBy(group_col).orderBy(value_col)
    wn = W.partitionBy(group_col)
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        group_col,
        value_col,
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    out = []
    for num, den in qs:
        target = F.expr(f"({num} * n + {den} - 1) div {den}")
        out.append(
            ranked.filter(F.col("rn") == target).select(
                group_col,
                F.lit(num).alias("q_num"),
                F.lit(den).alias("q_den"),
                F.col(value_col).alias("value"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def _as_set(df, group_col):
    return {
        (r[group_col], r["q_num"], r["q_den"], r["value"])
        for r in df.collect()
    }


@pytest.mark.parametrize("accuracy", [10, 10_000])
def test_refined_equals_rank_selection_on_orders(spark, accuracy):
    """On the real orders table, both SF fixtures: the refined path
    equals the full-sort rank selection exactly — including at a
    deliberately COARSE accuracy=10 (wide brackets: correctness must
    come from the rank math, not from the sketch being good)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        got = _as_set(
            exact_quantiles_refined(
                orders, "o_orderpriority", "o_totalprice", QS, accuracy
            ),
            "o_orderpriority",
        )
        want = _as_set(
            _reference(orders, "o_orderpriority", "o_totalprice", QS),
            "o_orderpriority",
        )
        assert got == want, f"{sf} accuracy={accuracy}"


def test_refined_on_adversarial_duplicates(spark):
    """Duplicates-heavy fixture: ties at every bracket edge, a
    single-value group, a group smaller than 1/q, and NULLs —
    the bracket arithmetic must hold where rank<->value is
    many-to-one."""
    rows = (
        [("a", 1.0)] * 40
        + [("a", 2.0)] * 40
        + [("a", 3.0)] * 20
        + [("b", 7.0)] * 5
        + [("c", 1.0), ("c", None)]
        + [(None, 5.0), (None, 6.0), (None, 7.0)]  # NULL group key
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = _as_set(exact_quantiles_refined(df, "g", "v", QS, 10), "g")
    want = _as_set(_reference(df, "g", "v", QS), "g")
    assert got == want
    # spot-check the duplicate semantics by hand: a has n=100,
    # p50 = value at rank 50 = 2.0 (ranks 41..80 are 2.0)
    assert ("a", 1, 2, 2.0) in got
    assert ("b", 99, 100, 7.0) in got
    assert (None, 1, 2, 6.0) in got  # NULL group ranks like any other


def test_refined_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        exact_quantiles_refined(df, "g", "v", [(0, 2)])
    with pytest.raises(ValueError):
        exact_quantiles_refined(df, "g", "v", [(3, 2)])
    with pytest.raises(ValueError):
        exact_quantiles_refined(df, "g", "v", QS, accuracy=2)
    with pytest.raises(ValueError, match="duplicate"):
        exact_quantiles_refined(df, "g", "v", [(1, 2), (1, 2)])


def test_registered_refined_equals_registered_window_plan(spark):
    """The REGISTERED pair (r18): percentiles_refined's long-format
    output must carry exactly the window plan's p50/p90/p99 per
    priority — the two registered exact-quantile plans can never
    disagree (the operator-level bit-identity pin lifted to the
    query-contract level)."""
    from etl_wikipedia_updates_spark.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    wide = {
        r["o_orderpriority"]: r
        for r in REGISTRY.queries["percentiles"].builder(spark, sf).collect()
    }
    long_rows = (
        REGISTRY.queries["percentiles_refined"].builder(spark, sf).collect()
    )
    assert len(long_rows) == 3 * len(wide)
    col = {(1, 2): "p50", (9, 10): "p90", (99, 100): "p99"}
    for r in long_rows:
        want = wide[r["o_orderpriority"]][col[(r["q_num"], r["q_den"])]]
        assert r["value"] == want, (r, want)
