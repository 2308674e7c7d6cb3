"""Exact distributed quantiles via approx-pivot refinement.

The escape hatch plans.relational.percentiles' docstring points at:
the registered exact-quantile plan sorts each group in one task
(#groups-task parallelism ceiling, spillable), and percentile_approx
is the bounded-memory 100 TB path when approximation is acceptable —
this module is the path when EXACTNESS is contractual at scale:

1. Pass 1 (one map-side-partial aggregate, full scan parallelism,
   fixed sketch memory): per group, the exact count n and a
   percentile_approx bracket [v_lo, v_hi] around each target quantile
   q, probed at q -/+ delta with delta = 2/accuracy. The sketch's rank
   error is <= n/accuracy, so v_lo's true rank < ceil(q*n) and v_hi's
   true rank > ceil(q*n): the exact rank-ceil(q*n) value provably
   lies inside the bracket.
2. Pass 2 (one broadcast join + one partial-agg shuffle + one window
   over BRACKET rows only): c_lt = exact count of values strictly
   below v_lo per (group, q), then the (target - c_lt)-th smallest
   value within the bracket — a sort window over ~(4/accuracy + 2/
   accuracy) = O(n/accuracy) rows per (group, q) partition instead of
   the whole group, with parallelism #groups x #quantiles.

accuracy is THE memory dial: the bracket holds ~6n/accuracy rows, so
choosing accuracy ~ n / rows_per_task bounds the pass-2 sort to a
task-sized slice at ANY n (e.g. n=10^12, accuracy=10^7 -> ~6x10^5-row
brackets); pass-1 sketch memory grows ~linearly with accuracy and is
per-sketch bounded. Ties caveat (r17 advice): the bracket is value-
delimited, so its true size is O(n/accuracy) PLUS the multiplicity of
values tied at the bracket edges — when v_lo == v_hi == a massively
duplicated value, the bracket spans every tied row (results stay
correct, as the duplicates fixture pins; only the task-sized bound
is distribution-dependent). A heavy-ties workload wanting the bound
back can dedupe to (value, count) rows first and select by cumulative
count. Targets are rational (num, den) pairs and ranks
use the same ceil((num*n + den - 1) div den) integer arithmetic as
the registered query, so results are bit-identical to it — since r19
by construction on ANY input: this operator always excludes NULL
values, and the registered window plan (and its oracle) filter NULLs
too (r18 advice closed; before r19 the window plan counted NULL rows
in n, so the equivalence held only on NULL-free columns). Pinned by
tests/test_quantiles.py at multiple SFs plus a duplicates-heavy
property fixture. No reference analog (the reference app has no
quantile operator); this is engine infrastructure for the exact-stats
contract at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def exact_quantiles_refined(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[tuple[int, int]],
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact discrete quantiles (value at rank ceil(q*n)) per group.

    ``qs`` are rational targets as (numerator, denominator) pairs,
    e.g. [(1, 2), (9, 10), (99, 100)]. Returns (group_col, q_num,
    q_den, value). NULL values are excluded (they are unrankable);
    a group whose values are all NULL is absent. A NULL GROUP KEY is
    a group like any other (null-safe joins throughout).
    """
    if accuracy < 4:
        raise ValueError(f"accuracy must be >= 4, got {accuracy}")
    if len(set(qs)) != len(qs):
        # a duplicated target would double its bracket rows: c_lt
        # doubles and row_number runs over duplicated rows, silently
        # selecting a wrong-rank value (r17 review)
        raise ValueError(f"duplicate quantile targets in {qs}")
    for num, den in qs:
        if not 0 < num <= den:
            raise ValueError(f"quantile {num}/{den} outside (0, 1]")
    delta = 2.0 / accuracy
    probes = sorted(
        {max(0.0, num / den - delta) for num, den in qs}
        | {min(1.0, num / den + delta) for num, den in qs}
    )
    idx = {p: i + 1 for i, p in enumerate(probes)}  # element_at is 1-based

    data = df.filter(F.col(value_col).isNotNull()).select(
        group_col, value_col
    )
    stats = data.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.percentile_approx(value_col, probes, accuracy).alias("ap"),
    )
    brackets = stats.select(
        group_col,
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(num).alias("q_num"),
                        F.lit(den).alias("q_den"),
                        F.element_at(
                            "ap", idx[max(0.0, num / den - delta)]
                        ).alias("v_lo"),
                        F.element_at(
                            "ap", idx[min(1.0, num / den + delta)]
                        ).alias("v_hi"),
                        F.expr(
                            f"CAST(({num} * n + {den} - 1) div {den} "
                            "AS BIGINT)"
                        ).alias("target"),
                    )
                    for num, den in qs
                ]
            )
        ).alias("b"),
    ).select(
        group_col,
        F.col("b.q_num").alias("q_num"),
        F.col("b.q_den").alias("q_den"),
        F.col("b.v_lo").alias("v_lo"),
        F.col("b.v_hi").alias("v_hi"),
        F.col("b.target").alias("target"),
    )

    # broadcast the (groups x quantiles)-row bracket table onto the
    # data — no shuffle of the corpus. Joins are NULL-SAFE on the
    # group key so a NULL group ranks like any other, matching the
    # rank-selection reference (r17 review: a plain key join silently
    # dropped NULL groups).
    d = data.alias("d")
    b = brackets.alias("b")
    j = d.join(
        F.broadcast(b),
        F.col(f"d.{group_col}").eqNullSafe(F.col(f"b.{group_col}")),
    ).select(
        F.col(f"b.{group_col}").alias(group_col),
        F.col(f"d.{value_col}").alias(value_col),
        "q_num",
        "q_den",
        "v_lo",
        "v_hi",
        "target",
    )
    c_lt = j.groupBy(group_col, "q_num", "q_den").agg(
        F.sum((F.col(value_col) < F.col("v_lo")).cast("long")).alias("c_lt")
    )
    bracket_rows = j.filter(
        (F.col(value_col) >= F.col("v_lo"))
        & (F.col(value_col) <= F.col("v_hi"))
    ).select(group_col, "q_num", "q_den", "target", value_col)
    r = bracket_rows.alias("r")
    c = c_lt.alias("c")
    w = W.partitionBy(group_col, "q_num", "q_den").orderBy(value_col)
    return (
        r.withColumn("rk", F.row_number().over(w))
        .join(
            F.broadcast(c),
            F.col(f"r.{group_col}").eqNullSafe(F.col(f"c.{group_col}"))
            & (F.col("r.q_num") == F.col("c.q_num"))
            & (F.col("r.q_den") == F.col("c.q_den")),
        )
        .filter(F.col("rk") == F.col("target") - F.col("c_lt"))
        .select(
            F.col(f"r.{group_col}").alias(group_col),
            F.col("r.q_num").alias("q_num"),
            F.col("r.q_den").alias("q_den"),
            F.col(f"r.{value_col}").alias("value"),
        )
    )
