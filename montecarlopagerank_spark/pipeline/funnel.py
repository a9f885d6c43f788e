"""Event funnel, retention-cohort, and transition analytics.

New-engine scope (the 346-line reference is graph-only): these are the
three standard questions asked of any event stream — "how many users
get through the steps in order" (funnel), "of the users who arrived in
period P, how many were still active k periods later" (retention), and
"what usually happens next" (transition matrix). On the transcript
corpus the same shapes answer "how many agent runs reach tool-use →
success", "how many conversations continue a week later", and "which
role usually follows which".

Scale-first construction:

- ``funnel_counts`` does ONE shuffle (groupBy user) that collects each
  step's timestamps into per-user sorted arrays, then resolves the
  greedy in-order match (t1 = min step-1 ts; t_i = min step-i ts
  >= t_{i-1}) with pure array expressions (``array_min`` +
  ``filter``) — no per-step join, no window, no Python. Array sizes
  are bounded by a single user's event count (same bound
  sessionization already accepts); a bot user with 10^6 events is a
  pre-filter problem, not a plan problem.
- ``retention_cohorts`` is groupBy(user) for the cohort anchor, one
  co-partitioned join back (both sides hashed by user), then a
  distinct + count — three exchanges total, all on bounded keys.
- ``event_transition_matrix`` is the sessionize shuffle (window by
  user ordered by ts) + a lag, then a partial-aggregable groupBy on a
  tiny (type, next_type) key space.

Timestamps are int64 microseconds throughout (``unix_micros``) so the
greedy tie cases (equal timestamps) are exact and the DuckDB twins in
contract.py hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.temporal import _us


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: for each prefix of ``steps``, the
    number of users with events matching the steps in timestamp order
    (greedy earliest match: t1 = min ts of step 1, t_i = min ts of
    step i with ts >= t_{i-1}; ties at equal ts count as in-order,
    i.e. the comparison is >=, matching a same-instant batch of
    events).

    Returns (step_idx 1-based, step, n_users), one row per step.
    ONE wide shuffle: groupBy(user) collecting one sorted ts-array per
    step, then the greedy match as array expressions.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = _us(ts_col)
    per_user = events.withColumn("_us", us).groupBy(user_col).agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col(type_col) == s, F.col("_us")))
            ).alias(f"_a{i}")
            for i, s in enumerate(steps)
        ]
    )
    # greedy in-order resolution: t0 = min(a0); t_i = min(x in a_i, x >= t_{i-1})
    t = F.array_min(F.col("_a0"))
    reached = per_user.withColumn("_t0", t)
    for i in range(1, len(steps)):
        prev = F.col(f"_t{i - 1}")
        t = F.array_min(F.filter(F.col(f"_a{i}"), lambda x: x >= prev))  # noqa: B023
        reached = reached.withColumn(f"_t{i}", F.when(prev.isNotNull(), t))
    counts = reached.agg(
        *[F.count(F.col(f"_t{i}")).alias(f"_n{i}") for i in range(len(steps))]
    )
    # one tiny row -> unpivot to (step_idx, step, n_users)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("r"))
        .select("r.step_idx", "r.step", "r.n_users")
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 604_800_000_000,  # one week
) -> DataFrame:
    """Classic retention triangle: cohort = the period of a user's first
    event (floor(us/period)); a user is retained at offset k if they
    have any event in cohort+k. Returns (cohort_period, offset,
    n_users) with distinct users per cell.

    Both the cohort anchor and the join back hash by user, so the join
    is co-partitioned; the final distinct+count is on a small
    (period, offset) key space with map-side partial aggregation.
    """
    pu = events.select(
        F.col(user_col).alias("u"), (_us(ts_col) / period_us).cast("long").alias("p")
    )
    first = pu.groupBy("u").agg(F.min("p").alias("cohort_period"))
    return (
        pu.join(first, "u")
        .select("u", "cohort_period", (F.col("p") - F.col("cohort_period")).alias("offset"))
        .distinct()
        .groupBy("cohort_period", "offset")
        .agg(F.count("*").alias("n_users"))
    )


def event_transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts: per user, order events by
    (ts, order_col) and count (event_type -> next event_type) pairs.
    Returns (from_type, to_type, n). The window shuffle is the only
    exchange; the groupBy key space is |types|^2 so the final agg is
    map-side-combined to almost nothing.
    """
    w = Window.partitionBy(user_col).orderBy(_us(ts_col), order_col)
    nxt = F.lead(type_col).over(w)
    return (
        events.withColumn("_next", nxt)
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
