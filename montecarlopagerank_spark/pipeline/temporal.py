"""Temporal event analytics: sessionization, as-of join, range join.

New-engine scope (no counterpart in the 346-line reference, which is
graph-only): the driver's ``events`` table is a classic clickstream
shape (user_id, ts, event_type, value), and a transcript corpus at
10^12 turns needs exactly these three primitives to window activity —
gap sessionization for "one agent run", as-of join for "most recent
prior state at each turn", and range join for "what else happened
within W seconds".

All three are built scale-first:

- ``sessionize`` is ONE shuffle (hash by user) + a per-user window
  sort; session ids never cross partitions, so the plan is identical
  at 10 users or 10^9. Mega-user skew (bots) stays bounded by the
  per-user row count, not the table size; AQE skew-split cannot help a
  window, so pathological users should be pre-filtered by a count
  threshold (documented, not silently applied).
- ``asof_join`` is the union + last-non-null window formulation: tag
  both inputs, union, one shuffle on the key, and carry the most
  recent right-side payload forward with ``last(..., ignorenulls)``.
  No join at all — the naive ``join + filter ts<= + row_number`` shape
  explodes to |L|x|R| per key before pruning; this one is O(|L|+|R|)
  rows through a single exchange, the standard scalable as-of.
- ``range_join_count`` buckets both sides by ``floor(ts/W)`` and joins
  on (key, bucket±1): every right row lands in exactly one bucket, the
  left is replicated x3, and the equi-join co-partitions — the
  interval-bucketing trick that keeps a ±W-second join broadcast-free
  and explosion-free at any scale.

Timestamps are compared in int64 microseconds (``unix_micros``), never
in float seconds, so gap tests are exact and the DuckDB oracle twin
(``epoch_us``) hashes identically (contract.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> Column:
    """int64 microseconds since epoch; NTZ timestamps are interpreted in
    the session tz (UTC, session.py) which matches DuckDB epoch_us."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_us``.

    Returns the input plus ``us`` (int64 micros) and ``session_id``
    (1-based per user, in (ts, order_col) order). One shuffle.
    """
    w = Window.partitionBy(user_col).orderBy("us", order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    new_s = F.when(prev.isNull() | (F.col("us") - prev > gap_us), 1).otherwise(0)
    return (
        events.withColumn("us", _us(ts_col))
        .withColumn("session_id", F.sum(new_s).over(run).cast("long"))
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
    order_col: str = "event_id",
) -> DataFrame:
    """Per-session aggregates (n_events, duration_us, first event id).
    The groupBy reuses the sessionize partitioning: user_col is a prefix
    of the grouping key, so no second exchange is needed (Spark reuses
    the hash partitioning; the window sort already clustered rows)."""
    s = sessionize(
        events, user_col=user_col, ts_col=ts_col, gap_us=gap_us, order_col=order_col
    )
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.min(order_col).alias("first_event_id"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "us",
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right-side
    columns of the most recent right row with ``right.ts <= left.ts``
    (same key), or nulls if none precedes it.

    ``left`` and ``right`` must already carry an int64 ``ts`` column
    (use ``_us``/``sessionize``). Right rows must be unique per
    (on, ts) — pre-aggregate ties (e.g. keep max id) to make the match
    deterministic; duplicates raise no error but make "the" most recent
    row ambiguous.

    Implementation: tag, union, ONE shuffle on ``on``, in-partition
    sort by (ts, is_right DESC) so a right row at ts == left ts is
    visible to that left row (<= semantics), then
    ``last(struct(right_cols), ignorenulls=True)`` carried forward.
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    l_tag = left.withColumn("_r", F.lit(0)).withColumn(
        "_p", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(1).alias("_r"), payload.alias("_p")
    )
    # align columns: left keeps its payload, right contributes only key/ts/_p
    l_cols = left.columns
    r_full = r_tag.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        "_r",
        "_p",
    )
    u = l_tag.select(*l_cols, "_r", "_p").unionByName(r_full)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out = matched.filter(F.col("_r") == 0).select(
        *l_cols, *[F.col("_m")[c].alias(c) for c in right_cols]
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "us",
    window_us: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """For each left row, count right rows of the same key within
    ±window_us (excluding the identical id). Bucketed interval join:
    right rows land in ONE bucket each, left is exploded over
    {b-1, b, b+1}, the join is a plain equi-join on (key, bucket), and
    the |dt| <= W filter runs post-join on co-partitioned rows.
    """
    bkt = (F.col(ts) / F.lit(window_us)).cast("long")
    r_b = right.select(
        F.col(on), F.col(ts).alias("_rts"), F.col(right_id).alias("_rid"), bkt.alias("_b")
    )
    l_b = left.select(
        F.col(on), F.col(ts).alias("_lts"), F.col(left_id).alias("_lid"), bkt.alias("_lb")
    ).withColumn("_b", F.explode(F.array(F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1)))
    joined = l_b.join(r_b, [on, "_b"]).filter(
        (F.abs(F.col("_rts") - F.col("_lts")) <= window_us)
        & (F.col("_rid") != F.col("_lid"))
    )
    # left join back so zero-neighbor left rows keep a 0 count
    counts = joined.groupBy("_lid").agg(F.count("*").alias("n_nearby"))
    return (
        left.select(F.col(left_id).alias("_lid"))
        .join(counts, "_lid", "left")
        .select(
            F.col("_lid").alias(left_id),
            F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"),
        )
    )


def turn_latency(transcripts: DataFrame) -> DataFrame:
    """Per role-transition response-latency profile over a transcripts
    table ``(conv_id, turn_idx, role, ts)``: for every consecutive turn
    pair within a conversation, the gap in int64 microseconds, grouped
    by ``(prev_role → role)`` — "how long does the assistant take to
    answer a user turn" and its siblings, the first operational question
    asked of a transcript corpus.

    Output: ``(prev_role, role, n:long, mean_us, p50_us, p95_us)`` with
    exact interpolated percentiles (same ``percentile`` ↔
    ``quantile_cont`` identity the degree-quantiles oracle pins; at
    10^12 turns swap in ``approx_percentile`` — one pass, no per-group
    sort — exactly as documented there). Shape: one window shuffle on
    conv_id + one tiny (|roles|²-key, map-side-combined) aggregate.
    Ordering inside a conversation is ``turn_idx`` (the table's stable
    order), so gaps are deterministic even under ts ties."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = _us("ts")
    g = (
        transcripts.select(
            "conv_id",
            "role",
            F.lag("role").over(w).alias("prev_role"),
            (us - F.lag(us).over(w)).alias("gap_us"),
        )
        .filter(F.col("prev_role").isNotNull())
    )
    return g.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("gap_us"), 6).alias("mean_us"),
        F.percentile("gap_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("gap_us", F.lit(0.95)).alias("p95_us"),
    )


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile — the first table an analyst asks of a
    transcript corpus: ``(conv_id, n_turns, n_roles, n_tool_calls,
    duration_us, total_chars)``. ONE map-side-combined aggregation keyed
    by conv_id (µs-exact duration via the shared _us cast; distinct-role
    count collapses map-side because roles per conversation are tiny).

    Every column is a NON-NULL BIGINT by construction: a conversation
    whose ts (or text) rows are all NULL gets duration_us = 0 (resp.
    total_chars = 0) instead of NULL. A nullable long column round-trips
    through Arrow/pandas as float64 with NaN, which hash-canonicalizes
    differently from SQL NULL — the r03 driver hash-FAIL mode."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.count("tool").alias("n_tool_calls"),  # count skips nulls
        F.coalesce(F.max(_us("ts")) - F.min(_us("ts")), F.lit(0))
        .cast("long")
        .alias("duration_us"),
        F.coalesce(F.sum(F.length("text")), F.lit(0))
        .cast("long")
        .alias("total_chars"),
    )
