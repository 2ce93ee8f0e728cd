"""Temporal operators over event tables (batch path).

The reference engine has no time-series constructs at all (grammar has
no temporal tokens — ``/root/reference/src/qp/parser/scaner.lex:37-163``);
these are north-star extensions designed for the 100 TB scale path:

- **tumbling / sliding window aggregation**: ``F.window`` — one shuffle
  on (window, keys), partial aggregation map-side.
- **sessionization** (gaps-and-islands): two window functions over one
  shuffle+sort on (key, ts); no self-join.
- **as-of join**: the classic *union trick* — tag both sides, one
  shuffle+sort on (key, ts), then ``last(..., ignorenulls)`` carries the
  most recent right-side row forward onto each left row. Strictly one
  exchange; never an inequality join (which Spark would plan as a
  broadcast nested loop).
- **range join**: inequality band-join rewritten as an equi-join on
  (key, time-bucket) — each left row explodes into the small fixed set
  of candidate buckets covering its band, so Catalyst plans a hash join
  instead of an O(n·m) nested loop. Bucket width = band width → ≤ 2
  candidate buckets per row.
- **multi-resolution rollup** (hypertable-style): aggregate once at the
  finest grain, then re-aggregate coarser levels from the finer result
  — the raw table is scanned exactly once.

All timestamp arithmetic uses integer microseconds (``unix_micros``):
exact, engine-portable, no float drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _windowed_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None,
    aggs: list[Column],
    keys: list[str] | None,
) -> DataFrame:
    w = (
        F.window(F.col(ts_col), duration, slide)
        if slide
        else F.window(F.col(ts_col), duration)
    )
    out = df.groupBy(w.alias("w"), *(keys or [])).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"), *rest
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: list[Column],
    keys: list[str] | None = None,
) -> DataFrame:
    """Fixed non-overlapping windows: (ws, we, *keys, *aggs)."""
    return _windowed_agg(df, ts_col, duration, None, aggs, keys)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows — each row lands in duration/slide windows."""
    return _windowed_agg(df, ts_col, duration, slide, aggs, keys)


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Assign a session id per (key, run of events with inter-event gap
    <= gap_seconds). Output = input + ``session_id`` (1-based per key).

    Gaps-and-islands: lag() marks session starts, a running sum numbers
    them. Both windows share one shuffle+sort on (key, ts) — Spark
    reuses the exchange. No join, no state beyond the sort buffer.
    """
    by_key = W.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_seconds * 1_000_000
    prev_us = F.lag(us).over(by_key)
    is_start = (prev_us.isNull() | (us - prev_us > gap_us)).cast("int")
    return (
        df.withColumn("_start", is_start)
        .withColumn(
            "session_id",
            F.sum("_start").over(
                by_key.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .drop("_start")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    aggs: list[Column] | None = None,
    as_micros: bool = False,
) -> DataFrame:
    """Per-session summary: (key, session_id, session_start, session_end,
    n_events, duration_s, *aggs). duration_s = whole seconds (floor).

    All session-bound arithmetic happens on integer microseconds —
    duration_s is a pure long ``DIV`` (never a double division, which
    can flip at boundaries once micros near 2^53). ``as_micros=True``
    emits the bounds as epoch-micro BIGINTs (``session_start_us`` /
    ``session_end_us``) instead of timestamps — the canonical,
    engine-portable representation (timestamp canonicalization differs
    across engines/drivers; int64 micros never do).
    """
    s = sessionize(df, key_col, ts_col, gap_seconds)
    out = s.groupBy(key_col, "session_id").agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("_start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        *(aggs or []),
    )
    out = out.withColumn("duration_s", F.expr("(_end_us - _start_us) DIV 1000000"))
    if as_micros:
        out = out.withColumnRenamed("_start_us", "session_start_us").withColumnRenamed(
            "_end_us", "session_end_us"
        )
    else:
        out = (
            out.withColumn("session_start", F.timestamp_micros(F.col("_start_us")))
            .withColumn("session_end", F.timestamp_micros(F.col("_end_us")))
            .drop("_start_us", "_end_us")
        )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the closest right row with the same
    key: ``backward`` = latest right with ``right.ts <= left.ts``;
    ``forward`` = earliest right with ``right.ts >= left.ts``.

    Union trick: tag rows, sort (key, ts, side) with right rows first on
    ties, carry right payload forward with last(ignorenulls) — the
    forward direction just reverses the sort. ONE shuffle on key + ONE
    sort — vs. the nested-loop plan Spark picks for the naive
    inequality join. Right payload columns come back prefixed
    ``asof_``; ``how='inner'`` drops left rows with no match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    payload = [c for c in right_cols if c != key_col]
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"asof_{c}") for c in payload],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(r.schema[f"asof_{c}"].dataType).alias(f"asof_{c}")
            for c in payload
        ],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # right row AT the left row's timestamp is visible to it (<= / >=);
    # forward direction scans time in reverse so "last right seen" is
    # the earliest right at-or-after the left row
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy("_k")
        .orderBy(ts_order, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # the payload is carried as ONE struct per right row, not one
    # ignorenulls-last per column: a NULL payload value on the matched
    # right row must stay NULL (per-column skipping would leak an older
    # row's value), and the struct's non-nullness doubles as the
    # matched indicator for how='inner'
    right_struct = F.when(
        F.col("_side") == 0, F.struct(*[f"asof_{c}" for c in payload])
    )
    carried = r.unionByName(l).select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.last(right_struct, ignorenulls=True).over(w).alias("_match"),
    )
    out = carried.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    return out.select(
        *lcols,
        *[F.col("_match")[f"asof_{c}"].alias(f"asof_{c}") for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    prefix: str = "r_",
) -> DataFrame:
    """Band join: pairs (l, r) with equal key and
    ``l.ts + lower < r.ts <= l.ts + upper`` (seconds).

    Rewritten as an equi-join on (key, bucket): right rows hash into
    time buckets of width = band width; each left row explodes into the
    ≤ 2 buckets its band can touch. Catalyst plans a hash or sort-merge
    join on (key, bucket); the exact band predicate filters pairs
    post-join. No nested loop at any scale; skewed keys split by AQE.
    """
    width_us = max(upper_seconds - lower_seconds, 1) * 1_000_000
    lo_us, up_us = lower_seconds * 1_000_000, upper_seconds * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # buckets are identified by their START micros via x - pmod(x, w):
    # pure long arithmetic, exact at any epoch — a double division
    # (x / w) loses integer precision once |x| nears 2^53 and pushes
    # boundary rows into the wrong bucket; pmod (not %) keeps
    # pre-epoch negatives aligned
    def bucket_start(x):
        return x - F.pmod(x, F.lit(width_us))

    r = right.select(
        F.col(key_col).alias("_rk"),
        bucket_start(r_us).alias("_rbucket"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right.columns],
    )
    l = left.withColumn(
        "_lbucket",
        F.explode(
            F.sequence(
                bucket_start(l_us + lo_us),
                bucket_start(l_us + up_us),
                F.lit(width_us),
            )
        ),
    )
    rp_us = F.unix_micros(F.col(f"{prefix}{right_ts}"))
    band = (rp_us > l_us + lo_us) & (rp_us <= l_us + up_us)
    joined = l.join(
        r,
        (F.col(key_col) == F.col("_rk")) & (F.col("_lbucket") == F.col("_rbucket")),
    ).filter(band)
    return joined.select(
        *left.columns, *[f"{prefix}{c}" for c in right.columns]
    )


def rolling_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lookback_seconds: int,
    aggs_builder,
) -> DataFrame:
    """Per-row trailing-time-window aggregates: for each event, the
    aggregation over the same key's events in
    ``(ts - lookback, ts]`` — the rolling-feature primitive
    (e.g. "requests from this user in the last hour").

    ``aggs_builder(frame)`` maps a WindowSpec to a list of (Column,
    name) pairs. One shuffle+sort on (key, ts); the RANGE frame slides
    over integer microseconds, so no self-join and no per-row scan
    repeats — Spark keeps a running frame buffer bounded by the
    lookback horizon.
    """
    us = F.unix_micros(F.col(ts_col))
    frame = (
        W.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-lookback_seconds * 1_000_000 + 1, 0)
    )
    out = df
    for col, name in aggs_builder(frame):
        out = out.withColumn(name, col)
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: (level, bucket_ts, n,
    sum_v) for every grain, each coarser level re-aggregated from the
    previous (already tiny) one.

    sum_v stays DECIMAL internally so re-aggregation is exact and
    associative (double re-summation would drift between levels);
    rounded to double only on output.
    """
    finest, coarser = levels[0], list(levels[1:])
    cur = df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("_sum"),
    )
    outs = [cur.withColumn("level", F.lit(finest))]
    for lvl in coarser:
        cur = cur.groupBy(
            F.date_trunc(lvl, F.col("bucket_ts")).alias("bucket_ts")
        ).agg(F.sum("n").alias("n"), F.sum("_sum").alias("_sum"))
        outs.append(cur.withColumn("level", F.lit(lvl)))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "level",
        "bucket_ts",
        "n",
        F.round(F.col("_sum"), 2).cast("double").alias("sum_v"),
    )


def funnel(
    events: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    tiebreak: str | None = None,
    within: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per ``key``, how far through the
    ``steps`` sequence did the user progress, matching each step to
    the EARLIEST qualifying event strictly after the previous step's
    match (the greedy matching — optimal for step-reachability by the
    classic exchange argument, which is also why the chained-min SQL
    formulation the q78 oracle uses is equivalent).

    ``within`` (epoch MICROS) adds a conversion window: steps 2..k
    must land within ``within`` of the step-1 match. The anchor stays
    the FIRST step-1 event — first-touch attribution, deterministic
    and exactly mirrored by adding ``ts <= t1 + within`` to each
    chained-min — NOT the max-stage-over-all-anchors semantics some
    engines approximate: under a window, greedy anchoring is no
    longer reachability-optimal (a later anchor could complete where
    the first can't), so the well-defined first-touch contract is
    what both formulations pin.

    ONE shuffle: groupBy(key) collects each user's (ts, type) pairs,
    ``sort_array`` orders them, and ``F.aggregate`` folds the funnel
    state machine over the array — all JVM expressions (no UDF, no
    per-user Python). Per-user event counts are session-bounded in
    practice; a pathological key would hit the same ceiling as any
    collect_list (the sessionize/SCD2 alternative below trades one
    more exchange for streaming state).

    Returns (key, stage, step1_us..stepK_us): ``stage`` = number of
    steps completed; per-step epoch-micro match timestamps (NULL once
    unreached). Ties on ``ts`` are broken by ``tiebreak`` (or event
    order is ambiguous and so is the funnel).
    """
    k = len(steps)
    order_cols = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    ev = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        *([F.col(tiebreak).alias("tb")] if tiebreak else []),
        F.col(type_col).alias("et"),
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # fold state: array of k matched timestamps (NULL = unmatched);
    # stage = count of non-nulls (always a prefix)
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step_fn(acc, e):
        # stage before this event = count of filled slots
        stage = F.size(F.filter(acc, lambda x: x.isNotNull()))
        want = F.element_at(steps_lit, stage + 1)  # next step's type
        # step 1 matches unconditionally; later steps need strictly
        # increasing timestamps. NULL-aware (stage==0 short-circuits)
        # rather than a -1 sentinel, so pre-1970 timestamps
        # (unix_micros <= -1) can still anchor step 1.
        hit = (
            (stage < k)
            & (e["et"] == want)
            & ((stage == 0) | (e["us"] > F.element_at(acc, stage)))
        )
        if within is not None:
            hit = hit & (
                (stage == 0) | (e["us"] <= F.element_at(acc, 1) + within)
            )
        return F.when(
            hit,
            F.transform(
                acc,
                lambda x, i: F.when(i == stage, e["us"]).otherwise(x),
            ),
        ).otherwise(acc)

    folded = (
        events.groupBy(key)
        .agg(F.sort_array(F.collect_list(ev)).alias("_evs"))
        .select(
            F.col(key),
            F.aggregate(F.col("_evs"), init, step_fn).alias("_m"),
        )
    )
    return folded.select(
        F.col(key),
        F.size(F.filter(F.col("_m"), lambda x: x.isNotNull())).alias("stage"),
        *[
            F.element_at(F.col("_m"), i + 1).alias(f"step{i + 1}_us")
            for i in range(k)
        ],
    )


def retention_cohorts(
    events: DataFrame,
    key: str,
    ts_col: str,
    *,
    bucket: str = "week",
) -> DataFrame:
    """Classic cohort retention: users grouped by their FIRST-activity
    bucket (the cohort), counted in every later bucket they return in.

    Two shuffles, both key-bounded: one groupBy(key) for the cohort
    assignment (first activity), one groupBy(key, bucket) distinct
    activity — then the join back on the key and the final
    (cohort, offset) count (AQE-coalesced; cohort×offset is tiny).
    Buckets are EPOCH-ALIGNED integer arithmetic, not date_trunc:
    date_trunc('week') truncates in the SESSION timezone, which would
    break the repo's environment-invariance rule (the hostile-TZ
    vanilla sweep) — epoch_us DIV step is TZ-free and identical in
    both engines; offsets are whole bucket steps (ints, never
    timestamps).

    Returns (cohort_us, offset, n_active): cohort bucket start in
    epoch micros, offset in buckets since the cohort bucket (0 =
    the cohort's own bucket, so offset 0 row is the cohort size).
    """
    step = {"week": 7 * 86400, "day": 86400}[bucket] * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    b = (us - (us % F.lit(step))).cast("long")
    per_bucket = events.select(F.col(key), b.alias("b")).distinct()
    first = per_bucket.groupBy(key).agg(F.min("b").alias("cohort_us"))
    return (
        per_bucket.join(first, on=key)
        .select(
            "cohort_us",
            ((F.col("b") - F.col("cohort_us")) / F.lit(step))
            .cast("long")
            .alias("offset"),
        )
        .groupBy("cohort_us", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
