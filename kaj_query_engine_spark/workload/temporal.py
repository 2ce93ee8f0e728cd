"""Temporal workload over ``events`` — windowed aggregation, session
analysis, as-of / range joins, multi-resolution rollup (north-star
extensions; the reference grammar has no temporal constructs,
``/root/reference/src/qp/parser/scaner.lex:37-163``).

Oracle notes: all timestamp arithmetic is integer microseconds
(``unix_micros`` ↔ ``epoch_us``) so gap/band comparisons are exact on
both engines; double sums go through DECIMAL before rounding. The
sessionize output emits its session bounds as epoch-micro BIGINTs and
a pure-long ``DIV`` duration — raw per-row timestamps + rounded
doubles in one result proved canonicalization-sensitive in driver
environments (round-1 q72 hash mismatch with zero differing values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import temporal as T
from kaj_query_engine_spark.workload.core import DSUM_V_SQL, dsum, t
from kaj_query_engine_spark.workload.registry import register


@register(
    "q70_windows",
    "SELECT 'tumble' AS kind, "
    "epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us, "
    "epoch_us(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS we_us, "
    "event_type, count(*) AS n, "
    f"{DSUM_V_SQL} AS sum_v FROM events GROUP BY 2, 3, 4 "
    "UNION ALL "
    "SELECT 'slide', epoch_us(ws), epoch_us(ws + INTERVAL '1 hour'), "
    f"CAST(NULL AS VARCHAR), count(*), {DSUM_V_SQL} FROM ("
    "SELECT unnest([time_bucket(INTERVAL '30 minutes', ts), "
    "time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws, "
    "value FROM events) GROUP BY ws",
    "tumbling (1h, per event_type) + sliding (1h every 30min) window "
    "aggregation in one tagged result — each branch is one shuffle on "
    "(window[, key]) with map-side partial agg. Window bounds emitted "
    "as epoch-micro BIGINTs (timestamps at a result boundary are "
    "timezone-canonicalization-sensitive; int64 micros never are)",
)
def q70(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    tumble = T.tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        [F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_v")],
        keys=["event_type"],
    ).select(
        F.unix_micros("ws").alias("ws_us"),
        F.unix_micros("we").alias("we_us"),
        "event_type",
        "n",
        "sum_v",
    )
    slide = T.sliding_window_agg(
        e,
        "ts",
        "1 hour",
        "30 minutes",
        [F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_v")],
    ).select(
        F.unix_micros("ws").alias("ws_us"),
        F.unix_micros("we").alias("we_us"),
        F.lit(None).cast("string").alias("event_type"),
        "n",
        "sum_v",
    )
    return tumble.withColumn("kind", F.lit("tumble")).unionByName(
        slide.withColumn("kind", F.lit("slide"))
    )


@register(
    "q72_sessionize",
    "WITH s AS (SELECT user_id, ts, value, CASE WHEN "
    "lag(epoch_us(ts)) OVER w IS NULL OR "
    "epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
    "THEN 1 ELSE 0 END AS st FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    # CAST: DuckDB widens window sums to HUGEINT → float64 in a pandas
    # canon, which hash-mismatches Spark's long
    "g AS (SELECT *, CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s) "
    "SELECT user_id, session_id, "
    "epoch_us(min(ts)) AS session_start_us, "
    "epoch_us(max(ts)) AS session_end_us, count(*) AS n_events, "
    "(epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s, "
    f"{DSUM_V_SQL} AS sum_v "
    "FROM g GROUP BY user_id, session_id",
    "sessionization (30-min gap) + per-session stats — gaps-and-islands "
    "over ONE shuffle+sort on (user, ts), no self-join; bounds emitted "
    "as epoch-micro BIGINTs, duration via pure long DIV",
)
def q72(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    out = T.session_stats(
        e,
        "user_id",
        "ts",
        1800,
        aggs=[dsum(F.col("value")).alias("sum_v")],
        as_micros=True,
    )
    return out.select(
        "user_id",
        "session_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        "duration_s",
        "sum_v",
    )


@register(
    "q73_asof_join",
    "SELECT 'backward' AS dir, c.event_id AS click_id, c.user_id, "
    "epoch_us(c.ts) AS ts_us, "
    "v.event_id AS match_id, epoch_us(v.ts) AS match_ts_us "
    "FROM (SELECT * FROM events WHERE event_type = 'click') c "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v "
    "ON c.user_id = v.user_id AND v.ts <= c.ts "
    "UNION ALL "
    "SELECT 'forward', c.event_id, c.user_id, epoch_us(c.ts), "
    "v.event_id, epoch_us(v.ts) "
    "FROM (SELECT * FROM events WHERE event_type = 'click') c "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') v "
    "ON c.user_id = v.user_id AND v.ts >= c.ts",
    "as-of join, both directions: each click ← latest prior view AND "
    "→ earliest subsequent error by the same user. Union-trick "
    "implementation: ONE shuffle on user_id + one sort per direction, "
    "vs. the nested-loop plan a naive inequality join gets",
)
def q73(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )

    def side(right_type: str, direction: str):
        right = e.filter(F.col("event_type") == right_type)
        out = T.asof_join(
            clicks, right, "user_id", "ts", "ts", ["event_id", "ts"],
            direction=direction,
        )
        return out.select(
            F.lit(direction).alias("dir"),
            F.col("event_id").alias("click_id"),
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("asof_event_id").alias("match_id"),
            F.unix_micros("asof_ts").alias("match_ts_us"),
        )

    return side("view", "backward").unionByName(side("error", "forward"))


@register(
    "q74_range_join",
    "SELECT e.event_id AS err_id, e.user_id, epoch_us(e.ts) AS err_ts_us, "
    "c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us "
    "FROM events e JOIN events c "
    "ON e.user_id = c.user_id "
    "AND epoch_us(c.ts) > epoch_us(e.ts) "
    "AND epoch_us(c.ts) <= epoch_us(e.ts) + 600000000 "
    "WHERE e.event_type = 'error' AND c.event_type = 'click'",
    "range (band) join: clicks within 10 min after an error by the same "
    "user — bucketized to an equi-join on (user, time-bucket), never a "
    "nested loop",
)
def q74(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = T.range_join(errors, clicks, "user_id", "ts", "ts", 0, 600)
    return out.select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.unix_micros("ts").alias("err_ts_us"),
        F.col("r_event_id").alias("click_id"),
        F.unix_micros("r_ts").alias("click_ts_us"),
    )


@register(
    "q77_rolling_window",
    "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
    "count(*) OVER w AS n_1h, "
    "CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) "
    "AS sum_1h FROM events WINDOW w AS ("
    "PARTITION BY user_id ORDER BY epoch_us(ts) "
    "RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)",
    "per-event trailing 1-hour rolling features (count + sum over the "
    "same user's last hour): RANGE frame over integer micros — one "
    "shuffle+sort, no self-join, frame buffer bounded by the lookback",
)
def q77(spark, sf_dir):
    e = t(spark, sf_dir, "events")

    def aggs(frame):
        return [
            (F.count(F.lit(1)).over(frame).alias("n_1h"), "n_1h"),
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).over(frame), 2
                )
                .cast("double")
                .alias("sum_1h"),
                "sum_1h",
            ),
        ]

    out = T.rolling_window(e, "user_id", "ts", 3600, aggs)
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "n_1h",
        "sum_1h",
    )


@register(
    "q76_json_props",
    "SELECT event_type, count(*) AS n, "
    "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) "
    "AS k_sum, max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max "
    "FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 "
    "GROUP BY event_type",
    "semi-structured JSON property column: extract → filter → "
    "aggregate (get_json_object, JVM-side, no UDF)",
)
def q76(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "q75_time_rollup",
    "SELECT 'minute' AS level, epoch_us(date_trunc('minute', ts)) AS bucket_us, "
    "count(*) AS n, "
    "CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_v "
    "FROM events GROUP BY 2 "
    "UNION ALL SELECT 'hour', epoch_us(date_trunc('hour', ts)), count(*), "
    "CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) "
    "FROM events GROUP BY 2 "
    "UNION ALL SELECT 'day', epoch_us(date_trunc('day', ts)), count(*), "
    "CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) "
    "FROM events GROUP BY 2",
    "hypertable-style multi-resolution rollup (minute→hour→day): raw "
    "table scanned once, coarser grains re-aggregated from finer "
    "(exact DECIMAL re-summation); buckets emitted as epoch-micro "
    "BIGINTs",
)
def q75(spark, sf_dir):
    out = T.time_rollup(t(spark, sf_dir, "events"), "ts", "value")
    return out.select(
        "level", F.unix_micros("bucket_ts").alias("bucket_us"), "n", "sum_v"
    )


_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]

_WIN48H_US = 48 * 3600 * 1_000_000


def _funnel_ctes(suffix: str, extra: str) -> str:
    """One chained-min CTE pyramid; ``extra`` appends the conversion
    window conjunct (first-touch anchor: bounds vs s1's t1)."""
    z = suffix
    return (
        f"s1{z} AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events "
        "WHERE event_type = 'signup' GROUP BY 1), "
        f"s2{z} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e "
        f"JOIN s1{z} s1 ON e.user_id = s1.user_id "
        f"WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t1{extra} GROUP BY 1), "
        f"s3{z} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e "
        f"JOIN s2{z} s2 ON e.user_id = s2.user_id "
        f"JOIN s1{z} s1 ON e.user_id = s1.user_id "
        f"WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t2{extra} GROUP BY 1), "
        f"s4{z} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t4 FROM events e "
        f"JOIN s3{z} s3 ON e.user_id = s3.user_id "
        f"JOIN s1{z} s1 ON e.user_id = s1.user_id "
        f"WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s3.t3{extra} GROUP BY 1)"
    )


def _funnel_select(path: str, suffix: str) -> str:
    z = suffix
    return (
        f"SELECT '{path}' AS path, b.user_id, "
        "CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3 "
        "WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 "
        "ELSE 0 END AS stage, "
        "t1 AS step1_us, t2 AS step2_us, t3 AS step3_us, t4 AS step4_us "
        f"FROM base b LEFT JOIN s1{z} ON b.user_id = s1{z}.user_id "
        f"LEFT JOIN s2{z} ON b.user_id = s2{z}.user_id "
        f"LEFT JOIN s3{z} ON b.user_id = s3{z}.user_id "
        f"LEFT JOIN s4{z} ON b.user_id = s4{z}.user_id"
    )


_FUNNEL_ORACLE = (
    # chained-min formulation — INDEPENDENT of the Spark side's
    # single-pass sorted fold; greedy earliest-match makes the two
    # provably equivalent on the unwindowed branch (exchange
    # argument), and the windowed branch pins the FIRST-TOUCH
    # contract (anchor = first step-1, every later step bounded by
    # t1 + window) in both formulations
    "WITH base AS (SELECT DISTINCT user_id FROM events), "
    + _funnel_ctes("a", "")
    + ", "
    + _funnel_ctes(
        "w", f" AND epoch_us(e.ts) <= s1.t1 + {_WIN48H_US}"
    )
    + " "
    + _funnel_select("any", "a")
    + " UNION ALL "
    + _funnel_select("win48h", "w")
)


@register(
    "q78_funnel",
    _FUNNEL_ORACLE,
    "ordered funnel (signup -> view -> click -> purchase), two tagged "
    "branches: 'any' = unbounded greedy matching (earliest qualifying "
    "event strictly after the previous match), 'win48h' = a 48-hour "
    "conversion window under FIRST-TOUCH attribution (anchor = first "
    "signup; every later step bounded by t1 + window — the "
    "deterministic contract both formulations can pin, vs the "
    "max-over-anchors semantics greedy can't serve under a window). "
    "ONE shuffle per branch: groupBy(user) + sort_array + an "
    "F.aggregate fold — all JVM, no UDF, no joins; the oracle is the "
    "independent chained-min SQL formulation",
)
def q78(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    any_f = T.funnel(
        e, "user_id", "ts", "event_type", _FUNNEL_STEPS, tiebreak="event_id"
    )
    win = T.funnel(
        e,
        "user_id",
        "ts",
        "event_type",
        _FUNNEL_STEPS,
        tiebreak="event_id",
        within=_WIN48H_US,
    )
    return any_f.select(F.lit("any").alias("path"), "*").unionAll(
        win.select(F.lit("win48h").alias("path"), "*")
    )


_WEEK_US = 7 * 86400 * 1_000_000

_RETENTION_ORACLE = (
    "WITH pb AS (SELECT DISTINCT user_id, "
    f"epoch_us(ts) - (epoch_us(ts) % {_WEEK_US}) AS b FROM events), "
    "f AS (SELECT user_id, min(b) AS cohort_us FROM pb GROUP BY 1) "
    "SELECT cohort_us, "
    f"CAST((b - cohort_us) / {_WEEK_US} AS BIGINT) AS \"offset\", "
    "count(*) AS n_active "
    "FROM pb JOIN f USING (user_id) GROUP BY 1, 2"
)


@register(
    "q79_retention_cohorts",
    _RETENTION_ORACLE,
    "weekly cohort retention: users grouped by first-activity week, "
    "counted in each later week they return (offset 0 = cohort "
    "size). Epoch-aligned integer week buckets — date_trunc('week') "
    "would truncate in the session TZ and break the hostile-TZ "
    "vanilla sweep. Two key-bounded shuffles + one AQE-coalesced "
    "tiny aggregate",
)
def q79(spark, sf_dir):
    return T.retention_cohorts(
        t(spark, sf_dir, "events"), "user_id", "ts", bucket="week"
    )
