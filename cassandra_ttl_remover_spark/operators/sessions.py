"""Sessionization — gap-based event grouping (standard-taxonomy addition,
SURVEY.md §2.2): split each user's event stream into sessions wherever the
inter-event gap exceeds a threshold, the batch analog of the streaming
session window (streaming/ttl_stream.py handles the streaming side via
watermarked windows). For a training-data pipeline this is the "chat log ->
conversation" grouping step.

Spark-first shape: one window (PARTITION BY user ORDER BY ts) carrying a
lag-diff flag and its running sum — a single hash shuffle on the user key,
no joins, no iteration. Skew caveat: one user's full history lands in one
task (inherent to per-user ordering; the same caveat as asof_join — salt by
time-bucket first if a single entity exceeds task memory).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: ANSI-safe µs extraction from the scan layer's timestamp_ntz.
_US = "unix_micros(cast({c} as timestamp))"


def sessionize(events: DataFrame, gap_seconds: int, *,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Assign ``(user_col, session_seq)`` to every event: ``session_seq``
    starts at 0 per user and increments whenever the gap since the user's
    previous event exceeds ``gap_seconds``. Deterministic (ties broken by
    ``id_col``) and engine-portable — exact integer µs arithmetic.

    Returns ``(id_col, user_col, ts_us, session_seq)``."""
    gap_us = int(gap_seconds) * 1_000_000
    ev = events.select(
        F.col(id_col),
        F.col(user_col),
        F.expr(_US.format(c=ts_col)).alias("ts_us"),
    )
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    new_sess = (
        F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(gap_us)
    ).cast("long")
    run = Window.partitionBy(user_col).orderBy("ts_us", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.withColumn("_new", F.coalesce(new_sess, F.lit(0))).select(
        id_col,
        user_col,
        "ts_us",
        F.sum("_new").over(run).alias("session_seq"),
    )


def session_stats(events: DataFrame, gap_seconds: int, *,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Per-session rollup: event count, span in µs. The sessionize window
    and this groupBy share the same user-key partitioning, so the
    aggregation reuses the window's shuffle (one exchange total)."""
    s = sessionize(events, gap_seconds, user_col=user_col, ts_col=ts_col,
                   id_col=id_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
        )
    )


def sessionize_oracle_sql(gap_seconds: int, *, table: str = "events",
                          user_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id") -> str:
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH e AS (
  SELECT {id_col}, {user_col}, epoch_us({ts_col}) AS ts_us FROM {table}
),
f AS (
  SELECT {id_col}, {user_col}, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY {user_col} ORDER BY ts_us, {id_col})
)
SELECT {id_col}, {user_col}, ts_us,
       CAST(sum(new_sess) OVER (PARTITION BY {user_col} ORDER BY ts_us, {id_col}
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM f ORDER BY {id_col}
"""


def session_stats_oracle_sql(gap_seconds: int, *, table: str = "events",
                             user_col: str = "user_id", ts_col: str = "ts",
                             id_col: str = "event_id") -> str:
    inner = sessionize_oracle_sql(gap_seconds, table=table, user_col=user_col,
                                  ts_col=ts_col, id_col=id_col)
    return f"""
SELECT {user_col}, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us
FROM ({inner})
GROUP BY {user_col}, session_seq
ORDER BY {user_col}, session_seq
"""


#: token delimiter for funnel matching: the ASCII unit separator — a
#: control character no sane event-type vocabulary contains, so neither
#: step names nor DATA values can forge a token boundary (a ',' delimiter
#: was forgeable by any event type containing a comma).
FUNNEL_DELIM = "\x1f"


def _funnel_like_pattern(steps: list[str]) -> str:
    """LIKE pattern for an ordered-funnel subsequence test over a
    per-token-delimited sequence (each event type wrapped <US>type<US>).
    LIKE metacharacters ('%', '_') inside step names are escaped with '!'
    (both Spark and DuckDB accept ``LIKE ... ESCAPE '!'``)."""
    esc = [
        s.replace("!", "!!").replace("%", "!%").replace("_", "!_")
        for s in steps
    ]
    d = FUNNEL_DELIM
    return "%" + "%".join(f"{d}{s}{d}" for s in esc) + "%"


def funnel_flags(events: DataFrame, steps: list[str], *,
                 user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel detection per user: did the user's event history
    contain ``steps`` as a (non-contiguous) subsequence in time order —
    view → click → purchase and friends, the standard product-analytics
    question. Returns ``(user_col, n_events, sequence, reached)``.

    Construction: one aggregation per user collecting (ts, id, type)
    structs, array_sort (unique (ts,id) prefix -> deterministic total
    order), project the type sequence to a delimited string, and test the
    subsequence with one LIKE over a DELIMITED-TOKEN form: every event type
    is wrapped ',type,' on both sides, and the pattern is
    '%,step1,%,step2,%...'. Whole-token matching means an unrelated event
    type containing a step as a substring ('preview' vs 'view') can never
    false-positive, and per-token wrapping (rather than one shared
    delimiter) keeps adjacent steps from competing for the same comma.
    LIKE metacharacters inside step names ('_' is common in event types)
    are neutralized via an explicit ESCAPE character, identically in both
    engines. Everything is engine-portable string logic, so the DuckDB
    oracle (string_agg ORDER BY) hash-matches.

    Scale: ONE shuffle keyed by user (map-side partial collect); per-user
    state is that user's event types — the same per-entity bound as
    sessionize, with the same salt-by-time-bucket escape hatch if a single
    entity outgrows a task."""
    for s in steps:
        if FUNNEL_DELIM in s:
            raise ValueError(
                f"step {s!r} contains the token delimiter U+001F; "
                "matching would be ambiguous"
            )
    us = _US.format(c=ts_col)
    sorted_types = (
        "transform(array_sort(collect_list(struct("
        f"{us} as t, {id_col} as i, {type_col} as y))), s -> s.y)"
    )
    seq = f"array_join({sorted_types}, ',')"
    # each token delimited on BOTH sides with the unit separator, so the
    # LIKE pattern's <US>step<US> fragments match whole tokens only and no
    # data value can forge a boundary (the display `sequence` stays
    # comma-joined for readability — it is not the matching surface)
    d = FUNNEL_DELIM
    wrapped = (
        f"array_join(transform({sorted_types},"
        f" y -> concat('{d}', y, '{d}')), '')"
    )
    pat = _funnel_like_pattern(steps).replace("'", "''")
    return (
        events.groupBy(user_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr(seq).alias("sequence"),
            F.expr(f"({wrapped}) LIKE '{pat}' ESCAPE '!'").alias("reached"),
        )
    )


def funnel_oracle_sql(steps: list[str], *, table: str = "events",
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      type_col: str = "event_type") -> str:
    # identical delimited-token + ESCAPE semantics to funnel_flags
    d = FUNNEL_DELIM
    pat = _funnel_like_pattern(steps).replace("'", "''")
    return f"""
SELECT {user_col}, count(*)::BIGINT AS n_events,
       string_agg({type_col}, ',' ORDER BY {ts_col}, {id_col}) AS sequence,
       string_agg('{d}' || {type_col} || '{d}', '' ORDER BY {ts_col}, {id_col})
         LIKE '{pat}' ESCAPE '!' AS reached
FROM {table} GROUP BY {user_col} ORDER BY {user_col}
"""


def transition_matrix(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition counts of the per-user event
    sequence: ``(prev_type, next_type, n)`` over consecutive events in
    ``(ts_col, id_col)`` order — the journey model a funnel is a special
    case of (its probabilities are one projection away: n / sum(n) over
    prev_type).

    Scale: same single exchange as sessionize — the lag window partitions
    by user and sorts each user's history in one task (per-entity bound;
    salting escape hatch applies to the same hot-user hazard) — then a
    map-side-combinable count on a |types|² key space.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    return (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count("*").alias("n"))
    )


def transition_matrix_oracle_sql(*, table: str = "events",
                                 user_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 id_col: str = "event_id") -> str:
    return f"""
WITH seq AS (
  SELECT {user_col},
         lag({type_col}) OVER (PARTITION BY {user_col}
                               ORDER BY {ts_col}, {id_col}) AS prev_type,
         {type_col} AS next_type
  FROM {table}
)
SELECT prev_type, next_type, count(*)::BIGINT AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
"""


def peak_concurrency(events: DataFrame, gap_seconds: int, *,
                     user_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     two_level: bool = True) -> DataFrame:
    """Sweep-line maximum concurrency over the gap-split sessions: how
    many sessions are simultaneously open at the busiest instant (the
    capacity-planning number), with the first time it is reached.
    Sessions are CLOSED intervals [start, end] — at an instant where one
    session ends and another starts both count, so +1 deltas order
    before -1 at equal times; single-event sessions contribute 1 at
    their instant. All arithmetic is exact integer µs.

    Returns one row: ``(n_sessions, peak_concurrency, first_peak_ts_us)``.

    Scale: the sweep runs over SESSION endpoints (2 per session — far
    smaller than the event stream that produced them). The DEFAULT form
    is the 100 TB path via :func:`plans.two_level_cumsum` —
    range-sharded parallel scans seeded by a driver prefix over shard
    totals; ``two_level=False`` keeps the single-partition window form
    as the verification surface the property test compares against."""
    s = sessionize(events, gap_seconds, user_col=user_col, ts_col=ts_col,
                   id_col=id_col)
    spans = s.groupBy(user_col, "session_seq").agg(
        F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us")
    )
    deltas = spans.select(
        F.explode(
            F.expr("array(struct(start_us as t, 1L as d),"
                   " struct(end_us as t, -1L as d))")
        ).alias("e")
    ).select("e.t", "e.d")
    if two_level:
        # shard-parallel scan: (t asc, d desc) expressed as the all-asc
        # key (t, -d); ties within (t, d) carry equal deltas, so the
        # two-level result matches the single window exactly
        from cassandra_ttl_remover_spark.plans import two_level_cumsum

        swept = two_level_cumsum(
            deltas.withColumn("_negd", -F.col("d")),
            ["t", "_negd"], "d", out="conc",
        ).drop("_negd")
    else:
        run = Window.orderBy(F.col("t").asc(), F.col("d").desc())             .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        swept = deltas.withColumn("conc", F.sum("d").over(run))
    peak = swept.agg(F.max("conc").alias("peak"))
    return (
        swept.join(F.broadcast(peak))
        .filter(F.col("conc") == F.col("peak"))
        .agg(
            F.expr("cast(count(*) as bigint)").alias("_n_at_peak"),
            F.min("t").alias("first_peak_ts_us"),
            F.max("peak").alias("peak_concurrency"),
        )
        .crossJoin(spans.agg(F.count("*").cast("long").alias("n_sessions")))
        .select("n_sessions", "peak_concurrency", "first_peak_ts_us")
    )


def peak_concurrency_oracle_sql(gap_seconds: int, *, table: str = "events",
                                user_col: str = "user_id",
                                ts_col: str = "ts",
                                id_col: str = "event_id") -> str:
    """Same sweep in DuckDB over the shared sessionize CTE."""
    inner = sessionize_oracle_sql(
        gap_seconds, table=table, user_col=user_col, ts_col=ts_col,
        id_col=id_col,
    ).strip().rstrip(";")
    return f"""
WITH sess AS ({inner}),
spans AS (
  SELECT {user_col}, session_seq,
         min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM sess GROUP BY {user_col}, session_seq
),
deltas AS (
  SELECT start_us AS t, 1::BIGINT AS d FROM spans
  UNION ALL
  SELECT end_us AS t, -1::BIGINT AS d FROM spans
),
swept AS (
  SELECT t, d,
         sum(d) OVER (ORDER BY t ASC, d DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM deltas
)
SELECT (SELECT count(*)::BIGINT FROM spans) AS n_sessions,
       (SELECT max(conc)::BIGINT FROM swept) AS peak_concurrency,
       (SELECT min(t)::BIGINT FROM swept
        WHERE conc = (SELECT max(conc) FROM swept)) AS first_peak_ts_us
"""


def scd2_build(events: DataFrame, *, key_col: str = "user_id",
               attr_col: str = "event_type", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Build a Type-2 slowly-changing dimension from an event stream: per
    ``key_col``, collapse consecutive repeats of ``attr_col`` into
    versioned validity intervals ``(key, attr, valid_from_us, valid_to_us,
    is_current, version)`` — the warehouse "change capture -> versioned
    dimension" step (each row answers "what was this entity's attribute
    between from and to?"; the open interval is the current version).

    Deterministic: events ordered by (ts, id); a change row is one whose
    attr differs from the previous event's attr (lag); ``valid_to_us`` is
    the NEXT change's start (lead over change rows only), NULL while
    current; ``version`` numbers changes per key from 1.

    Scale shape: exactly TWO window passes over ONE hash exchange on the
    key (lag to flag changes, lead/row_number over the filtered change
    rows reuse the same partitioning — Spark plans a single Exchange
    because both windows share partition keys). Per-entity history sits
    in one task: the sessionize skew caveat applies (salt by time bucket
    if one entity's history exceeds task memory)."""
    ev = events.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.expr(_US.format(c=ts_col)).alias("ts_us"),
        F.col(id_col).alias("_tie"),
    )
    w = Window.partitionBy(key_col).orderBy("ts_us", "_tie")
    changes = (
        ev.withColumn("_prev", F.lag("attr").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("attr")))
    )
    w2 = Window.partitionBy(key_col).orderBy("ts_us", "_tie")
    return (
        changes.select(
            F.col(key_col),
            F.col("attr"),
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w2).alias("valid_to_us"),
            F.lead("ts_us").over(w2).isNull().alias("is_current"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .orderBy(key_col, "version")
    )


def scd2_build_oracle_sql(table: str = "events", *, key_col: str = "user_id",
                          attr_col: str = "event_type", ts_col: str = "ts",
                          id_col: str = "event_id") -> str:
    return f"""
WITH ev AS (
  SELECT {key_col}, {attr_col} AS attr,
         epoch_us({ts_col}) AS ts_us, {id_col} AS tie
  FROM {table}
), flagged AS (
  SELECT *, lag(attr) OVER
           (PARTITION BY {key_col} ORDER BY ts_us, tie) AS prev
  FROM ev
), changes AS (
  SELECT * FROM flagged WHERE prev IS NULL OR prev <> attr
)
SELECT {key_col}, attr,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w AS valid_to_us,
       (lead(ts_us) OVER w) IS NULL AS is_current,
       row_number() OVER w AS version
FROM changes
WINDOW w AS (PARTITION BY {key_col} ORDER BY ts_us, tie)
ORDER BY {key_col}, version
"""


def last_touch_attribution(events: DataFrame,
                           touch_kind: str = "click",
                           convert_kind: str = "purchase",
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           id_col: str = "event_id") -> DataFrame:
    """Last-touch conversion attribution: each ``convert_kind`` event is
    credited to the user's most recent PRECEDING ``touch_kind`` event
    (ties at the same microsecond order the touch first — a click at the
    purchase instant still gets credit; same-instant events break ties
    by id). Conversions with no prior touch keep a NULL touch id — the
    unattributed remainder every attribution report must surface, not
    drop. Returns ``(user_id, convert_id, convert_ts_us, touch_id,
    lag_us)`` ordered by convert_id.

    Implementation: one carry-forward window (``last(..., ignorenulls)``
    over rows-unbounded-preceding) — the as-of-join semantics without
    materializing a join. Scale: ONE key exchange on ``user_col``; both
    carried columns share the single window; no self-join, no skew
    beyond the user key itself."""
    ts_us = f"unix_micros(cast({ts_col} as timestamp))"
    base = (
        events.filter(
            F.col("event_type").isin([touch_kind, convert_kind]))
        .select(
            F.col(user_col), F.col(id_col), F.col("event_type"),
            F.expr(ts_us).cast("long").alias("_ts_us"),
        )
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(
            F.col("_ts_us"),
            (F.col("event_type") == convert_kind).cast("int"),
            F.col(id_col),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type") == touch_kind
    carried = base.select(
        user_col, id_col, "event_type", "_ts_us",
        F.last(F.when(is_touch, F.col(id_col)), ignorenulls=True)
        .over(w).alias("touch_id"),
        F.last(F.when(is_touch, F.col("_ts_us")), ignorenulls=True)
        .over(w).alias("_touch_ts"),
    )
    return (
        carried.filter(F.col("event_type") == convert_kind)
        .select(
            user_col,
            F.col(id_col).alias("convert_id"),
            F.col("_ts_us").alias("convert_ts_us"),
            "touch_id",
            (F.col("_ts_us") - F.col("_touch_ts")).alias("lag_us"),
        )
        .orderBy("convert_id")
    )


def last_touch_attribution_oracle_sql(touch_kind: str = "click",
                                      convert_kind: str = "purchase",
                                      table: str = "events") -> str:
    """DuckDB mirror: identical tie-breaking order and carry-forward
    frame via last_value IGNORE NULLS."""
    return f"""
WITH base AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts)::BIGINT AS ts_us
  FROM {table}
  WHERE event_type IN ('{touch_kind}', '{convert_kind}')
),
carried AS (
  SELECT user_id, event_id, event_type, ts_us,
         last_value(CASE WHEN event_type = '{touch_kind}'
                         THEN event_id END IGNORE NULLS) OVER w AS touch_id,
         last_value(CASE WHEN event_type = '{touch_kind}'
                         THEN ts_us END IGNORE NULLS) OVER w AS touch_ts
  FROM base
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts_us,
                        (event_type = '{convert_kind}')::INT,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS convert_id, ts_us AS convert_ts_us,
       touch_id, (ts_us - touch_ts)::BIGINT AS lag_us
FROM carried
WHERE event_type = '{convert_kind}'
ORDER BY convert_id
"""


def hazard_table(events: DataFrame, conv_type: str = "purchase", *,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Discrete-time hazard table (the Kaplan–Meier life table's exact
    integer core): for each day k since a user's FIRST event, how many
    users were still at risk (observed through day k, not yet
    converted) and how many converted exactly then. The survival curve
    is the running product of (1 - hazard) — left to the caller because
    a float product chain is not hash-stable; the (n_at_risk,
    n_converted) integers ARE, and hazard is ONE IEEE division.

    Semantics: t0 = first event date per user; conversion day =
    datediff(first ``conv_type`` date, t0); administrative censoring at
    the global max event date (every user is observed through it). A
    user is at risk on days 0..conv_k (inclusive — they convert ON a
    day they were at risk) or 0..followup when never converting.

    Scale shape: one groupBy(user) aggregation reduces the corpus to a
    per-user pair; the day explode is bounded by the OBSERVATION WINDOW
    (days, not rows — 365 rows/user at a year of grain); two small
    keyed counts and a day-keyed join finish. Returns
    ``(k, n_at_risk, n_converted, hazard)`` ordered by k."""
    d = f"cast({ts_col} as date)"
    per_user = events.groupBy(user_col).agg(
        F.expr(f"min({d})").alias("t0"),
        F.expr(
            f"min(case when {type_col} = '{conv_type}' then {d} end)"
        ).alias("cd"),
    )
    cutoff = F.broadcast(events.agg(F.expr(f"max({d})").alias("cmax")))
    u = per_user.crossJoin(cutoff).select(
        F.expr("datediff(cmax, t0)").cast("long").alias("followup"),
        F.expr("datediff(cd, t0)").cast("long").alias("conv_k"),
    )
    risk = (
        u.select(
            F.explode(
                F.expr("sequence(0, coalesce(conv_k, followup))")
            ).alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_at_risk"))
    )
    conv = (
        u.filter("conv_k IS NOT NULL")
        .groupBy(F.col("conv_k").alias("k"))
        .agg(F.count("*").cast("long").alias("n_converted"))
    )
    return (
        risk.join(conv, "k", "left")
        .select(
            F.col("k").cast("long").alias("k"),
            "n_at_risk",
            F.coalesce("n_converted", F.lit(0)).cast("long")
            .alias("n_converted"),
            F.expr(
                "case when n_at_risk = 0 then cast(0.0 as double) else "
                "cast(coalesce(n_converted, 0) as double)"
                " / cast(n_at_risk as double) end"
            ).alias("hazard"),
        )
        .orderBy("k")
    )


def hazard_table_oracle_sql(conv_type: str = "purchase", *,
                            table: str = "events",
                            user_col: str = "user_id") -> str:
    """DuckDB mirror: same per-user reduction, same bounded day
    unnest, counts ::BIGINT past the pandas bridge."""
    return f"""
WITH per_user AS (
  SELECT {user_col},
         min(ts::DATE) AS t0,
         min(CASE WHEN event_type = '{conv_type}' THEN ts::DATE END) AS cd
  FROM {table} GROUP BY {user_col}
),
c AS (SELECT max(ts::DATE) AS cmax FROM {table}),
u AS (
  SELECT datediff('day', t0, cmax)::BIGINT AS followup,
         datediff('day', t0, cd)::BIGINT AS conv_k
  FROM per_user, c
),
risk AS (
  SELECT unnest(range(0, coalesce(conv_k, followup) + 1)) AS k
  FROM u
),
r AS (SELECT k::BIGINT AS k, count(*)::BIGINT AS n_at_risk
      FROM risk GROUP BY 1),
cv AS (SELECT conv_k AS k, count(*)::BIGINT AS n_converted
       FROM u WHERE conv_k IS NOT NULL GROUP BY 1)
SELECT r.k, r.n_at_risk,
       coalesce(cv.n_converted, 0)::BIGINT AS n_converted,
       CASE WHEN r.n_at_risk = 0 THEN 0.0
            ELSE coalesce(cv.n_converted, 0)::DOUBLE / r.n_at_risk::DOUBLE
       END AS hazard
FROM r LEFT JOIN cv ON r.k = cv.k
ORDER BY r.k
"""
