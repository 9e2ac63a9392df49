import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import sessions


def test_sessionize_splits_on_gap(spark):
    rows = [
        # user 1: events at t=0s, 10s, 2h, 2h+5s -> sessions 0,0,1,1
        (1, 1, 0), (2, 1, 10_000_000), (3, 1, 7_200_000_000), (4, 1, 7_205_000_000),
        # user 2: single event -> session 0
        (5, 2, 0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, us long").select(
        "event_id", "user_id",
        F.expr("cast(timestamp_micros(us) as timestamp_ntz)").alias("ts"),
    )
    out = {r.event_id: r.session_seq for r in
           sessions.sessionize(ev, gap_seconds=3600).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_session_stats_counts_and_span(spark, events):
    # ONE exchange: the window and the groupBy share the user-key shuffle.
    # Asserted FIRST, on a never-cached frame — once a matching plan is
    # cached, later frames get substituted by InMemoryTableScan (whose
    # printout embeds the build plan's exchanges) and the count lies.
    st = sessions.session_stats(events, gap_seconds=3600)
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    s = sessions.sessionize(events, gap_seconds=3600)
    # stats aggregate exactly the sessionized events
    assert st.agg(F.sum("n_events")).first()[0] == events.count()
    assert st.filter(F.col("span_us") < 0).count() == 0
    # session_seq is dense from 0 per user
    mx = s.groupBy("user_id").agg(F.max("session_seq").alias("m"),
                                  F.count_distinct("session_seq").alias("d"))
    assert mx.filter(F.col("d") != F.col("m") + 1).count() == 0


def test_transition_matrix_counts(spark):
    """Hand-built journeys: counts follow consecutive (ts, id) order."""
    from cassandra_ttl_remover_spark.operators.sessions import transition_matrix

    rows = [
        # user 1: a -> b -> a ; user 2: a -> a
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"),
        (4, 2, 10, "a"), (5, 2, 20, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, _m long, event_type string"
    ).withColumn("ts", F.expr("timestamp_micros(_m * 1000000)"))
    got = {(r.prev_type, r.next_type): r.n
           for r in transition_matrix(ev).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


def test_funnel_comma_in_data_cannot_forge_tokens(spark):
    """An event-type value containing commas must not create spurious
    token boundaries: 'a,view' then 'b,click' is NOT view->click."""
    from cassandra_ttl_remover_spark.operators.sessions import funnel_flags

    rows = [(1, 1, 10, "a,view"), (2, 1, 20, "b,click")]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, _m long, event_type string"
    ).withColumn("ts", F.expr("timestamp_micros(_m * 1000000)"))
    got = funnel_flags(ev, ["view", "click"]).first()
    assert got.reached is False


def test_peak_concurrency_hand_example(spark):
    """Three users, known overlaps under a 10s gap: sessions A=[0,30],
    B=[20,40], C=[35,50] (seconds) -> peak 2, first reached at B's
    start; a fourth user D=[25,25] (single event) pushes the peak to 3
    at t=25. Closed-interval semantics: an end meeting a start counts
    both."""
    import datetime

    from cassandra_ttl_remover_spark.operators.sessions import (
        peak_concurrency,
    )

    def ts(sec):
        return datetime.datetime(2024, 1, 1, 0, 0, sec)

    rows = [
        (1, 1, ts(0)), (2, 1, ts(30)),         # A
        (3, 2, ts(20)), (4, 2, ts(40)),        # B
        (5, 3, ts(35)), (6, 3, ts(50)),        # C
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = peak_concurrency(df, gap_seconds=60).collect()[0]
    assert (got.n_sessions, got.peak_concurrency) == (3, 2)
    # first peak is at B's start: 20s after the epoch of the first event
    # (tz-independent as a difference)
    first_event_us = min(
        r.ts_us for r in
        __import__("cassandra_ttl_remover_spark.operators.sessions",
                   fromlist=["sessionize"]).sessionize(
            df, gap_seconds=60).collect()
    )
    assert got.first_peak_ts_us - first_event_us == 20 * 1_000_000
    rows.append((7, 4, ts(25)))                # D: instant session
    df2 = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got2 = peak_concurrency(df2, gap_seconds=60).collect()[0]
    assert (got2.n_sessions, got2.peak_concurrency) == (4, 3)


def test_peak_concurrency_closed_interval_touching(spark):
    """A session ending exactly when another starts: both count at that
    instant (+1 ordered before -1), so two back-to-back sessions peak
    at 2, not 1."""
    import datetime

    from cassandra_ttl_remover_spark.operators.sessions import (
        peak_concurrency,
    )

    def ts(sec):
        return datetime.datetime(2024, 1, 1, 0, 0, sec)

    rows = [
        (1, 1, ts(0)), (2, 1, ts(10)),         # user 1: [0,10]
        (3, 2, ts(10)), (4, 2, ts(20)),        # user 2: [10,20]
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = peak_concurrency(df, gap_seconds=60).collect()[0]
    assert got.peak_concurrency == 2


def test_scd2_build_manual(spark):
    """Consecutive repeats collapse; versions number changes; the last
    interval per key is open/current."""
    import datetime as dt

    from cassandra_ttl_remover_spark.operators.sessions import scd2_build

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    df = spark.createDataFrame(
        [(1, t(0), 7, "bronze", 0.0, ""), (2, t(10), 7, "bronze", 0.0, ""),
         (3, t(20), 7, "gold", 0.0, ""), (4, t(30), 7, "bronze", 0.0, ""),
         (5, t(5), 8, "silver", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    rows = [(r.user_id, r.attr, r.version, r.is_current)
            for r in scd2_build(df).collect()]
    assert rows == [
        (7, "bronze", 1, False),
        (7, "gold", 2, False),
        (7, "bronze", 3, True),
        (8, "silver", 1, True),
    ]


def test_scd2_single_exchange(spark, events):
    """Both window passes share the key partitioning: exactly one
    Exchange in the physical plan."""
    from cassandra_ttl_remover_spark.operators.sessions import scd2_build

    plan = scd2_build(events)._jdf.queryExecution().executedPlan().toString()
    import re
    # ignore the final presentation orderBy's range exchange
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, plan


def test_scd2_temporal_join_asof_semantics(spark):
    """Each fact row lands in exactly the version valid at its ts; facts
    before the first change get the NULL/none bucket."""
    import datetime as dt

    import __spark_entry__  # noqa: F401  (exercise via operators directly)
    from cassandra_ttl_remover_spark.operators.sessions import scd2_build

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [(1, t(10), 7, "signup", 0.0, ""),
         (2, t(30), 7, "purchase", 0.0, ""),
         (3, t(5), 7, "view", 0.0, ""),     # before any change -> none
         (4, t(20), 7, "view", 0.0, ""),    # inside 'signup' interval
         (5, t(40), 7, "view", 0.0, "")],   # inside 'purchase' interval
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    dim = scd2_build(
        ev.filter(F.col("event_type").isin("signup", "purchase")))
    fact = ev.select(
        "user_id", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"))
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["user_id"])
        & (fact["ts_us"] >= dim["valid_from_us"])
        & (dim["valid_to_us"].isNull()
           | (fact["ts_us"] < dim["valid_to_us"])),
        "left",
    ).select(fact["event_id"], dim["attr"])
    got = {r.event_id: r.attr for r in joined.collect()}
    assert got == {1: "signup", 2: "purchase", 3: None,
                   4: "signup", 5: "purchase"}


def test_last_touch_attribution_semantics(spark):
    """Hand-built timeline: credit goes to the most recent PRECEDING
    click (same-instant click still wins), later clicks never credit
    earlier purchases, and a purchase before any click stays
    unattributed with NULL touch id."""
    from cassandra_ttl_remover_spark.operators.sessions import (
        last_touch_attribution,
    )

    rows = [
        # user 1: p10 before any click -> NULL; c11 then p12 -> c11;
        # c13 at the SAME instant as p14 -> c13 wins the tie
        (1, 10, "purchase", "2024-01-01 00:00:00"),
        (1, 11, "click",    "2024-01-01 00:01:00"),
        (1, 12, "purchase", "2024-01-01 00:05:00"),
        (1, 13, "click",    "2024-01-01 00:06:00"),
        (1, 14, "purchase", "2024-01-01 00:06:00"),
        # user 2: click AFTER the purchase must not credit it
        (2, 20, "purchase", "2024-01-01 01:00:00"),
        (2, 21, "click",    "2024-01-01 02:00:00"),
        # noise kinds are ignored entirely
        (1, 15, "view",     "2024-01-01 00:04:00"),
    ]
    df = spark.createDataFrame(
        [(u, e, k, t) for u, e, k, t in rows],
        "user_id long, event_id long, event_type string, ts string",
    ).withColumn("ts", F.expr("cast(ts as timestamp)"))
    got = {r.convert_id: (r.touch_id, r.lag_us)
           for r in last_touch_attribution(df).collect()}
    assert got == {
        10: (None, None),
        12: (11, 4 * 60 * 1_000_000),
        14: (13, 0),
        20: (None, None),
    }


def test_last_touch_attribution_single_exchange(spark, events):
    from cassandra_ttl_remover_spark.operators.sessions import (
        last_touch_attribution,
    )
    from cassandra_ttl_remover_spark.plans import exchange_count

    # one key exchange (the user window) + the presentation sort
    assert exchange_count(last_touch_attribution(events)) <= 2


def test_hazard_table_hand_cohort(spark):
    """Hand-checkable cohort: conversions shrink the risk set the day
    AFTER they convert (at risk ON the conversion day); never-converts
    stay at risk through the global cutoff; hazards are d/n."""
    from cassandra_ttl_remover_spark.operators.sessions import hazard_table

    rows = [
        # u1: first event day0, converts day1
        (1, "2024-01-01 08:00:00", "signup"),
        (1, "2024-01-02 09:00:00", "purchase"),
        # u2: first event day0, never converts (observed through day3)
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-04 10:00:00", "click"),
        # u3: first event day1 (t0 shifts), converts same day (k=0)
        (3, "2024-01-02 11:00:00", "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string") \
        .selectExpr("user_id", "cast(ts as timestamp) as ts", "event_type")
    got = {r.k: (r.n_at_risk, r.n_converted, r.hazard)
           for r in hazard_table(df).collect()}
    # cutoff = 2024-01-04. followups: u1=3, u2=3, u3=2. conv_k: u1=1, u3=0.
    # at-risk spans: u1 0..1, u2 0..3, u3 0..0
    assert got[0] == (3, 1, 1 / 3)   # u3 converts at k=0
    assert got[1] == (2, 1, 1 / 2)   # u1 converts at k=1
    assert got[2] == (1, 0, 0.0)     # only u2 left
    assert got[3] == (1, 0, 0.0)
    assert set(got) == {0, 1, 2, 3}
