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
