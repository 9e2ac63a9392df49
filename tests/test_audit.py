import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators.audit import diff_frames, profile_table


def test_diff_frames_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, w long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k long, v string, w long",
    )
    out = {r.k: r.change for r in diff_frames(old, new, ["k"]).collect()}
    # 1 unchanged (omitted), 2 changed, 3 removed, 4 NULL==NULL unchanged, 5 added
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_diff_frames_single_join(spark, events):
    old = events.select("user_id", "event_id", "value")
    new = old.withColumn("value", F.col("value") + 1)
    d = diff_frames(old, new, ["user_id", "event_id"])
    assert d.filter(F.col("change") != "changed").count() == 0
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1


def test_profile_table_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a long, b string"
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert rows["a"].n_rows == 4 and rows["a"].n_nulls == 1 and rows["a"].n_distinct == 3
    assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2
