"""MERGE/upsert emulation and SCD2 history tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.operators.upsert import (
    scd2_apply,
    scd2_as_of,
    scd2_initial,
    upsert,
)


def test_upsert_merge_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    out = {r["id"]: (r["name"], r["v"]) for r in upsert(base, updates, "id").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent on re-application of the same updates
    again = upsert(upsert(base, updates, "id"), updates, "id")
    assert again.count() == 4


def test_scd2_history_and_time_travel(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "2024-01-01 00:00:00"), (2, "bob", "2024-01-01 00:00:00")],
        "id long, name string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_initial(snap, "id", "ts")

    changes = spark.createDataFrame(
        [(1, "alicia", "2024-06-01 00:00:00")], "id long, name string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist2 = scd2_apply(hist, changes, "id", "ts")

    assert hist2.count() == 3  # 2 originals + 1 new version
    # as-of before the change: original names
    before = {r["id"]: r["name"] for r in scd2_as_of(hist2, "2024-03-01 00:00:00").collect()}
    assert before == {1: "alice", 2: "bob"}
    # as-of after the change: new version for id 1 only
    after = {r["id"]: r["name"] for r in scd2_as_of(hist2, "2024-07-01 00:00:00").collect()}
    assert after == {1: "alicia", 2: "bob"}
    # exactly one open version per key
    open_counts = (
        hist2.filter(F.col("valid_to") == F.lit("9999-12-31 23:59:59").cast("timestamp"))
        .groupBy("id").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)

    # second change to the same key chains versions correctly
    changes2 = spark.createDataFrame(
        [(1, "alyce", "2024-09-01 00:00:00")], "id long, name string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist3 = scd2_apply(hist2, changes2, "id", "ts")
    assert hist3.count() == 4
    versions = sorted(
        (str(r["valid_from"]), str(r["valid_to"]), r["name"])
        for r in hist3.filter(F.col("id") == 1).collect()
    )
    assert [v[2] for v in versions] == ["alice", "alicia", "alyce"]
    mid = {r["id"]: r["name"] for r in scd2_as_of(hist3, "2024-08-01 00:00:00").collect()}
    assert mid[1] == "alicia"


def test_quality_checks_on_loan_table(spark):
    """Declarative quality gates over the loan golden fixture — one
    aggregation pass, expected pass/fail pattern from the known data
    profile (SURVEY.md §1.3)."""
    import os

    from loan_default_prediction_app_big_data_spark.operators.quality import (
        assert_unique_key,
        in_range,
        in_set,
        not_null,
        run_checks,
    )
    from loan_default_prediction_app_big_data_spark.sources.readers import read_loan_csv

    loan = read_loan_csv(
        spark,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "Loan_Default.csv"),
    )
    report = {
        r["check"]: (r["passed"], r["violation_rate"])
        for r in run_checks(
            loan,
            [
                not_null("ID"),                       # never null -> pass
                not_null("rate_of_interest"),         # ~26% null -> fail at 0
                not_null("rate_of_interest", 0.30),   # tolerate 30% -> pass
                in_range("Credit_Score", 500, 900),   # profiled domain -> pass
                in_range("LTV", 0, 150, 0.01),        # outliers exceed 1% tolerance? profiled ~7800 max
                in_set("Status", ["0", "1"]),         # label domain -> pass
            ],
        ).collect()
    }
    assert report["not_null(ID,tol=0.0)"][0] is True
    assert report["not_null(rate_of_interest,tol=0.0)"][0] is False
    assert 0.2 < report["not_null(rate_of_interest,tol=0.0)"][1] < 0.3
    assert report["not_null(rate_of_interest,tol=0.3)"][0] is True
    assert report["in_range(Credit_Score,[500,900])"][0] is True
    assert report["in_set(Status)"][0] is True
    assert assert_unique_key(loan, ["ID"]) == 0  # ID is a unique key
