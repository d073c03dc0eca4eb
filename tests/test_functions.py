"""Unit tests for the column-expression kits (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kp_data_pipelines_spark.functions import (
    cascading_to_timestamp,
    coerce_long,
    coerce_numeric,
    collapse_whitespace,
    compact_month_end,
    conditional_update,
    fill_from,
    month_name,
    month_start,
    months_ago,
    normalize_key,
    null_count,
    scrub_control_chars,
    sentinel_to_null,
    strip_total_suffix,
)


def test_coerce_numeric(spark):
    df = spark.createDataFrame([("1.5",), ("abc",), (None,), ("42",)], ["x"])
    vals = [r[0] for r in df.select(coerce_numeric("x")).collect()]
    assert vals == [1.5, None, None, 42.0]


def test_coerce_long_float_formatted(spark):
    df = spark.createDataFrame([("47205.0",), ("7",), ("x",)], ["x"])
    vals = [r[0] for r in df.select(coerce_long("x")).collect()]
    assert vals == [47205, 7, None]


def test_sentinel_to_null(spark):
    df = spark.createDataFrame([("",), ("0",), ("ok",)], ["x"])
    vals = [r[0] for r in df.select(sentinel_to_null("x")).collect()]
    assert vals == [None, None, "ok"]


def test_fill_from_cascade(spark):
    df = spark.createDataFrame([(None, "b", "c"), ("a", None, None), (None, None, "z")], ["x", "y", "z"])
    vals = [r[0] for r in df.select(fill_from("x", "y", "z")).collect()]
    assert vals == ["b", "a", "z"]


def test_conditional_update(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    out = df.select(
        "k", conditional_update("v", F.col("k") == 2, F.col("v") * 2).alias("v")
    )
    assert {r["k"]: r["v"] for r in out.collect()} == {1: 10.0, 2: 40.0}


def test_null_count(spark):
    df = spark.createDataFrame([(None, 1), ("a", None), (None, None)], ["x", "y"])
    assert null_count(df, "x", "y") == {"x": 2, "y": 2}


def test_cascading_to_timestamp_formats(spark):
    df = spark.createDataFrame(
        [("2024-03-01T10:20:30",), ("2024-03-01 10:20:30",), ("03/01/2024",), ("garbage",)],
        ["d"],
    )
    out = [r[0] for r in df.select(cascading_to_timestamp("d").alias("t")).collect()]
    assert out[0] is not None and out[0].hour == 10
    assert out[1] is not None
    assert out[3] is None


def test_compact_month_end(spark):
    df = spark.createDataFrame([("0924",), ("0224",), ("xx",)], ["m"])
    vals = [r[0] for r in df.select(compact_month_end("m").alias("d")).collect()]
    assert str(vals[0]) == "2024-09-30"
    assert str(vals[1]) == "2024-02-29"  # leap year month-end
    assert vals[2] is None


def test_month_ops(spark):
    df = spark.createDataFrame([("2024-03-15",)], ["d"]).select(F.col("d").cast("date").alias("d"))
    row = df.select(
        month_start("d").alias("ms"),
        months_ago("d", 1).alias("prev"),
        month_name("d").alias("nm"),
    ).collect()[0]
    assert str(row["ms"]) == "2024-03-01"
    assert str(row["prev"]) == "2024-02-15"
    assert row["nm"] == "March"


def test_string_kit(spark):
    df = spark.createDataFrame([("  Foo   Bar  ",)], ["s"])
    row = df.select(
        collapse_whitespace("s").alias("cw"), normalize_key("s").alias("nk")
    ).collect()[0]
    assert row["cw"] == "foobar"
    assert row["nk"] == "foo bar"


def test_scrub_and_total_suffix(spark):
    df = spark.createDataFrame([("RNG123456 Total", "bad\x00\x1fchars")], ["a", "b"])
    row = df.select(
        strip_total_suffix("a").alias("a"), scrub_control_chars("b").alias("b")
    ).collect()[0]
    assert row["a"] == "RNG123456"
    assert row["b"] == "badchars"
