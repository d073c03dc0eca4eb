"""Streaming tests: AvailableNow ingestion, watermark dedup, windowed aggs
— validated against their batch twins on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kp_data_pipelines_spark.sources import read_table
from kp_data_pipelines_spark.streaming.events import (
    dedup_within_watermark,
    ingest_snapshot_folder,
    run_available_now,
    stream_files,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _events_dir(spark, tmp_path):
    """Materialize events as a micro-precision parquet drop-folder."""
    ev = read_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_src")
    ev.repartition(4).write.parquet(path)
    return path, ev


def test_stream_windowed_counts_match_batch(spark, tmp_path):
    src_dir, ev = _events_dir(spark, tmp_path)
    schema = ev.schema
    stream = stream_files(spark, src_dir, schema)
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    # complete mode: append would (correctly) hold back windows newer than
    # the watermark at end-of-backlog; for batch-equivalence we want all.
    got = run_available_now(agg, str(tmp_path / "ckpt"), output_mode="complete")

    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    got_rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()
    }
    batch_rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert got_rows == batch_rows


def test_snapshot_folder_ingest_dedup(spark, tmp_path):
    src_dir, ev = _events_dir(spark, tmp_path)
    # duplicate the whole folder contents once (the reference's re-read case)
    ev.limit(100).write.mode("append").parquet(src_dir)

    target = str(tmp_path / "tbl")
    ingest_snapshot_folder(
        spark,
        src_dir,
        target,
        str(tmp_path / "ckpt2"),
        ev.schema,
        dedup_keys=["event_id"],
        ts_col="ts",
        watermark="240 hours",
    )
    out = spark.read.parquet(target)
    assert out.count() == ev.count()  # dups dropped
    assert out.select("event_id").distinct().count() == ev.count()


def test_dedup_within_watermark_is_streaming_safe(spark, tmp_path):
    src_dir, ev = _events_dir(spark, tmp_path)
    stream = stream_files(spark, src_dir, ev.schema)
    deduped = dedup_within_watermark(stream, ["user_id"], "ts", "1 hour")
    got = run_available_now(deduped, str(tmp_path / "ckpt3"))
    # one row per (user, watermark-window slice) at most; definitely <= input
    assert 0 < got.count() <= ev.count()


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer vs the batch gaps-and-islands
    definition: closed sessions agree (the stream's still-open final
    session per user is intentionally unemitted)."""
    import pandas as pd

    from kp_data_pipelines_spark.streaming.events import (
        run_available_now,
        sessionize_stateful,
    )

    rows = []
    base = pd.Timestamp("2024-01-01")
    for user in (1, 2):
        t = base
        for session in range(3):
            for i in range(4):
                rows.append((user, t, 1.0))
                t += pd.Timedelta(minutes=5)
            t += pd.Timedelta(minutes=60)  # gap closes the session
    src = tmp_path / "events_src"
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    sessions = sessionize_stateful(stream)
    out = run_available_now(sessions, str(tmp_path / "ckpt"), "append").collect()

    got = {(r["user_id"], r["session_start"], r["n_events"], r["total_value"]) for r in out}
    # 3 sessions per user; the 3rd stays open at end-of-stream -> 2 emitted
    assert len(got) == 4
    assert all(n == 4 and v == 4.0 for (_, _, n, v) in got)


def test_upsert_stream_matches_batch_upsert(spark, tmp_path):
    from kp_data_pipelines_spark.streaming.events import upsert_stream

    # two waves of per-user records dropped as files: the stream must end
    # with the newest row per user, same as a batch upsert of wave2 over wave1
    src = str(tmp_path / "upsert_src")
    wave1 = spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1), (3, 30.0, 1)], "user_id long, bal double, seq long"
    )
    wave2 = spark.createDataFrame(
        [(2, 99.0, 2), (4, 40.0, 2)], "user_id long, bal double, seq long"
    )
    wave1.coalesce(1).write.mode("append").parquet(src)
    wave2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, bal double, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    target = str(tmp_path / "upsert_target")
    upsert_stream(
        stream, target, str(tmp_path / "ckpt"), keys=["user_id"], order_col="seq"
    )
    got = {r["user_id"]: (r["bal"], r["seq"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: (10.0, 1), 2: (99.0, 2), 3: (30.0, 1), 4: (40.0, 2)}


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static join: enrich a stream with a dimension table — the
    dim is re-read per micro-batch (broadcast), no state store needed."""
    path, ev = _events_dir(spark, tmp_path)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("error", "ops")],
        "event_type string, category string",
    )
    stream = stream_files(spark, path, ev.schema)
    enriched = stream.join(F.broadcast(dim), "event_type")
    got = run_available_now(enriched, str(tmp_path / "ck_enrich"))
    want = ev.join(dim, "event_type")
    assert got.count() == want.count()
    g = {r["category"]: r["n"] for r in got.groupBy("category").agg(F.count("*").alias("n")).collect()}
    w = {r["category"]: r["n"] for r in want.groupBy("category").agg(F.count("*").alias("n")).collect()}
    assert g == w


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join with watermarks + time-range condition:
    clicks joined to same-user errors within the following 30 minutes.
    Both sides buffer bounded state (the watermark ages rows out); the
    time-range predicate bounds how long a click waits for errors."""
    path, ev = _events_dir(spark, tmp_path)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
            F.col("ts").alias("click_ts"),
        )
        errors = df.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"), F.col("user_id").alias("eu"),
            F.col("ts").alias("error_ts"),
        )
        return clicks, errors

    sc_, se = split(stream_files(spark, path, ev.schema))
    joined = sc_.withWatermark("click_ts", "1 hour").join(
        se.withWatermark("error_ts", "1 hour"),
        (F.col("cu") == F.col("eu"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    got = run_available_now(joined, str(tmp_path / "ck_ss"))
    bc, be = split(ev)
    want = bc.join(
        be,
        (F.col("cu") == F.col("eu"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    assert got.count() == want.count() > 0
    g = sorted((r["click_id"], r["error_id"]) for r in got.collect())
    w = sorted((r["click_id"], r["error_id"]) for r in want.collect())
    assert g == w


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """q103's session_window operator, run under readStream AvailableNow in
    complete mode, produces the same sessions as the batch plan."""
    from kp_data_pipelines_spark.streaming.events import run_available_now, stream_files

    src_dir, ev = _events_dir(spark, tmp_path)

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("w_start"),
                F.col("session_window.end").alias("w_end"),
                "n_events",
            )
        )

    stream = stream_files(spark, src_dir, ev.schema).withWatermark("ts", "1 hour")
    got = run_available_now(
        sessions(stream), str(tmp_path / "ckpt_sess"), output_mode="complete"
    )
    got_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in sessions(ev).collect()}
    assert got_rows == batch_rows


def test_transform_with_state_running_totals(spark, tmp_path):
    """v2 stateful API (transformWithStateInPandas): per-user running
    totals accumulated across MULTIPLE micro-batches equal the batch
    groupBy; state survives between triggers.

    The v2 WIRE protocol needs protobuf; when the container lacks it,
    this test does NOT skip — it drives the same RunningTotalsProcessor
    through a keyed fake StatefulProcessorHandle across simulated
    micro-batches and asserts the identical batch-groupBy equivalence,
    so the processor's accumulation logic is always exercised (the
    engine integration additionally runs wherever protobuf exists)."""
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        _transform_with_state_logic_harness(spark)
        return
    from kp_data_pipelines_spark.streaming.stateful import running_totals_stream

    # the v2 state API requires the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = read_table(spark, SF_DIR, "events").limit(2000).cache()
    src_dir = str(tmp_path / "ev_files")
    ev.repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)  # force >1 micro-batch
        .parquet(src_dir)
    )
    out = running_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) rn
          FROM running_totals
        ) WHERE rn = 1
        """
    ).collect()
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert len(got) == len(batch)
    for r in got:
        n, total = batch[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["total_value"] - total) < 1e-6
    ev.unpersist()


class _FakeValueState:
    """Minimal ValueState: exists/get/update — what RunningTotalsProcessor
    uses. One instance per (state-name, grouping-key), mirroring the
    engine's keyed state store partitioning."""

    def __init__(self) -> None:
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


class _FakeHandle:
    def __init__(self) -> None:
        self._states: dict[str, _FakeValueState] = {}

    def getValueState(self, name, schema):
        return self._states.setdefault(name, _FakeValueState())


def _transform_with_state_logic_harness(spark) -> None:
    """Protocol-free half of test_transform_with_state_running_totals:
    per-key processor instances fed three simulated micro-batches; the
    final emission per user must equal the batch groupBy."""
    from kp_data_pipelines_spark.streaming.stateful import (
        RunningTotalsProcessor,
    )

    ev = read_table(spark, SF_DIR, "events").limit(2000).cache()
    pdf = ev.select("user_id", "value").toPandas()
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    ev.unpersist()

    # three micro-batches, keyed exactly as the engine would group them
    chunks = [
        pdf.iloc[i::3].reset_index(drop=True) for i in range(3)
    ]
    procs: dict = {}
    last_emit: dict = {}
    for chunk in chunks:
        for uid, rows in chunk.groupby("user_id"):
            if uid not in procs:
                p = RunningTotalsProcessor()
                p.init(_FakeHandle())
                procs[uid] = p
            outs = list(
                procs[uid].handleInputRows((uid,), iter([rows]), None)
            )
            assert len(outs) == 1
            last_emit[uid] = outs[0]

    assert set(last_emit) == set(batch)
    for uid, out in last_emit.items():
        n, total = batch[uid]
        assert int(out["n_events"].iloc[0]) == n
        assert abs(float(out["total_value"].iloc[0]) - total) < 1e-6


def test_transition_counts_stateful_spans_batches(spark, tmp_path):
    """Cross-batch sequence statistics: the stateful transition counter
    must count transitions that SPAN micro-batch boundaries (the pair
    (last event of batch N, first event of batch N+1)) — the case a
    stateless per-batch lead() partial silently drops. Two time-ordered
    waves per user, one file per trigger; summed stream partials must
    equal the batch lead() counts over the union."""
    import pandas as pd

    from kp_data_pipelines_spark.streaming.events import (
        run_available_now,
        transition_counts_stateful,
    )

    base = pd.Timestamp("2024-03-01")
    wave1, wave2 = [], []
    # user 1: view click view | purchase error  (boundary pair: view->purchase)
    for i, t in enumerate(["view", "click", "view"]):
        wave1.append((1, base + pd.Timedelta(minutes=i), t))
    for i, t in enumerate(["purchase", "error"]):
        wave2.append((1, base + pd.Timedelta(minutes=10 + i), t))
    # user 2: click click | click  (boundary pair: click->click)
    for i, t in enumerate(["click", "click"]):
        wave1.append((2, base + pd.Timedelta(minutes=i), t))
    wave2.append((2, base + pd.Timedelta(minutes=30), "click"))

    src = str(tmp_path / "waves")
    cols = ["user_id", "ts", "event_type"]
    spark.createDataFrame(pd.DataFrame(wave1, columns=cols)).coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(pd.DataFrame(wave2, columns=cols)).coalesce(
        1
    ).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_available_now(
        transition_counts_stateful(stream), str(tmp_path / "ckpt"), "append"
    )
    got = {
        (r["user_id"], r["cur"], r["nxt"]): r["n"]
        for r in out.groupBy("user_id", "cur", "nxt")
        .agg(F.sum("n").alias("n"))
        .collect()
    }

    ev = spark.read.parquet(src)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("user_id", "cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["user_id"], r["cur"], r["nxt"]): r["n"] for r in batch.collect()}
    assert got == want
    # the boundary-crossing pairs specifically
    assert got[(1, "view", "purchase")] == 1
    assert got[(2, "click", "click")] == 2


def test_watermark_drops_late_rows_and_reports_them(spark, tmp_path):
    """Late-data accounting: a watermarked windowed aggregate must (a)
    DROP rows older than the persisted watermark on a later trigger and
    (b) REPORT the drop in StreamingQueryProgress
    (numRowsDroppedByWatermark) — the observability contract a
    production monitor alarms on. Two AvailableNow runs share one
    checkpoint: run 1 advances the watermark past the late rows, run 2
    feeds them and must count every one as dropped."""
    import pandas as pd

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "ckpt_wm")
    base = pd.Timestamp("2024-06-01 12:00:00")
    on_time = pd.DataFrame(
        {
            "user_id": [1, 2, 3],
            "ts": [base, base + pd.Timedelta(minutes=1), base + pd.Timedelta(minutes=2)],
            "value": [1.0, 2.0, 3.0],
        }
    )
    spark.createDataFrame(on_time).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        dropped = 0
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                dropped += op.get("numRowsDroppedByWatermark", 0)
        return dropped

    assert run_once() == 0  # on-time wave: nothing dropped

    # late wave: 3 rows a full hour older than the persisted watermark,
    # in three DISTINCT 5-minute windows — the drop metric counts the
    # map-side PARTIALS reaching the state operator (same-window rows
    # pre-aggregate to one partial), so distinct windows pin the count
    late = pd.DataFrame(
        {
            "user_id": [4, 5, 6],
            "ts": [
                base - pd.Timedelta(hours=1),
                base - pd.Timedelta(hours=1, minutes=5),
                base - pd.Timedelta(hours=1, minutes=10),
            ],
            "value": [9.0, 9.0, 9.0],
        }
    )
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src)
    assert run_once() == 3  # every late window-partial dropped AND reported


def test_transition_counts_stateful_equal_ts_tiebreak(spark, tmp_path):
    """Determinism under equal timestamps: events sharing one ts must
    fold in (ts, event_id) order — the batch twin q241's ORDER BY ts,
    event_id — regardless of arrival order inside the micro-batch. The
    file stores the rows SHUFFLED (c, a, b); a ts-only sort would emit
    whatever transition sequence the physical row order happens to give."""
    import pandas as pd

    from kp_data_pipelines_spark.streaming.events import (
        run_available_now,
        transition_counts_stateful,
    )

    ts = pd.Timestamp("2024-03-01")
    rows = [
        (1, ts, 3, "c"),
        (1, ts, 1, "a"),
        (1, ts, 2, "b"),
    ]
    src = str(tmp_path / "ties")
    cols = ["user_id", "ts", "event_id", "event_type"]
    spark.createDataFrame(pd.DataFrame(rows, columns=cols)).coalesce(
        1
    ).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_available_now(
        transition_counts_stateful(stream), str(tmp_path / "ckpt"), "append"
    )
    got = {
        (r["cur"], r["nxt"]): r["n"]
        for r in out.groupBy("cur", "nxt").agg(F.sum("n").alias("n")).collect()
    }
    # event_id order a(1) -> b(2) -> c(3): exactly those two transitions
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_training_build_stream_equals_batch(spark, tmp_path):
    """Stream-over-waves == batch q250: a corpus (testdata documents +
    injected exact duplicates whose copies land in a LATER wave) split
    into two ascending-doc_id waves (one file per trigger) through the
    foreachBatch build — quality gate, split, cross-batch fingerprint
    state dedup, mergeable partials — must reproduce the batch ledger
    exactly. Testdata has no exact text duplicates, so the cross-wave
    copies are injected with fresh doc_ids; the batch side runs the
    REAL catalog q250 over the same synthetic corpus staged as an
    sf-dir."""
    from kp_data_pipelines_spark.catalog import QUERIES
    from kp_data_pipelines_spark.streaming.training import (
        training_build_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    # duplicates of three QUALITY-PASSING wave-1 texts (quality-fail
    # docs are never dedup candidates), re-keyed past the corpus max so
    # they arrive in wave 2 (first-seen keeper == batch MIN keeper)
    from kp_data_pipelines_spark.streaming.training import doc_flags

    pass_ids = [
        r["doc_id"]
        for r in doc_flags(docs.filter(F.col("doc_id") <= mid))
        .filter(F.col("quality_pass") == 1)
        .orderBy("doc_id")
        .limit(3)
        .collect()
    ]
    dup_src = docs.filter(F.col("doc_id").isin(pass_ids))
    dups = dup_src.withColumn(
        "doc_id", F.col("doc_id") + F.lit(int(hi) + 1000)
    )
    corpus = docs.unionByName(dups)

    # batch side: the real catalog q250 over the synthetic corpus,
    # staged as an sf-dir (q250 reads {sf}/documents.parquet)
    sf_dir = str(tmp_path / "sf")
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    want = QUERIES["q250_training_data_build"](spark, sf_dir).collect()
    assert sum(r["n_dup_dropped"] for r in want) >= 3

    # stream side: two ascending-doc_id waves, one file per trigger
    src = str(tmp_path / "waves")
    corpus.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    corpus.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = training_build_stream(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).collect()
    as_map = lambda rows: {
        (r["lang"], r["split"]): tuple(r)[2:] for r in rows
    }
    assert as_map(got) == as_map(want)


def test_length_drift_stream_equals_batch_any_wave_order(spark, tmp_path):
    """Stream-over-SHUFFLED-waves == batch q254: histogram count
    partials are purely mergeable, so unlike the training-build twin
    (ordered-arrival contract for its MIN-keeper dedup) the drift
    monitor must reproduce the batch TVD bit-for-bit under ANY wave
    partition — here three waves split by doc_id % 3, deliberately
    interleaving the even/odd snapshot halves across triggers."""
    from kp_data_pipelines_spark.catalog import QUERIES
    from kp_data_pipelines_spark.streaming.drift import length_drift_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        r["lang"]: tuple(r)[1:]
        for r in QUERIES["q254_length_drift_tvd"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }

    src = str(tmp_path / "waves")
    for wave in range(3):  # doc_id % 3: NOT aligned with the %2 halves
        docs.filter(F.pmod("doc_id", F.lit(3)) == wave).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {
        r["lang"]: tuple(r)[1:]
        for r in length_drift_stream(
            stream, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == want  # exact, including the float TVD bits


def test_cdc_ingest_stream_equals_batch_with_cross_batch_dups(
    spark, tmp_path
):
    """Growing-store CDC ingest (q288's operator) over two
    ascending-doc_id waves == global first-occurrence batch semantics,
    WITH injected cross-batch duplicate chunks: wave 2 carries an exact
    copy and an appended-tail copy of wave-1 documents (source
    'injected'), so their chunk identities are already in the
    persistent store when wave 2's trigger runs — the path q286's
    static store never exercises. The batch twin is the q288 DuckDB
    oracle evaluated over the same staged corpus."""
    import duckdb

    from kp_data_pipelines_spark import oracles
    from kp_data_pipelines_spark.streaming.cdc import cdc_ingest_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    base = (
        docs.filter(F.col("doc_id") <= mid)
        .orderBy("doc_id")
        .limit(2)
        .select("doc_id", "source", "text")
        .collect()
    )
    injected = spark.createDataFrame(
        [
            # exact copy: every chunk identity already in the store
            (int(hi) + 1001, "injected", base[0]["text"]),
            # appended tail: leading chunks duplicate (CDC
            # edit-locality), tail chunks new
            (
                int(hi) + 1002,
                "injected",
                base[1]["text"] + " " + "tail chunk payload " * 40,
            ),
        ],
        "doc_id long, source string, text string",
    )
    corpus = docs.select("doc_id", "source", "text").unionByName(injected)

    staged = str(tmp_path / "corpus.parquet")
    corpus.coalesce(1).write.parquet(staged)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{staged}/*.parquet')"
    )
    want_df = con.sql(oracles.cdc_growing_ingest_sql()).df()
    want = {
        r.source: (
            r.n_docs, r.n_chunks, r.new_chunks, r.dup_chunks,
            r.new_chars, r.dup_chars, r.dup_char_share,
        )
        for r in want_df.itertuples()
    }
    # the injection really creates cross-batch duplicate chunks
    assert want["injected"][3] > 0  # dup_chunks
    assert want["injected"][2] > 0  # new_chunks (the appended tail)

    src = str(tmp_path / "waves")
    corpus.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    corpus.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {
        r["source"]: tuple(r)[1:]
        for r in cdc_ingest_stream(
            stream,
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    }
    assert got == want


def test_ivf_cell_stats_stream_equals_batch_any_wave_order(spark, tmp_path):
    """Stream-over-SHUFFLED-waves == whole-corpus IVF cell stats: the
    per-cell (count, DECIMAL quantized-cosine-sum) partials are purely
    mergeable, so the q294 operator must reproduce the batch oracle
    bit-for-bit under ANY wave partition — here three waves split by
    vec_id % 3, so every trigger mixes even (centroid-seed) and odd
    vectors."""
    import duckdb

    from kp_data_pipelines_spark import oracles
    from kp_data_pipelines_spark.operators.similarity import ivf_centroids
    from kp_data_pipelines_spark.streaming.drift import ivf_cell_stats_stream

    src_parquet = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(src_parquet)
    cents = ivf_centroids(
        emb.filter(F.pmod("vec_id", F.lit(2)) == 0), "embedding", 16,
        id_col="vec_id",
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{src_parquet}')"
    )
    want = {
        r.cid: (r.n_vecs, r.share, r.mean_cos)
        for r in con.sql(oracles.ivf_cell_stats_sql()).df().itertuples()
    }

    src = str(tmp_path / "waves")
    for wave in range(3):
        emb.filter(F.pmod("vec_id", F.lit(3)) == wave).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("vec_id", "embedding")
    )
    got = {
        r["cid"]: (r["n_vecs"], r["share"], r["mean_cos"])
        for r in ivf_cell_stats_stream(
            stream, cents, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == want  # exact, including the float share/mean bits


def test_vocab_growth_stream_equals_batch_any_wave_order(spark, tmp_path):
    """Stream-over-SHUFFLED-waves == batch q284: the vocabulary partial
    merges by MIN (first occurrence per token hash), per-doc counts are
    disjoint across batches, and doc totals sum — all order-insensitive,
    so three doc_id%3 waves must reproduce the batch Heaps-law table
    bit-for-bit (including the float type-token ratios)."""
    from kp_data_pipelines_spark.catalog import QUERIES
    from kp_data_pipelines_spark.streaming.drift import vocab_growth_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        r["checkpoint"]: tuple(r)[1:]
        for r in QUERIES["q284_vocab_growth"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    src = str(tmp_path / "waves")
    for wave in range(3):
        docs.filter(F.pmod("doc_id", F.lit(3)) == wave).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", "text")
    )
    got = {
        r["checkpoint"]: tuple(r)[1:]
        for r in vocab_growth_stream(
            stream, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == want


def test_cdc_ingest_from_rate_source_equals_batch(spark, tmp_path):
    """The growing-store CDC ingest fed from an UNBOUNDED source
    (round-9 verdict #4): rate-micro-batch values map onto documents
    via the stream-static adapter (``events.rate_mapped_doc_stream``),
    micro-batches run under the default trigger with a bounded stop
    (``events.run_bounded_foreach_batch``), and the resulting ledger
    must equal the q288 DuckDB oracle over the same corpus — i.e.
    stream == batch on a source whose listing order the builder never
    controls and which never terminates. The order guard stays ON:
    rate values ascend across batches, so the mapped doc_ids satisfy
    the ascending contract structurally."""
    import functools

    import duckdb

    from kp_data_pipelines_spark import oracles
    from kp_data_pipelines_spark.streaming.cdc import cdc_ingest_stream
    from kp_data_pipelines_spark.streaming.events import (
        rate_mapped_doc_stream,
        run_bounded_foreach_batch,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
        .limit(40)
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    staged = str(tmp_path / "corpus.parquet")
    docs.coalesce(1).write.parquet(staged)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{staged}/*.parquet')"
    )
    want_df = con.sql(oracles.cdc_growing_ingest_sql()).df()
    want = {
        r.source: (
            r.n_docs, r.n_chunks, r.new_chunks, r.dup_chunks,
            r.new_chars, r.dup_chars, r.dup_char_share,
        )
        for r in want_df.itertuples()
    }

    stream = rate_mapped_doc_stream(spark, docs, rows_per_batch=16)
    runner = functools.partial(run_bounded_foreach_batch, total_rows=n)
    got = {
        r["source"]: tuple(r)[1:]
        for r in cdc_ingest_stream(
            stream,
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            runner=runner,
        ).collect()
    }
    assert got == want


def test_cdc_ingest_partial_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a trigger (crash between
    the store write and the checkpoint commit) must reproduce the SAME
    partial and leave the store unchanged — the ADVICE round-8 finding
    was that plain mode('append') state writes double-inserted the
    batch's identities and flagged all its chunks as duplicates on
    replay. The fix: per-(run, batch) overwrite partitions + a pre-batch
    store view that excludes the batch's own partition."""
    from kp_data_pipelines_spark.streaming.cdc import (
        _cdc_ingest_partial,
        _read_chunk_store,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
    )
    b0 = docs.limit(4).localCheckpoint(eager=True)
    b1 = docs.offset(4).limit(4).localCheckpoint(eager=True)
    state = str(tmp_path / "state")

    def snap(df):
        return sorted(
            tuple(r) for r in df.select(*sorted(df.columns)).collect()
        )

    p0 = snap(_cdc_ingest_partial(b0, state, 16, 64, "tokA", 0))
    store_after_0 = snap(_read_chunk_store(spark, state))
    # replay batch 0 (same run token + id): identical partial, store
    # byte-identical (no duplicate identities, no dup-flag inflation)
    assert snap(_cdc_ingest_partial(b0, state, 16, 64, "tokA", 0)) == p0
    assert snap(_read_chunk_store(spark, state)) == store_after_0

    p1 = snap(_cdc_ingest_partial(b1, state, 16, 64, "tokA", 1))
    store_after_1 = snap(_read_chunk_store(spark, state))
    assert snap(_cdc_ingest_partial(b1, state, 16, 64, "tokA", 1)) == p1
    assert snap(_read_chunk_store(spark, state)) == store_after_1


def test_cdc_ingest_stream_rejects_out_of_order_backlog(spark, tmp_path):
    """A backlog whose file mtimes do NOT track doc_id order (touched /
    copied files) breaks the global first-occurrence contract; the
    ingest must fail loudly instead of producing a wrong ledger."""
    import pytest

    from kp_data_pipelines_spark.streaming.cdc import cdc_ingest_stream

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
    )
    hi = docs.limit(8).offset(4)
    lo = docs.limit(4)
    src = str(tmp_path / "waves")
    # HIGH doc_ids written (hence listed) first -> descending arrival
    hi.coalesce(1).write.mode("append").parquet(src)
    import time

    time.sleep(1.1)  # distinct mtimes so listing order is deterministic
    lo.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(Exception, match="ascending-id order"):
        cdc_ingest_stream(
            stream,
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
