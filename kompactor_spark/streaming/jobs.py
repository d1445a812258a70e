"""Streaming transformations over the events schema (SURVEY §2.B
X1-X5, plus X6 custom state and X9 stream-stream join).

Each builder takes a DataFrame that may be a STREAMING frame
(spark.readStream) or a batch frame — the same declarative plan serves
both, which is exactly the batch-equivalence contract the tests check:
run incrementally (file source, per-file micro-batches, watermark) and
the final state must match the one-shot batch run.

Event time: events.ts is int64 epoch-ns (engine time policy); Spark's
window()/session_window()/withWatermark need TimestampType, so these
jobs convert ns→µs timestamps at the boundary and expose window bounds
back as ns longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kompactor_spark.timeutil import NS_PER_US, ns_to_timestamp


def _with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    return df.withColumn("event_time", ns_to_timestamp(F.col(ts_col)))


def _start_ns(window_col) -> F.Column:
    return (F.unix_micros(window_col.getField("start")) * NS_PER_US).cast("long")


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """X1: tumbling event-time window; count + sum per (window, type)."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", width).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(_start_ns(F.col("w")).alias("window_start_ns"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """X2: sliding event-time window."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", width, slide).alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(_start_ns(F.col("w")).alias("window_start_ns"), "n_events", "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """X3: session windows (gap-based) per user."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    return (
        e.groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(_start_ns(F.col("w")).alias("session_start_ns"), "user_id", "n_events")
    )


def stateful_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """X5: drop duplicate event_ids within the watermark horizon."""
    e = _with_event_time(events)
    if e.isStreaming:
        return e.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return e.dropDuplicates(["event_id"])


def m4_downsample(events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """X16-stream: continuous M4 downsampling — per event-time bucket keep
    {count, min, max, first, last} of the series plus the first/last
    timestamps, maintained incrementally across micro-batches (the
    continuous-aggregate form of the batch ``x16_m4_downsample``; every
    aggregate is a mergeable declarative aggregate, so the streaming
    state is 4 scalars + 2 timestamps per open bucket regardless of
    event density). Ordering keys are µs-floored like the batch twin."""
    e = _with_event_time(events)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    e = e.withColumn("ts_us", F.col("ts") - F.col("ts") % 1000)
    return (
        e.groupBy(F.window("event_time", width).alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", "ts_us").alias("v_first"),
            F.max_by("value", "ts_us").alias("v_last"),
            F.min("ts_us").alias("t_first"),
            F.max("ts_us").alias("t_last"),
        )
        .select(
            _start_ns(F.col("w")).alias("bucket_ns"),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
            "t_first",
            "t_last",
        )
    )


USER_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_ts long"
_USER_STATE_SCHEMA = "n long, total double, mx long"


def running_user_stats(events: DataFrame) -> DataFrame:
    """X6: custom stateful operator — per-user running (count, sum,
    max ts) maintained across micro-batches with
    ``applyInPandasWithState`` (Arrow-batched; state is one tuple per
    user, so memory is O(distinct users), not O(events)).

    On a batch frame the same contract is the plain groupBy — which is
    exactly what the batch-equivalence test compares against.
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
            F.max("ts").cast("bigint").alias("max_ts"),
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total, mx = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, int(pdf["ts"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_ts": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, USER_STATS_SCHEMA, _USER_STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


EWMA_SCHEMA = "user_id long, event_id long, ts_ns long, ewma double"
_EWMA_STATE_SCHEMA = "ts array<long>, eid array<long>, val array<double>"
_EWMA_K = 8
_EWMA_ALPHA = 0.5


def ewma_stream(events: DataFrame, k: int = _EWMA_K, alpha: float = _EWMA_ALPHA) -> DataFrame:
    """X19-stream: per-user finite-window EWMA maintained across
    micro-batches with ``applyInPandasWithState`` — the streaming twin
    of the batch ``x19_ewma`` operator (same α, same K, same
    renormalized weights, same µs-floored ordering key).

    State per user is the trailing K ``(ts, event_id, value)`` samples —
    bounded O(K · distinct users) memory regardless of stream length,
    the property that lets the operator run forever. Each micro-batch
    emits one output row per input event (the EWMA *at* that event), so
    the append-mode stream concatenates to exactly the batch result when
    events arrive time-ordered per key (the ingest WAL guarantees hour
    ordering; cross-hour disorder is bounded by the watermark upstream).

    On a batch frame the same contract runs as the x19 lag expression —
    which is what the batch-equivalence test compares against.
    """
    if not events.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        s = events.select(
            "user_id", "event_id", (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"), "value"
        )
        lags = s.select(
            "user_id", "event_id", "ts_ns",
            *[F.lag("value", i).over(w).alias(f"v{i}") for i in range(k)],
        )
        num = F.lit(0.0)
        den = F.lit(0.0)
        for i in range(k):
            wgt = alpha * (1.0 - alpha) ** i
            num = num + F.coalesce(F.lit(wgt) * F.col(f"v{i}"), F.lit(0.0))
            den = den + F.when(F.col(f"v{i}").isNotNull(), F.lit(wgt)).otherwise(0.0)
        return lags.select("user_id", "event_id", "ts_ns", (num / den).alias("ewma"))

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        hist_ts, hist_eid, hist_val = (
            ([list(x) for x in state.get]) if state.exists else ([], [], [])
        )
        out_uid, out_eid, out_ts, out_ewma = [], [], [], []
        # Concatenate ALL Arrow chunks before sorting (a group's rows can
        # span chunks within a micro-batch; this op is processing-order
        # sensitive, so per-chunk sorting would replay events out of
        # time order across chunk boundaries).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.assign(ts_ns=pdf["ts"] - pdf["ts"] % 1000).sort_values(
                ["ts_ns", "event_id"], kind="mergesort"
            )
            for eid, ts_ns, v in zip(pdf["event_id"], pdf["ts_ns"], pdf["value"]):
                hist_ts.append(int(ts_ns))
                hist_eid.append(int(eid))
                hist_val.append(float(v))
                if len(hist_val) > k:
                    del hist_ts[0], hist_eid[0], hist_val[0]
                num = den = 0.0
                # newest sample gets weight alpha, older decay by (1-alpha)
                for age, val in enumerate(reversed(hist_val)):
                    wgt = alpha * (1.0 - alpha) ** age
                    num += wgt * val
                    den += wgt
                out_uid.append(int(key[0]))
                out_eid.append(int(eid))
                out_ts.append(int(ts_ns))
                out_ewma.append(num / den)
        state.update((hist_ts, hist_eid, hist_val))
        yield pd.DataFrame(
            {"user_id": out_uid, "event_id": out_eid, "ts_ns": out_ts, "ewma": out_ewma}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, EWMA_SCHEMA, _EWMA_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def error_signup_join(
    errors: DataFrame,
    signups: DataFrame,
    lookback: str = "24 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """X9: stream-stream inner join — each error pairs with same-user
    signups in the preceding `lookback`. Both sides watermarked so
    Spark can expire join state (without the time bound + watermarks,
    stream-stream state grows forever — the bound IS the scale story).

    Works identically on batch frames (the declarative plan is shared),
    which is what the batch-equivalence test compares against.
    """
    e = _with_event_time(errors).select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        F.col("event_time").alias("err_time"),
        F.col("ts").alias("err_ts"),
    )
    s = _with_event_time(signups).select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("event_time").alias("signup_time"),
        F.col("ts").alias("signup_ts"),
    )
    if e.isStreaming:
        e = e.withWatermark("err_time", watermark)
    if s.isStreaming:
        s = s.withWatermark("signup_time", watermark)
    cond = (
        (F.col("e_user") == F.col("s_user"))
        & (F.col("signup_time") <= F.col("err_time"))
        & (F.col("signup_time") >= F.col("err_time") - F.expr(f"INTERVAL {lookback}"))
    )
    return e.join(s, cond, "inner").select(
        "err_id", F.col("e_user").alias("user_id"), "signup_id", "err_ts", "signup_ts"
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id", how: str = "left") -> DataFrame:
    """X13 — stream-static enrichment join.

    The static side is broadcast into every micro-batch; the join is
    stateless (no watermark, no state store), so it composes with any
    downstream windowed aggregate. At scale this is the canonical
    dimension-enrichment shape: Spark re-resolves the static relation
    per micro-batch, so a slowly-changing dim picks up updates without
    restarting the query.
    """
    return events.join(F.broadcast(dim), key, how)


def streaming_upsert(
    stream: DataFrame,
    target_dir: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
):
    """X14 — keyed idempotent sink: each micro-batch is MERGEd into a
    parquet table (latest row per key wins, ``order_col`` breaks ties
    within a batch).

    Exactly-once without a table format: every applied batch writes a
    fresh versioned directory ``v{batch_id}`` and then atomically
    repoints the ``_LATEST`` pointer file. Replaying a batch after a
    crash rewrites the same deterministic content and repoints to the
    same version — idempotent — while readers always resolve a fully
    written version. (A real lakehouse table format does the same
    thing with a manifest log; the snapshot catalog in
    ``compaction/metadata.py`` is the fuller version of this idea.)

    Returns the started StreamingQuery (caller awaits termination).
    """
    import os

    from pyspark.sql import Window

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        ptr = os.path.join(target_dir, "_LATEST")
        if os.path.exists(ptr):
            with open(ptr, encoding="utf-8") as fh:
                if fh.read().strip() == f"v{batch_id}":
                    # replay after crash-post-commit: already applied, and
                    # re-merging would overwrite the version dir we'd be
                    # lazily reading from
                    return
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        current = read_upsert_table(spark, target_dir)
        if current is not None:
            keep = current.join(latest.select(*keys), keys, "left_anti")
            merged = keep.unionByName(latest)
        else:
            merged = latest
        vdir = os.path.join(target_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(target_dir, "_LATEST.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"v{batch_id}")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(target_dir, "_LATEST"))

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_upsert_table(spark, target_dir: str) -> DataFrame | None:
    """Resolve the streaming-upsert table via its pointer file; None
    when no version has been committed yet."""
    import os

    ptr = os.path.join(target_dir, "_LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(target_dir, version))


CUSUM_SCHEMA = "user_id long, event_id long, ts_ns long, cusum double"
_CUSUM_STATE_SCHEMA = "s double"


def cusum_stream(events: DataFrame, target: float = 0.5) -> DataFrame:
    """X20-stream: per-user CUSUM maintained across micro-batches — the
    streaming twin of the batch ``x20_cusum`` operator. State per user
    is ONE double (the running sum): O(distinct users) memory, runs
    forever; each micro-batch appends one row per input event carrying
    the CUSUM at that event. The batch path is the x20 window cumsum,
    which the equivalence test compares against.

    Implemented on ``applyInPandasWithState``. Spark 4's successor API
    (``transformWithStateInPandas`` with typed ValueState/ListState and
    timers) was evaluated and works against this code shape, but its
    state-server wire protocol imports ``google.protobuf`` at runtime,
    which this deployment image does not ship — the older operator has
    no such dependency and carries identical semantics for one scalar
    state cell.
    """
    if not events.isStreaming:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_ns", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            events.select(
                "user_id",
                "event_id",
                (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
                "value",
            )
            .withColumn("cusum", F.sum(F.col("value") - F.lit(target)).over(w))
            .drop("value")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        s = state.get[0] if state.exists else 0.0
        out_eid, out_ts, out_cs = [], [], []
        # Concatenate ALL Arrow chunks before sorting (a group's rows can
        # span chunks within a micro-batch; this op is processing-order
        # sensitive, so per-chunk sorting would replay events out of
        # time order across chunk boundaries).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.assign(ts_ns=pdf["ts"] - pdf["ts"] % 1000).sort_values(
                ["ts_ns", "event_id"], kind="mergesort"
            )
            for eid, ts_ns, v in zip(pdf["event_id"], pdf["ts_ns"], pdf["value"]):
                s += float(v) - target
                out_eid.append(int(eid))
                out_ts.append(int(ts_ns))
                out_cs.append(s)
        state.update((s,))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(out_eid),
                "event_id": out_eid,
                "ts_ns": out_ts,
                "cusum": out_cs,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, CUSUM_SCHEMA, _CUSUM_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


CROSSING_SCHEMA = "user_id long, event_id long, ts_ns long, prev_value double, value double, direction string"
_CROSSING_STATE_SCHEMA = "prev double"


def threshold_crossing_stream(events: DataFrame, theta: float = 0.9) -> DataFrame:
    """X22-stream: alert-edge detection across micro-batches — emit a row
    whenever a user's value crosses ``theta`` between consecutive
    samples, with direction. State per user is the PREVIOUS value (one
    double): the true alerting-backend shape — O(users) state, output
    proportional to crossings, silence between edges. Batch path = the
    x22 lag expression; equivalence test compares the two.
    """
    if not events.isStreaming:
        from pyspark.sql import Window

        th = F.lit(theta)
        w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        s = (
            events.select(
                "user_id",
                "event_id",
                (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
                "value",
            )
            .withColumn("prev_value", F.lag("value").over(w))
        )
        crossed = ((F.col("prev_value") <= th) & (F.col("value") > th)) | (
            (F.col("prev_value") > th) & (F.col("value") <= th)
        )
        return s.where(F.col("prev_value").isNotNull() & crossed).withColumn(
            "direction", F.when(F.col("value") > th, "rise").otherwise("fall")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        prev = state.get[0] if state.exists else None
        out = {k: [] for k in ("event_id", "ts_ns", "prev_value", "value", "direction")}
        # Concatenate ALL Arrow chunks before sorting (a group's rows can
        # span chunks within a micro-batch; this op is processing-order
        # sensitive, so per-chunk sorting would replay events out of
        # time order across chunk boundaries).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.assign(ts_ns=pdf["ts"] - pdf["ts"] % 1000).sort_values(
                ["ts_ns", "event_id"], kind="mergesort"
            )
            for eid, ts_ns, v in zip(pdf["event_id"], pdf["ts_ns"], pdf["value"]):
                v = float(v)
                if prev is not None and (
                    (prev <= theta < v) or (v <= theta < prev)
                ):
                    out["event_id"].append(int(eid))
                    out["ts_ns"].append(int(ts_ns))
                    out["prev_value"].append(prev)
                    out["value"].append(v)
                    out["direction"].append("rise" if v > theta else "fall")
                prev = v
        if prev is not None:
            state.update((prev,))
        yield pd.DataFrame({"user_id": [int(key[0])] * len(out["event_id"]), **out})

    return events.groupBy("user_id").applyInPandasWithState(
        update, CROSSING_SCHEMA, _CROSSING_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


CONC_SCHEMA = "event_type string, ts_ns long, peak long"
_CONC_STATE_SCHEMA = "ends array<long>, peak long"
_CONC_HOLD_NS = 300_000_000_000  # x23's 5-minute activity window


def concurrency_stream(events: DataFrame) -> DataFrame:
    """X23-stream: continuous peak-concurrency tracking — the streaming
    twin of the batch ``x23_max_concurrency`` sweep line. Each event
    opens a 5-minute interval; a row is emitted whenever a series sets
    a NEW peak of simultaneously-open intervals (capacity alerts fire
    on these rows, silence otherwise). State per event_type is the list
    of still-open interval end-times plus the running peak — bounded by
    the peak concurrency itself (never by stream length): open ends
    older than the hold window are pruned as event time advances.

    Batch path: the same pointized ±1 running count over a ROWS frame
    ordered (t, d, event_id) — processing order identical to the
    stream's (ends at t close before a start at t counts itself) — with
    new-peak rows selected against the running max so far. The
    equivalence test compares the two event-for-event.
    """
    if not events.isStreaming:
        from pyspark.sql import Window

        ts_us = F.col("ts") - F.col("ts") % 1000
        base = events.select(
            "event_type", ts_us.alias("t"), F.col("event_id").alias("eid")
        )
        pts = base.select(
            "event_type", "t", F.lit(1).alias("d"), "eid"
        ).unionByName(
            base.select(
                "event_type",
                (F.col("t") + F.lit(_CONC_HOLD_NS)).alias("t"),
                F.lit(-1).alias("d"),
                "eid",
            )
        )
        wo = Window.partitionBy("event_type").orderBy("t", "d", "eid")
        run = pts.select(
            "event_type",
            "t",
            "d",
            "eid",
            F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        ).withColumn(
            "prev_max",
            F.max("c").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
        )
        return run.where(
            (F.col("d") == 1)
            & (F.col("prev_max").isNull() | (F.col("c") > F.col("prev_max")))
        ).select(
            "event_type", F.col("t").alias("ts_ns"), F.col("c").cast("long").alias("peak")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            ends, peak = list(state.get[0]), int(state.get[1])
        else:
            ends, peak = [], 0
        out_ts, out_peak = [], []
        # Concatenate ALL Arrow chunks before sorting: a group's rows can
        # span chunks within a micro-batch, and the interval pruning is
        # order-sensitive — per-chunk sorting would process events out of
        # time order across chunk boundaries.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.assign(ts_us=pdf["ts"] - pdf["ts"] % 1000).sort_values(
                ["ts_us", "event_id"], kind="mergesort"
            )
            for t in pdf["ts_us"]:
                t = int(t)
                ends = [e for e in ends if e > t]  # close expired intervals first
                ends.append(t + _CONC_HOLD_NS)
                if len(ends) > peak:
                    peak = len(ends)
                    out_ts.append(t)
                    out_peak.append(peak)
        state.update((ends, peak))
        yield pd.DataFrame(
            {
                "event_type": [str(key[0])] * len(out_ts),
                "ts_ns": out_ts,
                "peak": out_peak,
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, CONC_SCHEMA, _CONC_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
