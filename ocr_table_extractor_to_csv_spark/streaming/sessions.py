"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 / brief: "applyInPandasWithState
for custom stateful operators").

The batch twin is the driver's ``sessionize`` query (window + lag + cumsum);
this is the streaming form: per-user state carries (last event epoch,
session count, event count) across micro-batches, a new session starts when
the idle gap exceeds ``gap_sec``.  With ``trigger(availableNow=True)`` and a
checkpoint the operator is incrementally exactly-once: a later invocation
processes only newly-arrived files and UPDATES the same per-user state.

Scale notes: state is a few longs per user_id, sharded by the state store
across executors; each micro-batch shuffles only (user_id)-grouped rows.
Events are sorted per group within a batch, so per-batch output is
arrival-order independent; cross-batch correctness relies on files arriving
in event-time order (the standard file-stream contract — a watermark +
drop-late policy would bound it for true event streams).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_epoch double, n_sessions long, n_events long"


def sessionize_stream(events: DataFrame, gap_sec: float = 1800.0) -> DataFrame:
    """events -> per-user running (n_sessions, n_events); one updated row
    per user per micro-batch (operator outputMode=update)."""
    gap = float(gap_sec)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = None, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        n_counted = 0
        for epoch in batch["epoch"]:
            epoch = float(epoch)
            if epoch != epoch:  # NaN (null/unparseable ts that slipped the
                continue  # upstream filter): counting it would poison
                # last_epoch forever ('epoch - NaN > gap' is always False)
            if last_epoch is None or epoch - last_epoch > gap:
                n_sessions += 1
            last_epoch = epoch
            n_counted += 1
        n_events += n_counted
        state.update((last_epoch, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return (
        # gaps computed on a JVM-side epoch column (unix_timestamp semantics,
        # session timezone) — pandas Timestamp.timestamp() treats tz-naive
        # values as UTC, which diverges from the batch window query across
        # DST transitions
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("epoch"),
        )
        # a null/unparseable ts has no event time: drop it here (it would
        # reach fn as NaN); fn also skips NaN defensively so state can never
        # be poisoned into a frozen session counter
        .where(F.col("epoch").isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_sec: float = 1800.0,
) -> None:
    """One availableNow pass: process newly-arrived event files and append
    each micro-batch's per-user updates stamped with the batch id (a file
    sink cannot upsert; readers take the latest batch per user, see
    ``read_latest_sessions``)."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize_stream(stream, gap_sec=gap_sec)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_latest_sessions(spark, out_dir: str) -> DataFrame:
    """Latest per-user counters from the append-only update log."""
    from pyspark.sql.window import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )
