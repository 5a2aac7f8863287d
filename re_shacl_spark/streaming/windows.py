"""Event-time windowed aggregation with watermarks — the late-data surface.

The reference is batch-only; a crawl/event feed arrives out of order, so the
hourly rollup (kgbench.q_rel_events_hourly is the batch analog) is exposed as
a Structured Streaming aggregation:

    events stream → withWatermark(ts, delay) → groupBy(window(ts, 1h), type)
    → append-mode parquet sink

Semantics under append mode (Spark's contract, relied on by the oracle):

* a window row is emitted exactly once, when the watermark passes the
  window's end — after that the window's state is evicted;
* an incoming event older than the current watermark is DROPPED (too late);
  an event newer than the watermark but belonging to a still-open (possibly
  past) window is folded in — the bounded-lateness guarantee;
* the watermark in effect for batch N is derived from data seen through
  batch N-1: ``wm = max(event_time) - delay``, monotone.

Scale shape: state is one row per (open window × type) — bounded by
``delay/window`` windows per key, NOT by stream length (contrast
streaming/stateful.py's deliberately unbounded seen-set); the groupBy
shuffles once per micro-batch on the (window, type) hash.  The sink only
ever receives finalized windows, so downstream readers need no dedup.

Flushing: ``Trigger.AvailableNow`` runs a trailing no-data micro-batch after
draining the files, so the watermark advanced by an invocation's own data
takes effect within that invocation — each drain emits exactly the windows
its data finalized.  A last drain with a single far-future sentinel event
finalizes every remaining real window (the sentinel's own window stays open
— its watermark lands ``delay`` before it — and is never emitted): the
standard closing pattern for bounded replays of an unbounded design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _as_utc_instant(ts: str) -> F.Column:
    """timestamp_ntz wall time → TIMESTAMP instant, reading the wall time AS
    UTC — via field arithmetic (unix_date/hour/minute/second), because every
    cast between NTZ and TIMESTAMP goes through the session timezone and
    would shift hour buckets under half-hour-offset zones.  Sub-second
    precision is dropped: the instant only drives hour bucketing and a
    2-hour watermark."""
    epoch = (
        F.unix_date(F.to_date(ts)) * 86400
        + F.hour(ts) * 3600
        + F.minute(ts) * 60
        + F.second(ts)
    )
    return F.timestamp_seconds(epoch)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming (or batch) frame → per-(window, event_type) rollup keyed by
    ``win_start`` (epoch seconds — timezone-free on both the engine and the
    oracle side).

    Money is summed in integer cents so the aggregate is order-insensitive
    and oracle-exact; count_distinct is unavailable in streaming aggs, so
    the user dimension is left to the batch rollup (rel_events_hourly)."""
    cents = F.round(F.col("value") * 100).cast("long")
    src = events.withColumn("ts_i", _as_utc_instant("ts"))
    if src.isStreaming:
        src = src.withWatermark("ts_i", watermark)
    return (
        src.groupBy(F.window("ts_i", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n_events",
            "sum_cents",
            "min_value",
            "max_value",
        )
    )


def run_window_increment(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> int:
    """Drain currently-unseen event files through the watermarked windowed
    aggregation into the append sink, exactly once, then stop.  Returns the
    number of finalized window rows written this invocation."""

    def sink_rows() -> int:
        try:
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    before = sink_rows()
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    q = (
        windowed_counts(stream, window, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink_rows() - before
