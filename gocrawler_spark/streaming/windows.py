"""Windowed streaming aggregation with late-data handling.

The reference's only aggregate is the visitsCount counter
(scraper.go:195,237); its streaming form at crawl scale is a per-host
fetch rate over event-time windows — the operational metric a
politeness scheduler feeds on. This module is the watermarked
tumbling-window version: rows later than the watermark are dropped,
late-but-within-watermark rows still update their window — Spark's
bounded-state guarantee, so the aggregation state cannot grow with
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_rate_windows(
    stream_df: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "host",
) -> DataFrame:
    """Streaming (or batch) per-host fetch counts in tumbling event-time
    windows; with a streaming input the watermark bounds state and
    defines the too-late cutoff."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("fetches"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "fetches",
        )
    )
