"""Synthetic request timing for the fetch_log lineage columns.

The reference tracks per-request start/end/duration
(`/root/reference/pkg/scraper/requestTracker.go:14-27`, serialized at
`requestTracker.go:49-112`; StartAt stamped in OnRequest,
`scraper.go:119`). The sandbox "fetch" is a table join, so wall-clock
timing would be nondeterministic and meaningless; instead timings are
derived deterministically from md5(url) — the same discipline the rest
of datagen uses — bounded by the reference's 30 s request timeout
(`scraper.go:92-99`). Both derivations are expressible in DuckDB
(`('0x' || substr(md5(url), ...))::BIGINT`) so oracle twins can check
them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# 2021-01-01 00:00:00 UTC — fixed epoch base for synthetic timelines
T0_EPOCH_MS = 1_609_459_200_000
ROUND_MS = 60_000  # one crawl round occupies a one-minute window
MAX_DURATION_MS = 29_950  # stay under the 30 s timeout (scraper.go:92-99)


def _hex_slice(col, start: int, width: int):
    """Integer value of md5(col)[start:start+width] (1-indexed)."""
    return F.conv(F.substring(F.md5(col), start, width), 16, 10).cast("long")


def synthetic_duration_ms(url_col) -> "F.Column":
    """Deterministic per-url request duration in [50, 30000) ms."""
    return F.lit(50) + _hex_slice(url_col, 7, 6) % MAX_DURATION_MS


def synthetic_start_offset_ms(url_col) -> "F.Column":
    """Deterministic per-url start offset within the round window."""
    return _hex_slice(url_col, 1, 6) % ROUND_MS


def request_timing(url_col, round_col):
    """(start_at, end_at, duration_ms) columns for a fetch-log row."""
    start_ms = (
        F.lit(T0_EPOCH_MS)
        + round_col.cast("long") * ROUND_MS
        + synthetic_start_offset_ms(url_col)
    )
    dur = synthetic_duration_ms(url_col)
    return (
        F.timestamp_millis(start_ms).alias("start_at"),
        F.timestamp_millis(start_ms + dur).alias("end_at"),
        dur.alias("duration_ms"),
    )
