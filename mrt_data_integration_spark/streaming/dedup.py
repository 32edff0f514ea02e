"""Streaming exact deduplication (E3 × E6): the ingest-time twin of
``operators.dedup.exact_dedup``.

A 100 TB corpus is not built in one batch — it STREAMS in, and dropping
exact repeats at ingest is strictly cheaper than a later full-corpus
dedup pass (the duplicate never hits disk, never shuffles again). Two
shapes, picked by the duplicate-arrival contract:

- ``streaming_dedup_within_watermark``: duplicates arrive within a
  bounded event-time delay of the original (re-delivered messages,
  double-fired webhooks, crawler retries). Uses
  ``dropDuplicatesWithinWatermark`` — per-key state is EVICTED once the
  watermark passes, so state is O(keys per watermark window), bounded
  forever. The contract every production streaming dedup chooses.
- ``streaming_dedup_global``: duplicates can arrive arbitrarily late.
  ``dropDuplicates`` without watermark — exact over the whole stream but
  state grows O(distinct keys); only for bounded backfills (e.g. the
  availableNow re-ingest of a finite corpus), documented trade.

Dedup KEY is the content fingerprint (md5 of the payload), not the
message id — the same convention as the batch fingerprint dedup, so
batch and stream agree row-for-row (pinned by the batch==stream test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint(df: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Attach the content fingerprint (md5 over the payload columns)
    used as the dedup key.

    Fields are joined with an explicit unit-separator delimiter and
    NULLs mapped to a sentinel: an undelimited concat lets one field
    bleed into the next ((value=1.5, props='promo') would equal
    (value=NULL, props='1.5promo')) and concat_ws silently SKIPS nulls
    (a NULL field would hash like an absent one, colliding with the
    empty string), both of which wrongly dedup distinct payloads.
    \x1f cannot occur in a cast-to-string numeric/timestamp and is
    vanishingly rare in text --- same exposure class as the delimited
    band keys in operators/dedup.py."""
    sep = "\x1f"
    return df.withColumn(
        "__fp__",
        F.md5(
            F.concat_ws(
                sep,
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(sep + "NULL"))
                    for c in payload_cols
                ],
            )
        ),
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    payload_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each content fingerprint; duplicates
    arriving within ``delay`` (event time) of the original are dropped.
    State per key lives only until the watermark passes its event time —
    bounded state, unbounded stream."""
    return (
        fingerprint(stream, payload_cols)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__fp__"])
        .drop("__fp__")
    )


def streaming_dedup_global(
    stream: DataFrame, payload_cols: list[str]
) -> DataFrame:
    """Exact first-arrival-wins dedup with no time bound: state is
    O(distinct fingerprints) — use for finite re-ingests
    (``availableNow``), not open-ended streams."""
    return fingerprint(stream, payload_cols).dropDuplicates(["__fp__"]).drop(
        "__fp__"
    )
