"""Streaming exact deduplication — the continuous twin of ``dedup_exact``.

A document stream is keyed by its canonicalized-content hash (identical
canonicalization to the batch twin: lower → trim → whitespace collapse →
md5, plans/queries.py dedup_exact) and only the FIRST document per hash is
emitted. State per key is a single boolean-plus-keeper row; with the
checkpoint it persists across restarts, so a hash emitted in one run is
never re-emitted by a later one (exactly-once dedup across drains —
asserted by the two-drain test).

Within one micro-batch the keeper is the min doc_id (the batch twin's
keep-min rule), so feeding the stream in doc_id order makes the emitted
rows EXACTLY the batch twin's keepers — row-for-row equality asserted in
tests/test_stream_dedup.py.

Scale notes (10^12 docs):
* State is one tiny row per DISTINCT hash — the inherent cost of exact
  global dedup; it shards across executors by the group key, the same
  16-byte-key shuffle the batch twin does once.
* When the duplicate horizon is bounded (re-crawl dups arrive within days
  of each other), the built-in ``dropDuplicatesWithinWatermark`` is the
  preferred bounded-state form — the engine ships it as
  ``stream_extract.stream_dedup_pages`` (state evicted past the
  watermark). This module is its unbounded-exact complement: the explicit
  ``applyInPandasWithState`` form pins the keep-min tiebreak and the
  cross-restart never-re-emit guarantee, which the watermark form cannot
  promise once dups span beyond the horizon — and it is the template the
  sessionizer/sketch operators share.
* Output is append-only by construction (a key emits at most once ever),
  so any downstream sink — parquet, Kafka, MERGE — composes without
  dedup-on-read.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT = StructType(
    [
        StructField("content_hash", StringType(), False),
        StructField("keep_doc_id", LongType(), False),
        StructField("lang", StringType(), True),
    ]
)

STATE = StructType([StructField("seen", BooleanType(), False)])


def _first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit the min-doc_id row for this hash unless the hash was already
    seen in ANY earlier micro-batch (state survives via the checkpoint)."""
    if state.exists:
        return  # already emitted in an earlier batch — drop everything
    best_id, best_lang = None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        i = pdf["doc_id"].idxmin()
        if best_id is None or int(pdf["doc_id"][i]) < best_id:
            best_id = int(pdf["doc_id"][i])
            best_lang = pdf["lang"][i]
    if best_id is None:
        return
    state.update((True,))
    yield pd.DataFrame(
        {"content_hash": [key[0]], "keep_doc_id": [best_id], "lang": [best_lang]}
    )


def content_hash(col):
    """The batch twin's canonicalization, importable so both sides and the
    tests share one definition."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """documents stream (doc_id, text, lang, …) → first-seen keeper rows."""
    keyed = docs.select(
        content_hash(F.col("text")).alias("content_hash"), "doc_id", "lang"
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
