"""Streaming mergeable count-min sketch with DELTA emission.

The batch twin (``corpus_cms_heavy_hitters``) builds a 3×32 CMS
relationally; this operator maintains the same sketch continuously over a
domain stream. The append-sink problem with streaming sketches is that a
sketch is a running TOTAL — re-emitting it per micro-batch would double-
count in any downstream sum. The CMS's mergeability is the fix: emit only
each batch's counter DELTAS (themselves a valid CMS of just that batch);
any consumer reconstructs the running sketch — or a sketch over any time
range — by summing emitted deltas counter-wise. That makes the operator
exactly-once-composable end to end: drained deltas sum to EXACTLY the
batch-built sketch (asserted in tests/test_stream_sketch.py).

Sharding: keys are ``pmod(h(domain), n_shards)`` so state per group is one
(d, w) counter array; a global sketch is the counter-wise sum across
shards — also just the delta sum, since shards partition the domains. The
per-group state is fixed-size (d·w longs) regardless of domain
cardinality: the whole point of sketching a 10^12-page crawl.

Hash family: the engine's md5-32 with per-row seeds — identical to the
batch twin, so estimates agree exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

CMS_D = 3
CMS_W = 32
N_SHARDS = 8

OUTPUT = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("r", IntegerType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("delta", LongType(), False),
    ]
)

STATE = StructType([StructField("counters", ArrayType(LongType()), False)])


def h32(s: str, seed: str = "") -> int:
    """The engine's cross-dialect 32-bit hash (queries.py _h32_*)."""
    return int(hashlib.md5((seed + s).encode()).hexdigest()[:8], 16)


def cms_coords(domain: str) -> list[tuple[int, int]]:
    """(row, bucket) per CMS row — same family as the batch twin."""
    return [(r, h32(domain, seed=f"cms{r}|") % CMS_W) for r in range(CMS_D)]


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (shard,) = key
    counters = list(state.get[0]) if state.exists else [0] * (CMS_D * CMS_W)
    delta = [0] * (CMS_D * CMS_W)
    for pdf in pdfs:
        for domain in pdf["domain"]:
            for r, b in cms_coords(domain):
                delta[r * CMS_W + b] += 1
    if any(delta):
        for i, dv in enumerate(delta):
            counters[i] += dv
        state.update((counters,))
        yield pd.DataFrame(
            [
                {"shard": shard, "r": i // CMS_W, "bucket": i % CMS_W, "delta": dv}
                for i, dv in enumerate(delta)
                if dv
            ]
        )


def sketch_stream(domain_stream: DataFrame) -> DataFrame:
    """domain stream (one ``domain`` string column) → CMS counter deltas
    per micro-batch, sharded on h(domain) % N_SHARDS."""
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("shard|"), F.col("domain"))), 1, 8), 16, 10)
        .cast("long"),
        F.lit(N_SHARDS),
    ).cast("int")
    return (
        domain_stream.select(shard.alias("shard"), "domain")
        .groupBy("shard")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT,
            stateStructType=STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
