"""Streaming heavy hitters: sharded Misra-Gries in keyed state.

The streaming twin of ``operators/training.py::text_heavy_hitters``.
Tokens are hash-sharded (`pmod(xxhash64(token), N_SHARDS)`) so each
shard owns a DISJOINT slice of the token space; one Misra-Gries
summary (k counters) lives in the state store per shard and is folded
forward every micro-batch via ``mg_update`` — MG is one-pass, so
resuming from stored counters is literally the same algorithm as a
single pass over the concatenated stream. Because shards partition
tokens, no cross-shard merge step (and no merge-error term) exists:
each token's estimate keeps the per-shard contract
``true - n_shard/(k+1) <= est <= true`` for any arrival order, which
is what tests/test_streaming_sketch.py asserts against exact counts.

State is O(N_SHARDS × k) counters total — fixed by configuration, not
by vocabulary — so the query runs forever at any token volume; shard
count scales parallelism, k scales accuracy. Each batch emits the
shard's current summary tagged with the running token count
(``n_seen``), so the latest summary per shard is identifiable in
update-mode sinks without end-of-stream detection.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import hashing as H
from ..operators.training import HH_K, mg_update

N_SHARDS = 8

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _mg_fn(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    if state.exists:
        toks, cnts, n_seen = state.get
        counts = dict(zip(toks, cnts))
    else:
        counts, n_seen = {}, 0

    for pdf in batches:
        col = pdf["token"]
        n_seen += len(col)
        mg_update(counts, col, HH_K)

    state.update((list(counts), [int(c) for c in counts.values()], n_seen))
    yield pd.DataFrame(
        {
            "shard": shard,
            "token": list(counts),
            "est_count": [int(c) for c in counts.values()],
            "n_seen": n_seen,
        }
    )


def heavy_hitters_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming docs frame → per-shard MG summaries, re-emitted each
    micro-batch with the shard's running token count."""
    toks = docs.select(
        F.explode(F.expr(H.tokens_sql(text_col, duck=False))).alias("token")
    )
    sharded = toks.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(N_SHARDS)).cast("bigint")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
