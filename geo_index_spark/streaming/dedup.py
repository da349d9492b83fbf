"""Streaming exact dedup via ``applyInPandasWithState`` — the
continuous form of ``textops.dedup.exact_dedup`` for ingest pipelines
that cannot wait for a batch pass.

State per text fingerprint: (keep_id, n_copies). Each micro-batch folds
its rows into the group state and emits an UPDATE row
``(text_md5, doc_id, n_copies)`` — ``doc_id`` is the minimum id seen SO
FAR, so after all data is processed the latest update row per
fingerprint equals the batch operator's result exactly, independent of
how the stream was micro-batched (min and count are both
order-insensitive folds). Downstream treats the output as an upsert
keyed on ``text_md5``.

The shuffle key is the 16-byte md5, not the document (same discipline
as the batch operator); Arrow-batched, no per-row Python between
batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_copies", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("keep_id", LongType()), StructField("n", LongType())]
)


def _dedup_fn(id_col: str):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (text_md5,) = key
        keep_id, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            ids = pdf[id_col]
            if len(ids) == 0:
                continue
            m = int(ids.min())
            n += int(len(ids))
            if keep_id is None or m < keep_id:
                keep_id = m
        state.update((keep_id, n))
        yield pd.DataFrame(
            {"text_md5": [text_md5], "doc_id": [keep_id], "n_copies": [n]}
        )

    return fn


def stream_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stateful streaming dedup: update rows keyed on ``text_md5``; the
    latest row per key always equals ``exact_dedup`` over everything
    processed so far (min-id keeper, total copy count)."""
    keyed = docs.withColumn("text_md5", F.md5(F.col(text_col)))
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_fn(id_col),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
