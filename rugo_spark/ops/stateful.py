"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keeps a per-key seen-flag in the state store, so
a document id that arrived in any earlier micro-batch is dropped in later
ones — streaming exact dedup (the streaming complement of
``ops.dedup.exact_dedup``).  State is per doc-hash group; timeouts bound
state growth for true streams."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import DataFrame


OUTPUT_SCHEMA = "doc_id long, text string"
STATE_SCHEMA = "seen boolean"


def _dedup_fn(
    key: Any, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    first_rows = None
    for pdf in pdf_iter:
        if first_rows is None and len(pdf):
            first_rows = pdf.iloc[:1][["doc_id", "text"]]
    state.update((True,))
    if first_rows is not None:
        yield first_rows


def streaming_dedup(stream_df: DataFrame) -> DataFrame:
    """First occurrence of each doc_id survives; later arrivals (same or
    later micro-batches) are dropped via the keyed state store."""
    return stream_df.groupBy("doc_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
