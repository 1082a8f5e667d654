"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keeps a per-key seen-flag in the state store, so
a document id that arrived in any earlier micro-batch is dropped in later
ones — streaming exact dedup (the streaming complement of
``ops.dedup.exact_dedup``).  The output schema is derived from the input
stream (doc ids are strings in the engine's canonical token table and longs
in the test corpus — both work), and an optional ``state_ttl_ms`` arms a
processing-time timeout that expires idle keys so state stays bounded on a
true unbounded stream (without it, every key lives forever)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import DataFrame

STATE_SCHEMA = "seen boolean"


def _make_dedup_fn(out_cols: list[str], ttl_ms: int | None):
    def _dedup_fn(
        key: Any, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle key expired: forget it (bounded state)
            return
        already = state.exists
        first_rows = None
        for pdf in pdf_iter:
            if first_rows is None and len(pdf):
                first_rows = pdf.iloc[:1][out_cols]
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if not already and first_rows is not None:
            yield first_rows

    return _dedup_fn


def streaming_dedup(
    stream_df: DataFrame, id_col: str = "doc_id", state_ttl_ms: int | None = None
) -> DataFrame:
    """First occurrence of each ``id_col`` survives; later arrivals (same or
    later micro-batches) are dropped via the keyed state store.

    ``state_ttl_ms``: expire a key after this much processing-time
    inactivity — a re-arrival later than the TTL is treated as new.  The
    standard streaming-dedup trade: exactness within the window, bounded
    state beyond it."""
    out_cols = stream_df.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream_df.schema.fields)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(id_col).applyInPandasWithState(
        _make_dedup_fn(out_cols, state_ttl_ms),
        outputStructType=schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
