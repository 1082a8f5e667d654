"""Benchmark-contamination screening: exact token-subsequence search.

"Which documents contain this benchmark prompt verbatim?" is a standard
training-data hygiene pass.  At 100 TB it is an embarrassingly parallel,
shuffle-free scan — here one ``mapInArrow`` stage whose kernel is a
vectorized sliding-window compare over the *flattened* Arrow values buffer
(k numpy vector ops for a k-token needle, zero per-row Python).  Matches
that straddle two documents are masked out via the list offsets, so a
needle can never "match" across row boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame


def find_needle(
    df: DataFrame,
    needle: list[int],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """→ ``(doc_id, n_matches int, first_pos int)`` for docs containing
    ``needle`` as a contiguous subsequence of ``tokens_col``.

    ``first_pos`` is the 0-based token offset of the first occurrence;
    overlapping occurrences all count (n_matches).
    """
    if not needle:
        raise ValueError("needle must contain at least one token id")
    needle_arr = np.asarray(list(needle), dtype=np.int64)
    k = len(needle_arr)
    src = df.select(id_col, tokens_col)
    id_field = src.schema[id_col].dataType.simpleString()

    def scan(batches):
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0)
            toks = batch.column(1)
            lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy().astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            n_win = len(flat) - k + 1
            if n_win > 0:
                m = flat[:n_win] == needle_arr[0]
                for j in range(1, k):
                    m &= flat[j : n_win + j] == needle_arr[j]
                pos = np.flatnonzero(m)
            else:
                pos = np.empty(0, dtype=np.int64)
            row = np.searchsorted(offs, pos, side="right") - 1
            keep = pos + k <= offs[row + 1]  # no cross-document matches
            pos, row = pos[keep], row[keep]
            if len(pos) == 0:
                continue
            counts = np.bincount(row, minlength=batch.num_rows)
            first = np.full(batch.num_rows, -1, dtype=np.int64)
            first[row[::-1]] = pos[::-1] - offs[row[::-1]]  # reverse → first wins
            hit = np.flatnonzero(counts > 0)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(hit)),
                    pa.array(counts[hit], type=pa.int32()),
                    pa.array(first[hit], type=pa.int32()),
                ],
                names=[id_col, "n_matches", "first_pos"],
            )

    return src.mapInArrow(scan, f"{id_col} {id_field}, n_matches int, first_pos int")
