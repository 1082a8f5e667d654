"""find_needle: exact token-subsequence search (contamination screen)."""

from __future__ import annotations

import pandas as pd
import pytest

from rugo_spark.ops.contamination import find_needle


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(rows)), "tokens": rows}),
        schema="doc_id long, tokens array<int>",
    )


def test_counts_and_first_pos(spark):
    df = _df(
        spark,
        [
            [1, 2, 3, 4, 5],        # one match at 1
            [2, 3, 2, 3, 4, 9],     # match at 2 only ([2,3,4])
            [9, 9, 9],              # none
            [2, 3, 4, 2, 3, 4],     # two matches, first at 0
        ],
    )
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in find_needle(df, [2, 3, 4]).collect()}
    assert got == {0: (1, 1), 1: (1, 2), 3: (2, 0)}


def test_no_cross_document_matches(spark):
    # ...,7,8 | 9,... must NOT match needle [7,8,9] across the boundary
    df = _df(spark, [[1, 7, 8], [9, 2, 3]])
    assert find_needle(df, [7, 8, 9]).count() == 0


def test_overlapping_occurrences_all_count(spark):
    df = _df(spark, [[5, 5, 5, 5]])
    row = find_needle(df, [5, 5]).first()
    assert (row["n_matches"], row["first_pos"]) == (3, 0)


def test_single_token_needle_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 1]), (1, None), (2, [])],
        schema="doc_id long, tokens array<int>",
    )
    got = {r["doc_id"]: r["n_matches"] for r in find_needle(df, [1]).collect()}
    assert got == {0: 2}


def test_empty_needle_rejected(spark):
    with pytest.raises(ValueError):
        find_needle(_df(spark, [[1]]), [])
