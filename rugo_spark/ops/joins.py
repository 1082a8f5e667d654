"""Custom join operators the DataFrame API lacks as primitives.

As-of join: the classic distributed formulation — union both sides tagged,
one shuffle on the key, and a window `last(..., ignorenulls)` carries the
most recent right-side row forward onto each left row.  No per-row Python,
single shuffle, scales like any window (partition by key; heavy keys are
time-sorted ranges, not cross products).

Range join: expand the interval side into fixed-width buckets (``sequence``
+ ``explode``), equi-join on bucket id, then exact residual filter — turns a
cross-join-with-filter into a hash join whose fan-out is interval_width /
bucket_size (Spark has no range-join optimizer rule in open source;
this is the standard manual strategy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_ts <= left_ts`` for the same ``key`` (pandas.merge_asof
    semantics, 'backward'). ``tolerance``: max allowed left_ts − right_ts
    (same type as the ts columns' difference), else no match."""
    lcols = left.columns
    # the right row rides as ONE struct so a single last(ignorenulls) carries
    # it atomically — per-column last() could mix values from different right
    # rows when the latest row holds NULL in one of right_cols
    rstruct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    rstruct_type = right.select(rstruct.alias("_r")).schema[0].dataType
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        rstruct.alias("_r"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal timestamps (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    ).filter(F.col("_is_left") == 1)
    if tolerance is not None:
        keep = F.col("_m").isNotNull() & ((F.col("_t") - F.col("_m.__ts")) <= tolerance)
        matched = matched.select(
            *lcols,
            *[F.when(keep, F.col(f"_m.{c}")).alias(c) for c in right_cols],
        )
    else:
        matched = matched.select(*lcols, *[F.col(f"_m.{c}").alias(c) for c in right_cols])
    return matched


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_size: float,
    how: str = "inner",
) -> DataFrame:
    """Join points to half-open intervals [lo, hi) via bucket expansion.

    Interval rows replicate once per covered bucket (bounded fan-out);
    points hash into one bucket; the equi-join on bucket id is a plain
    shuffle/broadcast hash join; an exact residual keeps semantics."""
    b = float(bucket_size)
    pts = points.withColumn("_bucket", F.floor(F.col(point_col) / b).cast("long"))
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor((F.col(hi_col) - F.lit(1e-12)) / b).cast("long"),
            )
        ),
    )
    hit = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    inner = pts.join(ivs, "_bucket", "inner").filter(hit).drop("_bucket")
    if how == "inner":
        return inner
    if how == "left":
        # post-join residual filtering breaks outer semantics (an unmatched
        # point's null lo/hi fails the filter and the row vanishes) — build
        # left = inner ∪ (points with NO matching interval, right cols null)
        unmatched = points.join(
            inner.select(*points.columns), points.columns, "left_anti"
        )
        for c in inner.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(inner.dtypes)[c]))
        return inner.unionByName(unmatched)
    raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
