"""Deterministic (hash-gated) sampling for training-data pipelines.

``df.sample`` draws per-partition pseudo-random rows: the subset changes
with partitioning, retries, and cluster size.  A 100-TB pipeline needs the
opposite — membership as a pure function of the row key, so a re-run, a
resumed job, or a differently-sized cluster selects the SAME subset.  The
gate is ``pmod(xxhash64(seed, key), RES) < fraction·RES`` — one JVM-side
expression, fully pushdown-friendly, no per-row Python.

``fractions`` gives per-stratum rates (e.g. per ``source``/``lang``
mixing weights — the standard corpus-mixture operation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

RES = 1 << 20


def hash_sample(
    df: DataFrame,
    fraction: float | None = None,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    stratum_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (or per-stratum
    ``fractions`` keyed on ``stratum_col``).  Rows of unlisted strata are
    dropped (explicit mixture semantics)."""
    if (fraction is None) == (fractions is None):
        raise ValueError("pass exactly one of fraction / fractions")
    gate = F.pmod(F.xxhash64(F.lit(int(seed)), F.col(key_col)), F.lit(RES))
    if fraction is not None:
        return df.filter(gate < F.lit(int(round(fraction * RES))))
    if stratum_col is None:
        raise ValueError("fractions requires stratum_col")
    thresh = None
    for value, frac in sorted(fractions.items()):
        pred = F.col(stratum_col) == F.lit(value)
        t = F.lit(int(round(frac * RES)))
        thresh = F.when(pred, t) if thresh is None else thresh.when(pred, t)
    return df.filter(gate < thresh.otherwise(F.lit(0)))
