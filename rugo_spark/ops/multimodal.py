"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct.  The Spark-side plumbing — schema, size-balanced partitioning on
byte size, Arrow-batched UDF signatures, feature-vector shapes — is real
and tested; the actual media *decode* is stubbed (the sandbox has no
image/audio libraries): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, which produces a deterministic hash-derived feature
vector so the distributed pipeline can be exercised end to end.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "asset_id string, media binary, media_type string, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 64


def synth_media_df(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    import pandas as pd

    rng = np.random.default_rng(np.random.SeedSequence([seed, n]))
    kinds = np.array(["image/png", "audio/wav", "video/mp4"])
    sizes = rng.integers(128, 4096, n)
    pdf = pd.DataFrame(
        {
            "asset_id": [f"asset-{i:08d}" for i in range(n)],
            "media": [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes],
            "media_type": kinds[rng.integers(0, 3, n)],
            "width": rng.integers(16, 1920, n).astype("int32"),
            "height": rng.integers(16, 1080, n).astype("int32"),
            "n_frames": rng.integers(1, 300, n).astype("int32"),
            "sample_rate": rng.integers(8000, 48000, n).astype("int32"),
        }
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real image decode requires a codec library not present in this
    environment.  The Spark plumbing around it is real; swap this function
    for a PIL/libvips call in production."""
    raise NotImplementedError("image decode requires an image library (PIL/vips)")


def _fake_features(data: np.ndarray, starts: np.ndarray, lens: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic hash-derived feature matrix (n, dim) — vectorized."""
    n = len(lens)
    feats = np.zeros((n, dim), dtype=np.float32)
    for k in range(dim):  # dim passes over byte stream, no per-row python
        idx = starts + (k * 131) % np.maximum(lens, 1)
        m = lens > 0
        feats[m, k] = data[idx[m]].astype(np.float32) / 255.0
    return feats


def extract_features(
    df: DataFrame, fake: bool = True, dim: int = FEATURE_DIM,
    media_col: str = "media", id_col: str = "asset_id",
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Plan shape for scale: media blobs are partitioned by byte size (same
    cumulative-mass planner as the encode engine would be used upstream);
    each task processes Arrow batches; output is ``array<float>`` features.
    """
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            media = batch.column(1)
            if isinstance(media, pa.ChunkedArray):
                media = media.combine_chunks()
            bufs = media.buffers()
            offs = np.frombuffer(bufs[1], np.int32, count=len(media) + 1, offset=media.offset * 4).astype(np.int64)
            data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
            lens = np.diff(offs)
            if not fake:
                raise NotImplementedError("real media decode not available in this environment")
            feats = _fake_features(data, offs[:-1], lens, dim)
            flat = pa.array(feats.ravel(), type=pa.float32())
            arr = pa.FixedSizeListArray.from_arrays(flat, dim).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays([ids, arr], names=[batch.schema.names[0], "features"])

    return df.select(id_col, media_col).mapInArrow(kernel, f"{id_col} string, features array<float>")


def _check_single_row_overflow(num_rows: int, n_out: int) -> None:
    """Halving a 1-row batch re-enters the kernel with the same batch — if a
    SINGLE row's target still overflows the int32 offset budget there is no
    split that helps; fail with a clear error instead of recursing forever
    (ADVICE r3).  A >2 GiB single output would need ``large_binary``."""
    if num_rows == 1 and 2 * n_out > np.iinfo(np.int32).max:
        raise ValueError(
            f"resize target of {n_out} bytes per row exceeds the int32 "
            "offset budget of pa.binary() even for a single-row batch; "
            "use a smaller target (or a large_binary variant)"
        )


def resize_media(
    df: DataFrame, target_w: int = 64, target_h: int = 64,
    media_col: str = "media", id_col: str = "asset_id", fake: bool = True,
) -> DataFrame:
    """Resize plumbing over the opaque binary column: batch-vectorized
    mapInArrow, binary in → binary out + updated (width, height) metadata.

    Real pixel decode/resample is stubbed like ``decode_image`` (no image
    libs in this sandbox); ``fake=True`` produces a deterministic
    stride-sampled byte grid of exactly ``target_w·target_h`` bytes from the
    payload — the schema, batching and output shape are the production
    contract, the resample kernel is the swap-in point for PIL/vips."""
    import pyarrow as pa

    n_out = target_w * target_h

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            media = batch.column(1)
            if isinstance(media, pa.ChunkedArray):
                media = media.combine_chunks()
            if not fake:
                raise NotImplementedError("real media resize requires an image library")
            if (batch.num_rows + 1) * n_out > np.iinfo(np.int32).max:
                # pa.binary() offsets are int32: a big batch × big target
                # would overflow and corrupt the offsets — split the batch
                # into int32-safe halves first
                _check_single_row_overflow(batch.num_rows, n_out)
                half = max(1, batch.num_rows // 2)
                yield from kernel([batch.slice(0, half)])
                yield from kernel([batch.slice(half)])
                continue
            bufs = media.buffers()
            offs = np.frombuffer(bufs[1], np.int32, count=len(media) + 1, offset=media.offset * 4).astype(np.int64)
            data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
            lens = np.diff(offs)
            n = len(lens)
            # stride sampling: out[i, k] = payload[floor(k * len_i / n_out)]
            # — one 2-D gather for the whole batch, no per-row Python
            k = np.arange(n_out, dtype=np.int64)
            L = np.maximum(lens, 1)
            idx = offs[:-1, None] + (k[None, :] * L[:, None]) // n_out
            # empty payloads make idx land one past the data buffer (offs[i]
            # == len(data) for a trailing empty row); clamp before the gather
            # — the out[lens == 0] = 0 masking below overwrites those lanes
            idx = np.minimum(idx, max(len(data) - 1, 0))
            out = (
                data[idx]
                if n and len(data)
                else np.zeros((n, n_out), dtype=np.uint8)
            )
            if n:
                out[lens == 0] = 0
            flat = pa.py_buffer(out.tobytes())
            o = np.arange(0, (n + 1) * n_out, n_out, dtype=np.int32)
            arr = pa.Array.from_buffers(
                pa.binary(), n, [None, pa.py_buffer(o.tobytes()), flat]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    arr,
                    pa.array(np.full(n, target_w, dtype=np.int32)),
                    pa.array(np.full(n, target_h, dtype=np.int32)),
                ],
                names=[batch.schema.names[0], "media", "width", "height"],
            )

    return df.select(id_col, media_col).mapInArrow(
        kernel, f"{id_col} string, media binary, width int, height int"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video rows: expands (asset, n_frames) into
    (asset, frame_idx) rows with built-ins only — the decode of each frame
    would plug into ``extract_features``."""
    return (
        df.filter(F.col("media_type") == "video/mp4")
        .select(
            "asset_id",
            F.explode(
                # zero-frame (corrupt) videos yield no rows instead of
                # killing the job on sequence(0, -1)
                F.when(
                    F.coalesce(F.col("n_frames"), F.lit(0)) > 0,
                    F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("frame_idx"),
        )
    )
