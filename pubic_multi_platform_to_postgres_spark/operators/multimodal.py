"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct
(media type, declared dims, …). Heavy per-item work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas`` —
the Spark-side contract (schema in/out, batch iteration, partition
sizing) is real and tested; the actual codec calls are STUBBED because
image/audio libraries are not in this container:

- ``decode_image_stub`` raises ``NotImplementedError`` (the honest stub),
- ``fake_decode`` computes deterministic pseudo-metadata from the bytes
  (length, first-byte, xxhash-like checksum) so pipelines and tests can
  run end-to-end.

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` modest so a partition of blobs fits
executor memory; never ``collect`` blobs; project metadata-only columns
before any join (Catalyst prunes the binary away when unused).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("declared_width", T.IntegerType()),
        T.StructField("declared_height", T.IntegerType()),
    ]
)


def with_media_meta(
    df: DataFrame,
    blob_col: str,
    media_type: str,
    out_col: str = "media_meta",
) -> DataFrame:
    """Attach the typed metadata struct next to a binary column."""
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
        ),
    )


def decode_image_stub(blob: bytes) -> dict:
    """Real decode entry point — requires an image codec library.

    STUB: decoding is intentionally not implemented in this container;
    swap in Pillow/torchvision/ffmpeg in a real deployment.
    """
    raise NotImplementedError(
        "image decoding requires a codec library not present in this environment"
    )


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a decoder: (n_bytes, first_byte, checksum).

    Lets the full mapInPandas pipeline execute and be asserted on without
    a codec; replace with :func:`decode_image_stub` wiring in production.
    """
    if blob is None or len(blob) == 0:
        return (0, -1, 0)
    checksum = 0
    for by in blob[:64]:  # bounded work per item, deterministic
        checksum = (checksum * 131 + by) % 1_000_000_007
    return (len(blob), blob[0], checksum)


DECODED_SCHEMA = "id long, n_bytes long, first_byte int, checksum long"


def decode_blobs(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    batch_decoder=fake_decode,
) -> DataFrame:
    """Run the (stubbed) decoder over every blob via ``mapInPandas``.

    Batch shape: the iterator yields Arrow record batches; each batch is
    decoded row-wise in Python but crosses the JVM↔Python boundary once
    per batch, not per row. Output schema is fixed (``DECODED_SCHEMA``) so
    Catalyst can plan downstream operators without inference.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["blob"].apply(batch_decoder)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": decoded.apply(lambda t: t[0]),
                    "first_byte": decoded.apply(lambda t: t[1]),
                    "checksum": decoded.apply(lambda t: t[2]),
                }
            )

    return cols.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    width: int,
    height: int,
) -> DataFrame:
    """Resize every image blob to (width, height) — decode/resize STUBBED.

    The stand-in "resize" emits a deterministic fixed-size payload (the
    first ``width·height // 64`` bytes, cycled) so batch shape, output
    schema (binary out!) and memory behavior are the real thing; swap the
    inner function for a Pillow/torchvision call in production. Output
    rows: (id, resized blob, width, height).
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    out_len = max(1, width * height // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b):
                if b is None or len(b) == 0:
                    return bytes(out_len)
                reps = out_len // len(b) + 1
                return (bytes(b) * reps)[:out_len]

            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "resized": pdf["blob"].apply(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return cols.mapInPandas(run, schema="id long, resized binary, width int, height int")


def sample_frames(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    frame_bytes: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Sample frames from every video blob — codec STUBBED, expansion real.

    One input row fans out to ``min(max_frames, n_bytes // frame_bytes)``
    frame rows — the row-expanding ``mapInPandas`` shape a real
    ffmpeg-backed sampler needs (yielded batches need not be 1:1 with
    input batches). The stand-in "frame" is the byte-slice at the frame's
    offset. Output: (frame_id, id, frame_idx, frame_offset, frame).
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for _, row in pdf.iterrows():
                blob = row["blob"]
                n = 0 if blob is None else len(blob)
                for i in range(min(max_frames, n // frame_bytes)):
                    ids.append(row["id"])
                    idxs.append(i)
                    offs.append(i * frame_bytes)
                    frames.append(bytes(blob[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "frame_id": [f"{a}_{b}" for a, b in zip(ids, idxs)],
                    "id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame": frames,
                }
            )

    return cols.mapInPandas(
        run,
        schema="frame_id string, id long, frame_idx int, frame_offset long, frame binary",
    )


def extract_features(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    dim: int = 16,
) -> DataFrame:
    """Feature-extract every blob into a dense ``array<float>`` — model
    STUBBED with a deterministic byte-histogram projection.

    The stand-in embedding is the L2-normalized histogram of byte values
    folded into ``dim`` buckets — deterministic, content-sensitive, and
    shaped exactly like a real encoder output, so the downstream
    similarity/dedup operators (``operators/similarity.py``) compose with
    it unchanged. Swap for a real model via the same mapInPandas contract
    (the model loads once per partition, not per row).
    """
    import numpy as np

    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real encoder would be constructed HERE, once per partition
        def embed(b):
            v = np.zeros(dim, dtype=np.float64)
            if b:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                np.add.at(v, arr % dim, 1.0)
                n = np.linalg.norm(v)
                if n > 0:
                    v /= n
            return [float(x) for x in v]

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"], "embedding": pdf["blob"].apply(embed)})

    return cols.mapInPandas(run, schema="id long, embedding array<float>")
