"""Multimodal (image/audio/video) column plumbing for training-data
pipelines at 100 TB.

Media travel as opaque `binary` payload columns with typed metadata —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual pixel/sample decode is
STUBBED because no image/audio libraries ship in this container:

  - `decode_media_meta` — deterministic fake decoder: every metadata
    field is derived from md5(payload), so tests and the DuckDB oracle
    can verify the distributed plumbing bit-exactly.
  - `decode_image_real` — the real-decoder seam; raises
    NotImplementedError unless PIL is importable (import-gated, never a
    hard dependency).

Scale notes: payloads never leave the executor (mapInPandas streams
Arrow record batches); metadata extraction is one pass, no shuffle;
frame sampling explodes only (media_id, frame_no) pairs — frames stay
virtual until a downstream decode materializes them.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("source_url", StringType(), True),
    ]
)

MEDIA_META = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),  # audio/video
        StructField("n_frames", IntegerType(), True),  # video
    ]
)

KINDS = ["image", "audio", "video"]


def _meta_from_digest(kind: str, payload: bytes):
    """Deterministic fake decode: md5(payload) -> metadata fields.
    Mirrors ops.common.md5int (first 15 hex chars as an int) so the
    DuckDB oracle reproduces every value."""
    h = hashlib.md5(payload).hexdigest()
    x = int(h[:15], 16)
    width = 16 + x % 4096 if kind in ("image", "video") else None
    height = 16 + (x // 4096) % 4096 if kind in ("image", "video") else None
    duration = 1000 + x % 600_000 if kind in ("audio", "video") else None
    n_frames = 1 + x % 1800 if kind == "video" else None
    return h, width, height, duration, n_frames


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in (
            "media_id", "kind", "n_bytes", "content_hash",
            "width", "height", "duration_ms", "n_frames",
        )}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            h, w, ht, dur, nf = _meta_from_digest(kind, b)
            rows["media_id"].append(mid)
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(b))
            rows["content_hash"].append(h)
            rows["width"].append(w)
            rows["height"].append(ht)
            rows["duration_ms"].append(dur)
            rows["n_frames"].append(nf)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        out["n_frames"] = out["n_frames"].astype("Int32")
        yield out


def decode_media_meta(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload, …) -> MEDIA_META rows.
    Arrow-batched; payloads never cross to the driver."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _decode_batches, schema=MEDIA_META
    )


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real image decode seam — requires PIL (not in this container).
    Kept so the API surface shows where a production decoder plugs in."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs pillow; use decode_media_meta for the "
            "deterministic stub pipeline"
        ) from e
    raise NotImplementedError("real decoder not implemented in this sandbox")


def sample_frames(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index.

    Frames stay virtual — (media_id, frame_no) pairs only; a downstream
    decode UDF would seek into the payload per pair.  Native sequence +
    explode, no Python."""
    vids = meta.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_no"),
    )


def synth_media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Deterministic media table over the documents corpus: payload =
    UTF-8 bytes of the text (so DuckDB's md5(text) matches), kind cycles
    by id.  Stand-in for a real WARC media extraction."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col(id_col) % 3).cast("int") + 1,
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("string").alias("source_url"),
    )
