"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the schema, partitioning, UDF signature, and batch shape
are real; only the codec call itself is stubbed (image/audio libraries are
not in this container), clearly marked below.

Scale posture:
- payload bytes travel **once** (scan → decode); metadata-only queries
  never touch the binary column thanks to parquet column pruning;
- decode parallelism = partition count; each Arrow batch keeps a bounded
  byte budget (repartition upstream on payload size when skewed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_binary_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: payload
    as binary + typed metadata (what an image/audio lake row looks like)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def payload_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata projection — flat columns for the oracle check. Reads only
    payload-derived fields; at scale this is a pruned scan."""
    bt = to_binary_table(df, id_col)
    return bt.select(
        id_col,
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha256").alias("payload_sha256"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Decode/feature-extract via mapInPandas (the multimodal slow path,
    Arrow-batched).

    The kernel is a closure (not a module-level function) so cloudpickle
    ships it by value — Python workers need no importable copy of this
    package regardless of where the driver process started.
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB: a real deployment calls the codec here (PIL/librosa/pyav)
        # on ``payload``. Those libs are absent in this container, so we
        # emit a deterministic fake: 8 'frames' summarised by the first 8
        # payload bytes scaled to [0,1). The batch plumbing (Arrow in/out,
        # vectorized per batch, bounded memory) is the real thing.
        import pandas as _pd

        for pdf in batches:
            feats = []
            lens = []
            for buf in pdf["payload"]:
                b = bytes(buf)
                lens.append(len(b))
                head = (b + b"\x00" * 8)[:8]
                feats.append([x / 255.0 for x in head])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": _pd.Series(lens, dtype="int32"),
                    "n_frames": _pd.Series([8] * len(pdf), dtype="int32"),
                    "feature": feats,
                }
            )

    bt = to_binary_table(df, id_col, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "payload"
    )
    return bt.mapInPandas(decode_batch, schema=_DECODE_SCHEMA)
