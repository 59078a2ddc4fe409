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


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_head", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_bytes: int = 16,
    every_k: int = 4,
) -> DataFrame:
    """Frame sampling plumbing (video → every k-th frame): the payload is
    treated as consecutive ``frame_bytes``-sized frames and every k-th is
    emitted as its own row — the 1-row-in / N-rows-out mapInPandas batch
    shape a real pyav frame sampler uses. STUB: the 'frame' summary is
    its length + first byte (deterministic; a real deployment decodes
    here). Output rows scale with payload size, never corpus-wide state."""

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, fis, flens, fheads = [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    fr = b[fi * frame_bytes:(fi + 1) * frame_bytes]
                    ids.append(int(did))
                    fis.append(fi)
                    flens.append(len(fr))
                    fheads.append(fr[0])
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_index": _pd.Series(fis, dtype="int32"),
                    "frame_len": _pd.Series(flens, dtype="int32"),
                    "frame_head": _pd.Series(fheads, dtype="int32"),
                }
            )

    bt = to_binary_table(df, id_col, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "payload"
    )
    return bt.mapInPandas(sample_batch, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_len", T.IntegerType()),
        T.StructField("resized_len", T.IntegerType()),
        T.StructField("resized_prefix", T.StringType()),
    ]
)


def resize_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int = 4,
) -> DataFrame:
    """Resize plumbing (image downsample): keep every ``stride``-th
    payload byte — the 1:1 binary-in/binary-out mapInPandas shape of a
    real PIL resize, with the codec stubbed to byte striding. Output
    summarises the resized payload (lengths + an 8-byte prefix) so the
    result is oracle-comparable."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, olens, rlens, prefs = [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                rb = b[::stride]
                ids.append(int(did))
                olens.append(len(b))
                rlens.append(len(rb))
                prefs.append(rb[:8].decode("utf-8", "replace"))
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "orig_len": _pd.Series(olens, dtype="int32"),
                    "resized_len": _pd.Series(rlens, dtype="int32"),
                    "resized_prefix": prefs,
                }
            )

    bt = to_binary_table(df, id_col, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "payload"
    )
    return bt.mapInPandas(resize_batch, schema=_RESIZE_SCHEMA)


def payload_dedup(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup of binary payloads by content digest — the media
    twin of text ``exact_dup_groups``: a multimodal lake dedups images/
    audio on the blob's sha256 BEFORE any decode, so only 32-byte
    digests + ids ever shuffle (the payloads stay in their scan tasks —
    at 100 TB of media that is the entire game).

    Returns (payload_sha256, byte_len, keep_id, n_payloads) — one row
    per distinct blob.
    """
    bt = to_binary_table(df, id_col)
    return (
        bt.select(
            F.col("meta.sha256").alias("payload_sha256"),
            F.col("meta.byte_len").alias("byte_len"),
            F.col(id_col),
        )
        .groupBy("payload_sha256", "byte_len")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_payloads"),
        )
    )
