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


def _bmp_codec():
    """Pure-stdlib BMP codec trio, built as NESTED functions so
    cloudpickle ships them BY VALUE inside the mapInPandas kernels —
    a module-level helper would pickle by reference and require
    ``pdcm_etl_spark`` to be importable on every Python worker (the
    external driver adds the repo to the DRIVER's sys.path only; the
    round-4 stub kernels were closure-only for exactly this reason).

    Returns (encode, decode, pixels):
    - encode(gray, w, h): real BMP writer — 24-bit uncompressed BI_RGB,
      BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows padded to 4
      bytes, grayscale stored as equal BGR triples;
    - decode(b): real parser — validates the 'BM' magic, reads the
      pixel-data offset / width / height / bpp from the headers, walks
      the padded bottom-up rows; returns (w, h, bpp, top-down row-major
      gray pixels). Raises on anything that isn't 24-bit BI_RGB;
    - pixels(text, n): deterministic pixel synth shared with the SQL
      oracle — pixel i = codepoint of char (i mod len) mod 256, zeros
      for empty text; char-wise so DuckDB's substr/ord matches.
    """
    import struct

    def encode(gray: list, w: int, h: int) -> bytes:
        row_raw = w * 3
        pad = (4 - row_raw % 4) % 4
        img_size = (row_raw + pad) * h
        offset = 14 + 40
        header = struct.pack("<2sIHHI", b"BM", offset + img_size, 0, 0, offset)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        rows = []
        for r in range(h - 1, -1, -1):  # bottom-up
            row = bytearray()
            for c in range(w):
                v = gray[r * w + c] & 0xFF
                row += bytes((v, v, v))  # B, G, R
            row += b"\x00" * pad
            rows.append(bytes(row))
        return header + info + b"".join(rows)

    def decode(b: bytes) -> tuple:
        if b[:2] != b"BM":
            raise ValueError("not a BMP payload")
        offset = struct.unpack_from("<I", b, 10)[0]
        _hdr_sz, w, h = struct.unpack_from("<Iii", b, 14)
        _planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP: bpp={bpp} compression={compression}"
            )
        row_raw = w * 3
        pad = (4 - row_raw % 4) % 4
        pixels = [0] * (w * h)
        for stored_row in range(h):
            r = h - 1 - stored_row  # bottom-up storage → top-down index
            base = offset + stored_row * (row_raw + pad)
            for c in range(w):
                pixels[r * w + c] = b[base + c * 3]  # blue channel
        return w, h, bpp, pixels

    def pixels(text: str, n: int) -> list:
        if not text:
            return [0] * n
        return [ord(text[i % len(text)]) % 256 for i in range(n)]

    return encode, decode, pixels


# module-level aliases for tests and direct use (still closure-typed, so
# any kernel capturing them serializes by value)
_bmp_encode, _bmp_decode, text_pixels = _bmp_codec()


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("mean_pixel_milli", T.LongType()),
        T.StructField("pixel_checksum", T.LongType()),
    ]
)


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Image decode/feature-extract via mapInPandas (the multimodal slow
    path, Arrow-batched) — with a REAL codec: each document is rendered
    into an actual BMP file (``_bmp_encode``; pixel values derived
    deterministically from the text) and the feature kernel byte-level
    PARSES that BMP back (``_bmp_decode``: magic, header fields, padded
    bottom-up rows) without ever seeing the source text. The stub era
    (rounds 1-4 shipped a first-8-bytes fake because PIL/librosa are
    absent here) is over: BMP needs only the stdlib.

    Features: header facts (width/height/bpp + total byte length) plus
    floor-mean pixel intensity in milli-units and a position-weighted
    pixel checksum Σ p_i·(i+1) — the checksum proves pixel ORDER survives
    the bottom-up encode/decode round trip, not just the value multiset.

    The kernels are closures so cloudpickle ships them by value; batch
    plumbing is Arrow in/out with bounded memory. Scale: payload bytes
    travel scan → encode → decode within one stage (no shuffle touches
    the binary column); parallelism = input partitions.
    """
    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "byte_len", "width", "height", "bpp",
                "mean_pixel_milli", "pixel_checksum",
            )}
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(buf)
                w, h, bpp, px = _bmp_decode(payload)
                out["doc_id"].append(int(did))
                out["byte_len"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["mean_pixel_milli"].append(sum(px) * 1000 // (w * h))
                out["pixel_checksum"].append(
                    sum(p * (i + 1) for i, p in enumerate(px))
                )
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(out["doc_id"], dtype="int64"),
                    "byte_len": _pd.Series(out["byte_len"], dtype="int32"),
                    "width": _pd.Series(out["width"], dtype="int32"),
                    "height": _pd.Series(out["height"], dtype="int32"),
                    "bpp": _pd.Series(out["bpp"], dtype="int32"),
                    "mean_pixel_milli": _pd.Series(
                        out["mean_pixel_milli"], dtype="int64"
                    ),
                    "pixel_checksum": _pd.Series(
                        out["pixel_checksum"], dtype="int64"
                    ),
                }
            )

    return encode_bmp(df, id_col, text_col, width, height).mapInPandas(
        decode_batch, schema=_DECODE_SCHEMA
    )


_BMP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def encode_bmp(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Render each document into a real BMP binary payload (pixels from
    ``text_pixels``) — the encoder half of the codec pipeline, its own
    mapInPandas stage so downstream consumers see ONLY (doc_id, binary):
    the decode stage structurally cannot peek at the source text. Both
    stages pipeline within one task — the payload never crosses a
    shuffle."""
    n_px = width * height

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = [
                _bmp_encode(text_pixels(txt or "", n_px), width, height)
                for txt in pdf["text"]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(encode_batch, schema=_BMP_SCHEMA)


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


def _wav_codec():
    """Pure-stdlib RIFF/WAV PCM codec trio — the audio counterpart of
    ``_bmp_codec`` (same closure-shipping rationale: cloudpickle must
    carry the kernels BY VALUE so Python workers never need the repo on
    their sys.path).

    Returns (encode, decode, samples):
    - encode(samples, rate): real WAV writer — RIFF header, canonical
      16-byte ``fmt `` chunk (PCM, mono, 16-bit), ``data`` chunk of
      little-endian int16 samples;
    - decode(b): real parser — validates RIFF/WAVE magic then WALKS THE
      CHUNK LIST (word-aligned, unknown chunks skipped — the part a
      fixed-offset reader gets wrong on real files), reads the fmt
      fields, unpacks the samples. Raises on anything that isn't
      16-bit mono PCM;
    - samples(text, n): deterministic sample synth shared with the SQL
      oracle — sample i = (codepoint of char (i mod len) mod 256)·257
      − 32768, exactly spanning int16; zeros for empty text.
    """
    import struct

    def encode(samples: list, rate: int) -> bytes:
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        datac = struct.pack("<4sI", b"data", len(data)) + data
        if len(data) % 2:  # word alignment pad (even here, kept for form)
            datac += b"\x00"
        riff = struct.pack(
            "<4sI4s", b"RIFF", 4 + len(fmt) + len(datac), b"WAVE"
        )
        return riff + fmt + datac

    def decode(b: bytes) -> tuple:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, rate, samples = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            sz = struct.unpack_from("<I", b, pos + 4)[0]
            body = b[pos + 8:pos + 8 + sz]
            if cid == b"fmt ":
                audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", body, 0
                )
                if audio_fmt != 1 or ch != 1 or bits != 16:
                    raise ValueError(
                        f"unsupported WAV: fmt={audio_fmt} ch={ch} bits={bits}"
                    )
            elif cid == b"data":
                samples = list(struct.unpack(f"<{sz // 2}h", body[: sz - sz % 2]))
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if rate is None or samples is None:
            raise ValueError("WAV missing fmt or data chunk")
        return rate, samples

    def samples(text: str, n: int) -> list:
        if not text:
            return [0] * n
        return [
            (ord(text[i % len(text)]) % 256) * 257 - 32768 for i in range(n)
        ]

    return encode, decode, samples


_wav_encode, _wav_decode, text_samples = _wav_codec()


_WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def encode_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_samples: int = 256,
    sample_rate: int = 16000,
) -> DataFrame:
    """Render each document into a real WAV binary payload (samples from
    ``text_samples``) — encoder half of the audio pipeline, its own
    mapInPandas stage so the feature stage sees ONLY (doc_id, binary).
    Both stages pipeline within one task; the payload never crosses a
    shuffle."""

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = [
                _wav_encode(text_samples(txt or "", n_samples), sample_rate)
                for txt in pdf["text"]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return src.mapInPandas(encode_batch, schema=_WAV_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("sample_checksum", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_samples: int = 256,
    sample_rate: int = 16000,
) -> DataFrame:
    """Audio decode/feature-extract via mapInPandas with a REAL codec:
    each document becomes an actual RIFF/WAV PCM file and the feature
    kernel byte-level parses it back (chunk walk, fmt fields, int16
    unpack) without ever seeing the source text — the audio twin of
    ``decode_features``. Integer-exact features: header facts, Σ|s|,
    peak |s|, sign-change count, and the position-weighted checksum
    Σ s_i·(i+1) that pins sample ORDER through the container round
    trip. Scale: payload bytes stay inside one stage; parallelism =
    input partitions; nothing shuffles."""

    def feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "byte_len", "sample_rate", "n_samples",
                "sum_abs", "peak", "zero_crossings", "sample_checksum",
            )}
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(buf)
                rate, ss = _wav_decode(payload)
                out["doc_id"].append(int(did))
                out["byte_len"].append(len(payload))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(ss))
                out["sum_abs"].append(sum(abs(s) for s in ss))
                out["peak"].append(max((abs(s) for s in ss), default=0))
                out["zero_crossings"].append(
                    sum(
                        1
                        for i in range(1, len(ss))
                        if (ss[i] < 0) != (ss[i - 1] < 0)
                    )
                )
                out["sample_checksum"].append(
                    sum(s * (i + 1) for i, s in enumerate(ss))
                )
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(out["doc_id"], dtype="int64"),
                    "byte_len": _pd.Series(out["byte_len"], dtype="int32"),
                    "sample_rate": _pd.Series(
                        out["sample_rate"], dtype="int32"
                    ),
                    "n_samples": _pd.Series(out["n_samples"], dtype="int32"),
                    "sum_abs": _pd.Series(out["sum_abs"], dtype="int64"),
                    "peak": _pd.Series(out["peak"], dtype="int32"),
                    "zero_crossings": _pd.Series(
                        out["zero_crossings"], dtype="int32"
                    ),
                    "sample_checksum": _pd.Series(
                        out["sample_checksum"], dtype="int64"
                    ),
                }
            )

    return encode_wav(df, id_col, text_col, n_samples, sample_rate).mapInPandas(
        feature_batch, schema=_AUDIO_SCHEMA
    )
