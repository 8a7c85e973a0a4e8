"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata
structs, processed by Arrow-batched ``mapInPandas`` operators.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (``decode_media`` raises ``NotImplementedError`` unless
the deterministic fake decoder is requested) — but everything Spark-side is
real and tested: the binary column, the metadata struct schema, the
``mapInPandas`` batch iteration, the output schema contract, and the
partition behavior. Swapping the fake for PIL/ffmpeg changes one function.

Feature extraction computes from the actual bytes (length, head byte, a
mod-997 byte checksum) so the oracle can recompute the same values from the
source text column — proving the binary round-trip is lossless.
"""

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mpp_spark.queries import Query, register
from duckdb_mpp_spark.sources import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, head_byte int, checksum int, width int, height int"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct<source,lang,n_chars>).
    Stands in for reading real media blobs; the payload is the utf-8 bytes
    of the text column (deterministic, oracle-recomputable)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct("source", "lang", "n_chars").alias("meta"),
    )


# -- pluggable decoder registry ---------------------------------------------
#
# Decoders dispatch on a leading magic: register PIL/ffmpeg-backed decoders
# for real formats (b"\x89PNG", b"RIFF", ...) via ``register_decoder``; the
# built-in SGM codec below is a complete pure-Python format so the decode
# path is REAL (it parses a binary header + payload written by another
# function), not a stand-in — exercised end-to-end by ``multimodal_decode_sgm``.

SGM_MAGIC = b"SGM1"
_SGM_HEADER = struct.Struct(">4sHHB")  # magic, width, height, channels


def encode_sgm(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Serialize an SGM image: 9-byte header + width*height*channels bytes."""
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    return _SGM_HEADER.pack(SGM_MAGIC, width, height, channels) + pixels


def decode_sgm(payload: bytes) -> dict:
    """Parse an SGM image; raises ValueError on a corrupt header/payload."""
    if len(payload) < _SGM_HEADER.size:
        raise ValueError("payload shorter than SGM header")
    magic, width, height, channels = _SGM_HEADER.unpack(payload[: _SGM_HEADER.size])
    if magic != SGM_MAGIC:
        raise ValueError(f"bad SGM magic: {magic!r}")
    pixels = payload[_SGM_HEADER.size:]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"SGM pixel buffer is {len(pixels)} bytes, "
            f"header declares {width * height * channels}"
        )
    return {"width": width, "height": height, "channels": channels, "pixels": pixels}


_DECODERS: dict[bytes, Callable[[bytes], dict]] = {SGM_MAGIC: decode_sgm}


def register_decoder(magic: bytes, fn: Callable[[bytes], dict]) -> None:
    """Plug a real media decoder (e.g. PIL for b"\\x89PNG") into the
    dispatch table used by ``decode_media``."""
    _DECODERS[magic] = fn


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Decode a media payload by magic dispatch.

    ``fake=True`` keeps the legacy deterministic pseudo-dimension path for
    payloads with no media container (raw text bytes in the feature gate).
    Unknown magics raise NotImplementedError — real formats need their
    libraries registered via ``register_decoder``.
    """
    if fake:
        checksum = sum(payload) % 997
        return {"width": 64 + checksum % 64, "height": 64 + (checksum // 64) % 64}
    for magic, fn in _DECODERS.items():
        if payload[: len(magic)] == magic:
            return fn(payload)
    raise NotImplementedError(
        "no registered decoder for this payload format; register one with "
        "register_decoder(magic, fn) (image/audio libraries are not present "
        "in this environment)"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each batch arrives as a pandas DataFrame with the
    payload as Python bytes; output schema is declared up front. This is the
    pattern every real decode/resize/frame-sample operator uses — partition-
    parallel, no driver involvement, batch-sized memory footprint.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads (text=NULL upstream) behave as empty bytes —
            # len(None)/sum(None) would abort the whole task (review r4)
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            byte_len = payloads.map(len)
            head = payloads.map(lambda b: b[0] if len(b) else -1)
            checksum = payloads.map(lambda b: sum(b) % 997)
            dims = [decode_media(b, fake=True) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len,
                    "head_byte": head,
                    "checksum": checksum,
                    "width": [d["width"] for d in dims],
                    "height": [d["height"] for d in dims],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_BYTES = 16
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_checksum int"


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over binary payloads (the video-pipeline shape): each
    payload is treated as a sequence of fixed-size frames; every
    ``FRAME_STRIDE``-th frame is emitted as its own row. Demonstrates the
    1→N ``mapInPandas`` contract (input rows expand to variable-length
    outputs, batch by batch — no driver involvement, no full-video
    materialization; a real ffmpeg sampler streams exactly like this)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload if payload is not None else b""  # review r4
                for f in range(0, (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES, FRAME_STRIDE):
                    chunk = payload[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(f)
                    lens.append(len(chunk))
                    sums.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_checksum": sums}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub with real plumbing: output payload is deterministically
    resampled to exactly ``width*height`` bytes (byte-repeat/truncate stands
    in for pixel interpolation; swap the inner lambda for PIL's
    ``Image.resize`` in a real deployment). Schema contract: payload stays
    ``binary``; ``meta`` is REPLACED by the new dimensions (input meta
    describes the pre-resize payload and would be stale)."""
    if width < 1 or height < 1:
        # width*height == 0 silently truncated EVERY payload to zero bytes
        # (review r9) and negative values slice wrong-length buffers
        raise ValueError(
            f"resize_media dimensions must be >= 1, got {width}x{height}"
        )
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: (b * (target // max(len(b), 1) + 1))[:target] if b else bytes(target)
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": resized})

    out = df.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id bigint, payload binary"
    )
    return out.select(
        "doc_id",
        "payload",
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height")).alias("meta"),
    )


def encode_sgm_images(docs: DataFrame) -> DataFrame:
    """Build real SGM binary payloads from the corpus: dimensions derived
    from the text length, pixels cyclically resampled from the utf-8 bytes
    (deterministic, oracle-recomputable)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                # NULL/empty text encodes as a single zero byte so every doc
                # yields a well-formed image (review r4: ''.encode() made
                # target//len(b) a ZeroDivisionError; None crashed .encode)
                b = (text or "").encode("utf-8") or b"\x00"
                w = 1 + len(b) % 16
                h = 1 + (len(b) // 16) % 16
                target = w * h
                pixels = (b * (target // len(b) + 1))[:target]
                payloads.append(encode_sgm(w, h, 1, pixels))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id bigint, payload binary"
    )


DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, n_pixels int, mean_pixel int"
)


def decode_sgm_features(df: DataFrame) -> DataFrame:
    """Decode SGM payloads through the pluggable decoder registry and emit
    per-image features — the real decode path (binary header parse +
    pixel-buffer validation), not the fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "width", "height", "channels", "n_pixels", "mean_pixel")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # Undecodable payloads (NULL / empty / unknown magic) emit
                # a NULL-feature row instead of killing the task (review
                # r9: the old guard substituted b"" for None, but an empty
                # buffer matches NO decoder magic, so decode_media raised
                # NotImplementedError inside mapInPandas and one
                # fetch-failure doc aborted the whole 100 TB pass — the
                # same one-bad-row principle as the GEMM NULL guards).
                try:
                    img = decode_media(payload if payload is not None else b"")
                except (NotImplementedError, ValueError):
                    # ValueError too (hostile sweep r11): a CORRUPT payload
                    # whose magic matches a registered decoder (truncated
                    # pixel buffer, short header, channels overflow) raised
                    # out of decode_sgm and aborted the whole task — the
                    # exact one-bad-row failure the NotImplementedError
                    # guard was added for, reachable by any bit-rotted blob
                    # in a real crawl.
                    rows["doc_id"].append(doc_id)
                    for k in ("width", "height", "channels", "n_pixels", "mean_pixel"):
                        rows[k].append(None)
                    continue
                n = img["width"] * img["height"] * img["channels"]
                rows["doc_id"].append(doc_id)
                rows["width"].append(img["width"])
                rows["height"].append(img["height"])
                rows["channels"].append(img["channels"])
                rows["n_pixels"].append(n)
                # zero-area images are header-valid (0 == w*h*c); their mean
                # is defined as 0 rather than dividing by zero (review r4)
                rows["mean_pixel"].append(sum(img["pixels"]) // n if n else 0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def _register():
    def features_fn(spark, sf_dir):
        # ordered_result exchange=True (r13): the range sort's bound
        # sampling re-executed the whole mapInPandas decode (the Python
        # kernel ran twice per query — the embedding_neardup finding);
        # barrier form keeps the kernel stage parallel
        from duckdb_mpp_spark.queries import ordered_result

        docs = load_table(spark, sf_dir, "documents")
        return ordered_result(
            extract_features(with_binary_payload(docs)),
            docs,
            "doc_id",
            exchange=True,
        )

    # the oracle recomputes the byte-level features from the text column
    # (the corpus is ASCII, so char codes == utf-8 bytes — asserted by the
    # byte_len == length(text) match itself)
    register(
        "multimodal_binary_features",
        Query(
            spark=features_fn,
            oracle="""
            -- LEFT JOIN LATERAL keeps zero-length/NULL docs (Spark emits a
            -- feature row for them too), and the series bound is the doc's
            -- own length — no silent 100k-char checksum cap (review r4)
            WITH bytes AS (
              SELECT d.doc_id,
                     CAST(COALESCE(length(d.text), 0) AS INT) AS byte_len,
                     CAST(CASE WHEN COALESCE(length(d.text), 0) > 0
                               THEN ord(substring(d.text, 1, 1)) ELSE -1 END AS INT)
                       AS head_byte,
                     CAST(COALESCE(SUM(ord(substring(d.text, t.i, 1))), 0) % 997 AS INT)
                       AS checksum
              FROM documents d
              LEFT JOIN LATERAL (SELECT unnest(range(1, length(d.text) + 1)) AS i) t
                ON TRUE
              GROUP BY d.doc_id, d.text
            )
            SELECT doc_id, byte_len, head_byte, checksum,
                   CAST(64 + checksum % 64 AS INT) AS width,
                   CAST(64 + (checksum // 64) % 64 AS INT) AS height
            FROM bytes ORDER BY doc_id
            """,
        ),
    )

    def decode_fn(spark, sf_dir):
        # ordered_result exchange=True (r13): see features_fn — the
        # encode+decode Python kernels ran twice under the sampling sort
        from duckdb_mpp_spark.queries import ordered_result

        docs = load_table(spark, sf_dir, "documents")
        return ordered_result(
            decode_sgm_features(encode_sgm_images(docs)),
            docs,
            "doc_id",
            exchange=True,
        )

    # encode→decode happens only Spark-side (binary header round-trip); the
    # oracle recomputes the expected features straight from the text column —
    # a hash match proves the decoder parsed exactly what the encoder wrote.
    register(
        "multimodal_decode_sgm",
        Query(
            spark=decode_fn,
            oracle="""
            -- NULL/empty text mirrors the encoder's single-zero-byte
            -- placeholder; the pixel series bound is w*h itself (>= 1), not
            -- a silent 100k cap (review r4)
            WITH src AS (
              SELECT doc_id, COALESCE(text, '') AS text,
                     GREATEST(COALESCE(length(text), 0), 1) AS lb
              FROM documents
            ),
            dims AS (
              SELECT doc_id, text, lb,
                     1 + lb % 16 AS w,
                     1 + (lb // 16) % 16 AS h
              FROM src
            ),
            pix AS (
              SELECT doc_id, w, h,
                     SUM(CASE WHEN length(text) = 0 THEN 0
                              ELSE ord(substring(text, ((i.i - 1) % lb) + 1, 1)) END) AS s
              FROM dims, LATERAL (SELECT unnest(range(1, w * h + 1)) AS i) i
              GROUP BY doc_id, w, h
            )
            SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   1 AS channels, CAST(w * h AS INT) AS n_pixels,
                   CAST(s // (w * h) AS INT) AS mean_pixel
            FROM pix ORDER BY doc_id
            """,
        ),
    )

    def frames_fn(spark, sf_dir):
        # ordered_result exchange=True (r13): see features_fn
        from duckdb_mpp_spark.queries import ordered_result

        docs = load_table(spark, sf_dir, "documents")
        return ordered_result(
            sample_frames(with_binary_payload(docs)),
            docs,
            "doc_id",
            "frame_idx",
            exchange=True,
        )

    register(
        "multimodal_frame_sample",
        Query(
            spark=frames_fn,
            oracle=f"""
            -- series bound derives from the doc's own frame count — no
            -- silent 100k-frame (1.6 MB payload) cap (review r4); NULL text
            -- yields generate_series over NULL = no frames, matching Spark
            WITH frames AS (
              SELECT d.doc_id, f.f AS frame_idx,
                     substring(d.text, f.f * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
              FROM documents d,
                   LATERAL (SELECT unnest(range(
                     0, (length(d.text) + {FRAME_BYTES} - 1) // {FRAME_BYTES}
                   )) AS f) f
              WHERE f.f % {FRAME_STRIDE} = 0
            )
            SELECT fr.doc_id, CAST(fr.frame_idx AS INT) AS frame_idx,
                   CAST(length(fr.chunk) AS INT) AS frame_len,
                   CAST(SUM(ord(substring(fr.chunk, i.i, 1))) % 997 AS INT) AS frame_checksum
            FROM frames fr, generate_series(1, {FRAME_BYTES}) i(i)
            WHERE i.i <= length(fr.chunk)
            GROUP BY fr.doc_id, fr.frame_idx, fr.chunk
            ORDER BY doc_id, frame_idx
            """,
        ),
    )


_register()
