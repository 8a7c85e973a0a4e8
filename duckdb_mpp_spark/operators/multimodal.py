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

from collections.abc import Iterator

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


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Stub decoder. Real deployments plug PIL/torchaudio/ffmpeg in here.

    ``fake=True`` returns deterministic pseudo-dimensions derived from the
    byte checksum — keeps the full pipeline runnable and verifiable in this
    container.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    checksum = sum(payload) % 997
    return {"width": 64 + checksum % 64, "height": 64 + (checksum // 64) % 64}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each batch arrives as a pandas DataFrame with the
    payload as Python bytes; output schema is declared up front. This is the
    pattern every real decode/resize/frame-sample operator uses — partition-
    parallel, no driver involvement, batch-sized memory footprint.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
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
    ``binary``, meta gains the new dimensions."""
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


def _register():
    def features_fn(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return extract_features(with_binary_payload(docs)).orderBy("doc_id")

    # the oracle recomputes the byte-level features from the text column
    # (the corpus is ASCII, so char codes == utf-8 bytes — asserted by the
    # byte_len == length(text) match itself)
    register(
        "multimodal_binary_features",
        Query(
            spark=features_fn,
            oracle="""
            WITH bytes AS (
              SELECT d.doc_id,
                     CAST(length(d.text) AS INT) AS byte_len,
                     CAST(ord(substring(d.text, 1, 1)) AS INT) AS head_byte,
                     CAST(SUM(ord(substring(d.text, t.i, 1))) % 997 AS INT) AS checksum
              FROM documents d, generate_series(1, 100000) t(i)
              WHERE t.i <= length(d.text)
              GROUP BY d.doc_id, d.text
            )
            SELECT doc_id, byte_len, head_byte, checksum,
                   CAST(64 + checksum % 64 AS INT) AS width,
                   CAST(64 + (checksum // 64) % 64 AS INT) AS height
            FROM bytes ORDER BY doc_id
            """,
        ),
    )

    def frames_fn(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return sample_frames(with_binary_payload(docs)).orderBy("doc_id", "frame_idx")

    register(
        "multimodal_frame_sample",
        Query(
            spark=frames_fn,
            oracle=f"""
            WITH frames AS (
              SELECT d.doc_id, f.f AS frame_idx,
                     substring(d.text, f.f * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
              FROM documents d, generate_series(0, 100000) f(f)
              WHERE f.f * {FRAME_BYTES} < length(d.text) AND f.f % {FRAME_STRIDE} = 0
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
