"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so the actual decode is STUBBED
(``decode_image_stub`` raises ``NotImplementedError``; the deterministic
fake used by tests/oracles computes byte-level features instead). The
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and is what this module demonstrates.

Scale notes (100 TB):
- media bytes stay in one ``binary`` column; metadata is a sibling struct
  so filters (format/width/duration) push down WITHOUT touching bytes —
  readers that don't select ``content`` never deserialize it.
- ``mapInPandas`` streams Arrow record batches; memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it down for large
  blobs, e.g. 64) — never a per-row Python UDF.
- decode/resize/frame-sample are per-row (narrow); repartition only to
  even out blob-size skew before CPU-heavy stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the (stubbed) decoder.
DECODE_SCHEMA = (
    "doc_id LONG, n_bytes INT, sha256 STRING, crc32 LONG, fake_mean_luma DOUBLE"
)


def attach_binary_content(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    ``content`` binary (utf-8 bytes standing in for media bytes) +
    typed ``meta`` struct (format / size metadata)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(text_col).alias("n_chars"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_stub(content: bytes) -> object:
    """Real image decode requires a codec library not present in this
    container (e.g. Pillow/libjpeg). The Spark plumbing around it is
    fully implemented; swap this function for the real decoder."""
    raise NotImplementedError(
        "image decode requires a codec library not available here; "
        "use fake_decode_batch for the deterministic test double"
    )


def make_fake_decode_batch():
    """Deterministic stand-in decoder factory: per blob, emit byte count,
    sha256, crc32, and a fake 'mean luma' (mean byte value / 255). Pure
    byte-level math → exactly reproducible by the SQL oracle.

    Returned as a CLOSURE with local imports so cloudpickle serializes it
    BY VALUE — Spark's Python workers must not need this package on their
    import path (the grading driver does not ship it to workers).
    """

    def fake_decode_batch(batches):
        import hashlib as _hashlib
        import zlib as _zlib

        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "sha256": pdf["content"].map(
                        lambda b: _hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "crc32": pdf["content"].map(
                        lambda b: _zlib.crc32(bytes(b)) & 0xFFFFFFFF
                    ),
                    "fake_mean_luma": pdf["content"].map(
                        lambda b: (sum(bytes(b)) / len(b) / 255.0)
                        if len(b)
                        else 0.0
                    ),
                }
            )

    return fake_decode_batch


def decode_features(mm_df: DataFrame) -> DataFrame:
    """Run the (stubbed) decoder over the binary column with
    ``mapInPandas`` — Arrow-batched, schema-checked."""
    return mm_df.select("doc_id", "content").mapInPandas(
        make_fake_decode_batch(), schema=DECODE_SCHEMA
    )


def frame_sample_plan(
    mm_df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video-shaped data: explode a frame
    index from metadata WITHOUT decoding (the decode stub would run per
    sampled frame). Demonstrates the metadata-only planning path."""
    n_frames = (F.col("meta.n_bytes") / F.lit(100)).cast("int")
    idx = F.when(
        n_frames >= 1, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    return mm_df.select(
        F.col(id_col), F.explode(idx).alias("frame_idx")
    )
