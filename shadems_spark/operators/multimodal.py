"""Multimodal column handling (SURVEY.md §2 M6): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
pandas functions via mapInPandas.

The decode libraries (PIL/librosa/av) are not in this container, so
the actual decode is STUBBED: ``decode_features(real_decode=True)``
raises NotImplementedError; the default path computes deterministic
byte-level features with the real Spark plumbing (schema, batching,
partitioning) so the pipeline shape is fully exercised and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor (stable driver contract).
FEATURE_SCHEMA = "doc_id long, kind string, n_bytes long, first_byte long, checksum long"


def blob_table(documents: DataFrame) -> DataFrame:
    """Model the corpus as a multimodal table: payload as binary +
    typed metadata struct (what an image/audio lakehouse column looks
    like: binary blob, media kind, source, declared size)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


def decode_features(blobs: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas —
    Arrow-batched, one pandas frame per partition chunk; this is the
    shape a real image-resize / audio-frame-sample UDF takes.

    real_decode=True is the gate for an actual media decoder (not
    available in this environment)."""
    if real_decode:
        raise NotImplementedError(
            "media decode libraries are not available in this container; "
            "run with real_decode=False for the deterministic byte-level path"
        )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blob = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": blob.map(len).astype("int64"),
                    "first_byte": blob.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    # cheap deterministic checksum: sum of bytes mod 2^31
                    "checksum": blob.map(lambda b: sum(b) % 2147483647).astype("int64"),
                }
            )

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)
