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


#: contracts for the resize / frame-sample stages.
RESIZED_SCHEMA = "doc_id long, width int, height int, pixels binary"
FRAME_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame binary"


def resize_images(blobs: DataFrame, width: int = 8, height: int = 8, real_decode: bool = False) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage: binary in,
    fixed-shape binary out (1:1 rows).  The decode+resample itself is
    STUBBED (no PIL here): the fake emits a deterministic w*h byte
    grid seeded from the payload, so downstream schema/partitioning/
    batch behavior is exercised for real.  A real implementation
    replaces only the inner loop with PIL.Image.open(...).resize()."""
    if real_decode:
        raise NotImplementedError("no image codec in this container")

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["blob"]:
                seed = (sum(b[:64]) + len(b)) % 251 if len(b) else 0
                # deterministic fake "pixels": (seed + i) mod 256 grid
                px = ((np.arange(width * height) + seed) % 256).astype(np.uint8)
                out.append(px.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return blobs.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(blobs: DataFrame, frame_bytes: int = 256, every_n: int = 4, real_decode: bool = False) -> DataFrame:
    """Video frame sampling as a 1:N mapInPandas stage — each input
    blob yields one OUTPUT ROW per sampled frame (the row-expanding
    shape a container demuxer takes; the pandas iterator contract
    allows ragged output frames).  Here a "frame" is a fixed-size byte
    window of the payload; a real implementation swaps in av/ffmpeg
    keyframe extraction and keeps every_n-th frame."""
    if real_decode:
        raise NotImplementedError("no video codec in this container")

    def frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                total = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                kept = list(range(0, total, every_n))
                for i in kept:
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(len(kept))
                    rows["frame"].append(bytes(b[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(frames, schema=FRAME_SCHEMA)


def decode_features_arrow(blobs: DataFrame, real_decode: bool = False) -> DataFrame:
    """decode_features' mapInArrow twin: the same byte-level feature
    extraction consuming raw ``pyarrow.RecordBatch``es.

    Genuinely buffer-level (ADVICE r03 called out the old
    to_pydict/from_pydict version as materializing every blob as
    Python objects): doc_id passes through as the input Arrow array,
    kind is a zero-copy struct-field view, and n_bytes / first_byte /
    checksum are computed with numpy directly over the BinaryArray's
    offsets+data buffers — no per-row Python, no bytes copies.  The
    output schema is declared explicitly so zero-row and all-empty
    batches keep the exact declared types instead of value-inferred
    ones.  Result-identical to decode_features (pinned in
    tests/test_llm_ops.py)."""
    if real_decode:
        raise NotImplementedError(
            "media decode libraries are not available in this container; "
            "run with real_decode=False for the deterministic byte-level path"
        )

    def extract(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("kind", pa.string()),
                ("n_bytes", pa.int64()),
                ("first_byte", pa.int64()),
                ("checksum", pa.int64()),
            ]
        )
        for batch in batches:
            if batch.num_rows == 0:
                yield pa.RecordBatch.from_pydict(
                    {f.name: [] for f in out_schema}, schema=out_schema
                )
                continue
            blob = batch.column("blob").combine_chunks() if isinstance(
                batch.column("blob"), pa.ChunkedArray
            ) else batch.column("blob")
            # offsets/data straight from the Arrow buffers (int32 for
            # binary, int64 for large_binary), honouring a slice offset.
            off_dtype = (
                np.int64 if pa.types.is_large_binary(blob.type) else np.int32
            )
            offs = np.frombuffer(blob.buffers()[1], dtype=off_dtype)[
                blob.offset : blob.offset + len(blob) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(blob.buffers()[2], dtype=np.uint8)
                if blob.buffers()[2] is not None
                else np.empty(0, dtype=np.uint8)
            )
            lens = offs[1:] - offs[:-1]
            cum = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, dtype=np.int64, out=cum[1:])
            checksum = (cum[offs[1:]] - cum[offs[:-1]]) % 2147483647
            if data.size:
                first = np.where(
                    lens > 0, data[np.minimum(offs[:-1], data.size - 1)], -1
                ).astype(np.int64)
            else:
                first = np.full(len(blob), -1, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column("doc_id"), pa.int64()),
                    pc.cast(
                        pc.struct_field(batch.column("meta"), "kind"),
                        pa.string(),
                    ),
                    pa.array(lens, type=pa.int64()),
                    pa.array(first, type=pa.int64()),
                    pa.array(checksum, type=pa.int64()),
                ],
                schema=out_schema,
            )

    return blobs.mapInArrow(extract, schema=FEATURE_SCHEMA)
