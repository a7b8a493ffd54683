"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED —
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
optional library imports — but everything Spark-side is real and tested:
the binary+metadata schema, the ``mapInPandas`` batch iteration, the UDF
signatures, and a deterministic fake feature extractor whose output is
reproduced by the DuckDB oracle (md5/length arithmetic), which validates the
whole Arrow round-trip end-to-end.

Scale notes: ``mapInPandas`` streams Arrow record batches — constant memory
per task regardless of partition size; binary payloads never pass through
Python row objects.  Partition sizing for blob columns is bytes-based
(``spark.sql.files.maxPartitionBytes``), not row-based.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Synthesize a binary media column from the text payload (the testdata
    has no real blobs; the plumbing downstream is identical either way)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image(content: bytes):
    """STUB: real image decode requires a codec library absent from this
    environment.  The Spark-side plumbing that would call it is real."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; plug one in here — the mapInPandas pipeline above "
            "it is fully wired"
        ) from exc
    raise NotImplementedError("wire Image.open(BytesIO(content)) here")


def decode_audio(content: bytes):
    """STUB: real audio decode (sample-rate/channel extraction, resampling,
    frame windows) requires an audio codec library absent from this
    environment.  The mapInPandas plumbing that would host it is the same as
    ``extract_features``."""
    try:
        import soundfile  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires an audio I/O library not present in this "
            "environment; plug one in here — the Arrow-batched pipeline "
            "around it is fully wired"
        ) from exc
    raise NotImplementedError("wire soundfile.read(BytesIO(content)) here")


def resize_image(content: bytes, width: int, height: int):
    """STUB: real resize requires an imaging library absent from this
    environment.  Slots into the same mapInPandas batch loop as
    ``extract_features`` — decode, ``img.resize((width, height))``,
    re-encode — with bytes in/bytes out so the column type is unchanged."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires an imaging library not present in this "
            "environment; plug one in here — the Arrow pipeline around it "
            "is fully wired"
        ) from exc
    raise NotImplementedError("wire Image.open(...).resize((width, height)) here")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("frame_sig", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every_k: int = 4) -> DataFrame:
    """Frame-sampling plumbing over opaque binary content: treat the payload
    as fixed-size frames, keep every ``every_k``-th one, emit the sampled
    frames' md5s (comma-joined) plus the total frame count.

    A real video pipeline swaps the fixed-stride slicer for a container
    demuxer (the ``decode_*`` stub seam); everything else — Arrow batching,
    bytes-side slicing in vectorized Python, stable string output for the
    oracle — is exactly what ships here.  Deterministic, so the DuckDB
    oracle reproduces it from blob arithmetic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def frames_of(b: bytes) -> tuple[int, str]:
                raw = bytes(b)
                n = (len(raw) + frame_bytes - 1) // frame_bytes
                sigs = [
                    hashlib.md5(
                        raw[i * frame_bytes:(i + 1) * frame_bytes]
                    ).hexdigest()
                    for i in range(0, n, every_k)
                ]
                return n, ",".join(sigs)

            out = pdf["content"].map(frames_of)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": out.map(lambda t: t[0]).astype("int64"),
                    "frame_sig": out.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: first 4 bytes of
    the md5 digest, scaled to [0,1].  Matches the oracle expression
    ``strpos``-decoded from the md5 hex string."""
    digest = hashlib.md5(content).hexdigest()
    return [int(digest[i * 2: i * 2 + 2], 16) / 255.0 for i in range(4)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Real pipeline shape: per-batch vectorized work in pandas/numpy; the
    decode call is the stubbed seam.  Output is oracle-checkable because the
    fake extractor is pure md5 arithmetic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature_vec": content.map(
                        lambda b: _fake_features(bytes(b))
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
