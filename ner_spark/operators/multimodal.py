"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, processed by Arrow-batched pandas UDFs.

The decode kernels themselves are STUBBED (the sandbox has no
image/audio libraries): `decode_image` raises NotImplementedError
unless PIL is importable, and the tested path uses a deterministic
fake decoder that derives pseudo-dimensions from the payload's sha256
— so the Spark-side plumbing (binary schema, mapInPandas batch shape,
partitioning, metadata struct) is fully real and oracle-checkable
while the codec is swappable.

Scale shape: payloads never pass through Python row-at-a-time — one
Arrow batch of binaries in, one metadata frame out; Arrow batch size
is the memory knob (session.py caps maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)

_NIB = "0123456789abcdef"


def _fake_dims(sha_hex: str) -> tuple[int, int]:
    """Deterministic stub dimensions from the first 4 sha nibbles —
    reproducible in ANSI SQL (strpos-based nibble decode), which is
    what lets the driver oracle-check the plumbing end-to-end."""
    n = [_NIB.index(c) for c in sha_hex[:4]]
    width = (n[0] * 16 + n[1]) % 512 + 1
    height = (n[2] * 16 + n[3]) % 512 + 1
    return width, height


def decode_image(payload: bytes) -> object:
    """Real decode path — requires an image library the sandbox lacks.

    Kept import-gated so the operator is drop-in complete on a cluster
    image that ships PIL; everything else in this module works without
    it.
    """
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "image decoding needs PIL/pillow; use media_features() for "
            "the metadata path or install pillow on the cluster image"
        ) from e
    return Image.open(io.BytesIO(payload))  # pragma: no cover


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of `text` stand in
    for real media bytes; schema and batch mechanics are identical)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def media_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload metadata: byte length, sha256, stub-decoded dims.

    Entirely NATIVE expressions — sha2/octet_length/conv stay in
    whole-stage codegen; running Python hashlib per row for values the
    JVM computes for free was round-1's one unnecessary mapInPandas
    (its own oracle proved the native form exists). A real codec's
    feature extraction belongs in `media_features_decoded` below.
    """
    sha = F.sha2(F.col(payload_col), 256)
    dim = lambda pos: (  # noqa: E731 - two-nibble hex field -> [1, 512]
        (F.conv(F.substring(sha, pos, 2), 16, 10).cast("int") % 512) + 1
    )
    return media.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        sha.alias("payload_sha256"),
        dim(1).alias("width"),
        dim(3).alias("height"),
    )


def media_features_decoded(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """The Arrow-batched decode path: same output schema, but the
    width/height come from the (stub) decoder inside mapInPandas — the
    slot where a real PIL/ffmpeg kernel plugs in on a cluster image.
    Values equal media_features() by construction of the stub."""

    def run(batches):
        for pdf in batches:
            ids, n_bytes, shas, ws, hs = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                sha = hashlib.sha256(b).hexdigest()
                w, h = _fake_dims(sha)
                ids.append(int(i))
                n_bytes.append(len(b))
                shas.append(sha)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "payload_sha256": shas,
                    "width": ws,
                    "height": hs,
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset_bytes", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """'Video' frame sampling stub: cut each payload into `n_frames`
    evenly-spaced byte slices and fingerprint each — the exact batch
    shape (1 row in -> k rows out inside mapInPandas) a real
    keyframe extractor has."""

    def run(batches):
        for pdf in batches:
            ids, idxs, offs, shas = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for k in range(n_frames):
                    off = min(k * step, max(len(b) - 1, 0))
                    chunk = b[off : off + step]
                    ids.append(int(i))
                    idxs.append(k)
                    offs.append(off)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "offset_bytes": offs,
                    "frame_sha256": shas,
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, FRAME_SCHEMA)
