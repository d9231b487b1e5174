"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, processed by Arrow-batched pandas UDFs.

Decoding (round 5): `decode_image` prefers PIL when a cluster image
ships it and otherwise uses built-in pure-Python decoders for the
uncompressed formats (PPM/PGM P6/P5, BMP 24/32-bit) — real decoding
runs end-to-end even in this sandbox. Non-image payloads (the text
stand-ins in the bench tables) fall back to deterministic
pseudo-dimensions derived from the payload's sha256, which keeps the
plumbing oracle-checkable in ANSI SQL.

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


class DecodedImage:
    """Minimal decoded-image record: dimensions + raw pixel bytes.

    Duck-type-compatible with the `.width`/`.height` reads the feature
    kernel performs on a PIL Image, so the two decode backends are
    interchangeable at the call site.
    """

    __slots__ = ("width", "height", "mode", "pixels")

    def __init__(self, width: int, height: int, mode: str, pixels: bytes):
        self.width = width
        self.height = height
        self.mode = mode
        self.pixels = pixels


def _decode_ppm(payload: bytes) -> DecodedImage:
    """Pure-Python decoder for binary PPM/PGM (P6/P5) — the classic
    uncompressed Netpbm formats. Strict: header tokens must be valid
    integers and the pixel payload must be exactly present, so code
    text that merely starts with 'P6' can never false-positive."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, with '#' comment lines allowed between them
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3 or not all(t.isdigit() for t in tokens):
        raise ValueError("malformed PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if not (0 < width and 0 < height and 0 < maxval < 65536):
        raise ValueError("PPM dimensions out of range")
    pos += 1  # exactly one whitespace byte separates header and pixels
    ch = 3 if payload[:2] == b"P6" else 1
    n = width * height * ch * (2 if maxval > 255 else 1)
    pixels = payload[pos : pos + n]
    if len(pixels) != n:
        raise ValueError("truncated PPM pixel data")
    return DecodedImage(width, height, "RGB" if ch == 3 else "L", pixels)


def _decode_bmp(payload: bytes) -> DecodedImage:
    """Pure-Python decoder for uncompressed 24/32-bit BMP (the
    BITMAPINFOHEADER layout). Row order is bottom-up per the spec
    (top-down when height is negative); rows are 4-byte aligned."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:  # BITMAPCOREHEADER not supported
        raise ValueError("unsupported BMP header")
    width, raw_h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp not in (24, 32) or compression != 0:
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    height, bottom_up = abs(raw_h), raw_h > 0
    if not (0 < width and 0 < height):
        raise ValueError("BMP dimensions out of range")
    stride = ((width * bpp // 8) + 3) & ~3
    if data_off + stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")
    ch = bpp // 8
    rows = []
    order = range(height - 1, -1, -1) if bottom_up else range(height)
    for r in order:
        row = payload[data_off + r * stride : data_off + r * stride + width * ch]
        # BGR(A) on disk -> RGB out; alpha dropped
        rows.append(
            bytes(
                b
                for px in (row[i : i + ch] for i in range(0, len(row), ch))
                for b in (px[2], px[1], px[0])
            )
        )
    return DecodedImage(width, height, "RGB", b"".join(rows))


def decode_image(payload: bytes) -> object:
    """Real decode path. Prefers PIL when the cluster image ships it
    (full codec coverage); otherwise falls back to the built-in
    pure-Python decoders for the uncompressed formats (PPM/PGM P6/P5,
    BMP 24/32-bit), so decoding is exercised end-to-end even in this
    sandbox. Raises ValueError for payloads no available backend can
    decode — the feature kernel treats that as 'not an image' and uses
    the deterministic metadata path instead."""
    try:
        import io

        from PIL import Image  # type: ignore

        return Image.open(io.BytesIO(payload))  # pragma: no cover
    except ImportError:
        pass
    payload = bytes(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "payload is not PPM/PGM/BMP and no PIL backend is installed"
    )


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
    width/height come from a REAL decoder inside mapInPandas — PIL
    when installed, else the built-in pure-Python PPM/PGM/BMP decoders
    (round 5; previously a stub). Payloads no backend can decode
    (e.g. the text stand-ins in the bench tables) take the
    deterministic sha-derived dims, which keeps this operator
    value-equal to media_features() on non-image corpora — that
    equality is what its oracle checks — while genuinely decoding any
    real uncompressed image bytes present."""

    def run(batches):
        for pdf in batches:
            ids, n_bytes, shas, ws, hs = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                sha = hashlib.sha256(b).hexdigest()
                try:
                    img = decode_image(b)
                    w, h = int(img.width), int(img.height)
                except (ValueError, NotImplementedError):
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
