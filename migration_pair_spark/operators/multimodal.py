"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode/feature-extract kernels themselves are STUBBED (this container
ships no image/audio libraries) behind ``try-import`` + a deterministic fake,
but the Spark-side plumbing is real and tested: schema contract, batch
iterator shape, partition-preserving map, binary payload handling.

Pattern at 100 TB: binary payloads dominate I/O, so the operator (a) prunes
to (id, payload) before the UDF — column pruning reaches the parquet scan,
(b) processes per Arrow batch (no per-row Python), (c) returns compact
metadata, never re-emitting the payload unless asked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, byte_len long, payload_md5 string, modality string"

try:  # pragma: no cover - the real decoders are not in this container
    import PIL.Image  # noqa: F401

    _HAS_IMAGE_LIBS = True
except Exception:
    _HAS_IMAGE_LIBS = False


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': real deployments replace this with an
    image/audio decoder. Raises NotImplementedError for modalities that
    genuinely need the missing libraries."""
    return {"modality": "binary"}


def parse_image_dims(payload: bytes, max_jpeg_segments: int = 24) -> "dict | None":
    """Pure-Python twin of the Catalyst header parser (:func:`image_dims`),
    for use as a decoder-seam kernel: PNG IHDR / GIF screen descriptor /
    JPEG SOF segment walk, no codec library. Returns
    {"fmt", "width", "height"} or None when the payload is not a parseable
    image — including TRUNCATED headers (a corrupt blob must yield None,
    never raise: this runs inside mapInPandas with no per-row handler, so
    one exception would kill the task). Kept byte-for-byte consistent with
    image_dims (shared tests), including the segment cap."""
    import struct

    if payload is None or len(payload) < 10:
        return None
    if payload[:4] == b"\x89PNG" and payload[12:16] == b"IHDR":
        if len(payload) < 24:
            return None  # truncated mid-IHDR
        w, h = struct.unpack(">II", payload[16:24])
        return {"fmt": "png", "width": w, "height": h}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"fmt": "gif", "width": w, "height": h}
    if payload[:3] == b"\xff\xd8\xff":
        pos = 2  # 0-based offset of the first marker after SOI
        for _ in range(max_jpeg_segments):
            if pos + 9 > len(payload) or payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"fmt": "jpeg", "width": w, "height": h}
            if marker in (0xDA, 0xD9):
                return None
            pos += 2 + struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
    return None


def decode_image(payload: bytes) -> dict:
    """Image decode kernel for the :func:`extract_binary_metadata` seam.

    Dimensions come from REAL pure-header parsing (:func:`parse_image_dims`
    — PNG/GIF/JPEG need no codec library). Full pixel decode (mode,
    resample, colorspace) still requires PIL/opencv, which this container
    lacks; unparseable-by-header formats raise until a codec library is
    installed in the deployment image."""
    dims = parse_image_dims(payload)
    if dims is not None:
        return {"modality": "image", "width": dims["width"], "height": dims["height"]}
    if not _HAS_IMAGE_LIBS:
        raise NotImplementedError(
            "full image decode requires PIL/opencv, not present in this "
            "environment — header parsing covers PNG/GIF/JPEG dimensions; "
            "install an image library for other formats/pixel access"
        )
    import io

    import PIL.Image  # pragma: no cover

    img = PIL.Image.open(io.BytesIO(payload))  # pragma: no cover
    return {"modality": "image", "width": img.width, "height": img.height}  # pragma: no cover


def frame_sample(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Video frame sampling hook — STUB (no av/ffmpeg in this container)."""
    raise NotImplementedError(
        "video frame sampling requires pyav/ffmpeg, not present in this "
        "environment — the mapInPandas plumbing in extract_binary_metadata "
        "is the integration point"
    )


def binary_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """(id, binary) -> (id, byte_len, payload_md5, modality) with BUILT-INS
    only — ``octet_length`` and ``md5`` are JVM-side codegen'd expressions, so
    the metadata fast path has NO Python stage at all (plan-pinned in
    tests/test_plans.py). Modality sniffing from magic bytes is also pure
    Catalyst (hex prefix compare). Use :func:`extract_binary_metadata` only
    when a real decoder must run."""
    from pyspark.sql import functions as F

    prefix = F.upper(F.hex(F.substring(F.col(bin_col), 1, 4)))
    modality = (
        F.when(F.col(bin_col).isNull(), F.lit(None).cast("string"))
        .when(prefix.startswith("89504E47"), F.lit("image"))  # PNG
        .when(prefix.startswith("FFD8FF"), F.lit("image"))  # JPEG
        .when(prefix.startswith("494433"), F.lit("audio"))  # ID3/MP3
        .otherwise(F.lit("binary"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.octet_length(F.col(bin_col)).cast("long"), F.lit(0)).alias(
            "byte_len"
        ),
        F.md5(F.col(bin_col)).alias("payload_md5"),
        modality.alias("modality"),
    )


# JPEG markers that carry frame dimensions (SOF0-3, 5-7, 9-11, 13-15; C4 is
# DHT, C8 is JPG-extension, CC is DAC — none of those are frames)
_SOF_MARKERS = "'C0','C1','C2','C3','C5','C6','C7','C9','CA','CB','CD','CE','CF'"


def _jpeg_sof_pos(bin_col: str, max_segments: int = 24) -> str:
    """SQL expression: the 1-based offset of the JPEG SOF marker's 0xFF
    byte, or NULL. A bounded SEGMENT-LENGTH walk from the first marker
    after SOI (offset 3): read each segment's 2-byte big-endian length and
    hop over it, stopping at SOF / SOS / EOI / corruption. Written as an
    ``aggregate`` higher-order function so the expression stays LINEAR in
    ``max_segments`` (a Python loop of nested ``when`` would double the
    tree per step), and the walk is per-row JVM work with no Python stage.

    A naive byte-scan for FFC0 would be fooled by those bytes appearing
    inside an APPn payload (EXIF blobs contain arbitrary bytes) — hopping
    by declared segment length cannot be (pinned in tests)."""
    marker = f"upper(hex(substring({bin_col}, acc.pos + 1, 1)))"
    seg_len = f"cast(conv(hex(substring({bin_col}, acc.pos + 2, 2)), 16, 10) as int)"
    return f"""
        aggregate(
            sequence(1, {max_segments}),
            named_struct('pos', 3, 'sof', cast(null as int)),
            (acc, i) -> case
                when acc.sof is not null or acc.pos <= 0
                     or acc.pos + 8 > octet_length({bin_col}) then acc
                when upper(hex(substring({bin_col}, acc.pos, 1))) <> 'FF'
                    then named_struct('pos', cast(-1 as int), 'sof', cast(null as int))
                when {marker} in ({_SOF_MARKERS})
                    then named_struct('pos', acc.pos, 'sof', acc.pos)
                when {marker} in ('DA', 'D9')
                    then named_struct('pos', cast(-1 as int), 'sof', cast(null as int))
                else named_struct('pos', acc.pos + 2 + {seg_len},
                                  'sof', cast(null as int))
            end,
            acc -> acc.sof)
    """


def image_dims(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    max_jpeg_segments: int = 24,
) -> DataFrame:
    """(id, binary) -> (doc_id, fmt, width, height) by PURE HEADER PARSING —
    no codec library, no Python stage (replaces the round-3 "needs PIL"
    stub for dimensions; full pixel decode still needs a codec and stays
    behind the :func:`extract_binary_metadata` decoder seam):

    - PNG: IHDR is mandated first chunk — big-endian u32 width/height at
      fixed offsets 17/21 (guarded on the 'IHDR' tag at offset 13);
    - GIF: logical screen descriptor — LITTLE-endian u16 at offsets 7/9;
    - JPEG: SOFn located by the bounded segment walk of
      :func:`_jpeg_sof_pos`; height/width are big-endian u16 at SOF+5 /
      SOF+7 (after the 2-byte length and 1-byte precision).

    Unrecognized/corrupt payloads yield fmt/width/height = NULL rather than
    failing the batch — at 100 TB some blobs are always broken."""
    from pyspark.sql import functions as F

    c = F.col(bin_col)

    def be(pos: int, n: int) -> F.Column:
        return F.conv(F.hex(F.substring(c, pos, n)), 16, 10).cast("int")

    def le16(pos: int) -> F.Column:
        return F.conv(
            F.concat(F.hex(F.substring(c, pos + 1, 1)), F.hex(F.substring(c, pos, 1))),
            16,
            10,
        ).cast("int")

    prefix = F.upper(F.hex(F.substring(c, 1, 4)))
    blen = F.octet_length(c)
    is_png = prefix == F.lit("89504E47")
    # truncation guards mirror parse_image_dims: a payload cut off mid-header
    # yields NULLs, never a garbage dimension from a short substring
    # full 6-byte GIF87a/GIF89a signature (a 4-byte 'GIF8' prefix would
    # accept non-GIF headers; review-caught, round 4)
    is_gif = F.upper(F.hex(F.substring(c, 1, 6))).isin(
        "474946383761", "474946383961"
    ) & (blen >= 10)
    is_jpeg = prefix.startswith("FFD8FF")
    png_ok = (
        is_png
        & (F.hex(F.substring(c, 13, 4)) == F.lit("49484452"))
        & (blen >= 24)
    )

    # materialize the walk ONCE in an intermediate projection; the jpeg
    # width/height/fmt expressions reference the column, not the walk
    sof = F.col("_sof")
    jpeg_h = F.conv(
        F.hex(F.expr(f"substring({bin_col}, _sof + 5, 2)")), 16, 10
    ).cast("int")
    jpeg_w = F.conv(
        F.hex(F.expr(f"substring({bin_col}, _sof + 7, 2)")), 16, 10
    ).cast("int")

    fmt = (
        F.when(png_ok, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_jpeg & sof.isNotNull(), F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(png_ok, be(17, 4))
        .when(is_gif, le16(7))
        .when(is_jpeg, jpeg_w)
        .otherwise(F.lit(None).cast("int"))
    )
    height = (
        F.when(png_ok, be(21, 4))
        .when(is_gif, le16(9))
        .when(is_jpeg, jpeg_h)
        .otherwise(F.lit(None).cast("int"))
    )
    return (
        df.withColumn("_sof", F.expr(_jpeg_sof_pos(bin_col, max_jpeg_segments)))
        .select(
            F.col(id_col).alias("doc_id"),
            fmt.alias("fmt"),
            width.alias("width"),
            height.alias("height"),
        )
    )


def extract_binary_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decoder=None,
    extra_schema: str = "",
) -> DataFrame:
    """(id, binary) -> (id, byte_len, payload_md5, modality, *extras) via
    mapInPandas.

    This is the DECODER SEAM: ``decoder`` is any ``bytes -> dict`` kernel
    (it is pickled to the executors with the UDF) returning at least
    ``{"modality": ...}`` plus whichever typed metadata fields
    ``extra_schema`` declares (DDL string, e.g. ``"width int, height int"``;
    missing keys land as null). :func:`decode_image` / :func:`frame_sample`
    are the intended production kernels — stubs in this container (no
    image/audio libraries), which is exactly why the seam takes an injected
    kernel: the Arrow-batched plumbing (pruned input, batch iterator shape,
    typed metadata contract) is testable end-to-end with a pure-Python fake
    (tests/test_operators.py) and unchanged when the real decoder arrives.

    The byte_len/md5/modality work inside is honest per-element Python
    (hashlib has no vectorized kernel) — which is why the hot metadata path
    is :func:`binary_metadata` (pure Catalyst built-ins) and this function
    exists only to host decode kernels that genuinely need Python."""
    if decoder is None:
        decoder = _decode_stub
    pruned = df.select(id_col, bin_col)
    schema = META_SCHEMA + (f", {extra_schema}" if extra_schema else "")
    # parse the DDL properly — a naive comma split mangles parameterized
    # and nested types (decimal(10,2), map<string,int>) into garbage names
    if extra_schema:
        from pyspark.sql.types import _parse_datatype_string

        extra_names = list(_parse_datatype_string(extra_schema).fieldNames())
    else:
        extra_names = []

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            decoded = payloads.map(lambda b: decoder(b) if b is not None else {})
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "modality": decoded.map(lambda d: d.get("modality")),
                    **{
                        name: decoded.map(lambda d, n=name: d.get(n))
                        for name in extra_names
                    },
                }
            )

    return pruned.mapInPandas(batches, schema=schema)
