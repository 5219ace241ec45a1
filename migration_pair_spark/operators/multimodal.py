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


def decode_image(payload: bytes) -> dict:
    """Image decode (width/height/mode metadata + resize hook).

    STUB: this container ships no image libraries. The Spark-side plumbing
    (schema, Arrow batching, partitioning) is real and tested; the kernel
    raises until PIL/opencv is installed in the deployment image.
    """
    if not _HAS_IMAGE_LIBS:
        raise NotImplementedError(
            "image decode requires PIL/opencv, not present in this "
            "environment — install an image library and replace this stub"
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
