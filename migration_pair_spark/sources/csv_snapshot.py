"""CSV snapshot export / import — parity with the reference's Extraction and
Insertion tasks.

Reference semantics reproduced (SURVEY.md §2 O5-O8):

- export (`Extraction`, /root/reference/Tasks/Extraction.cs:48-93):
  full-table scan -> timestamps serialized as epoch MILLISECONDS
  (Extraction.cs:67-68) -> strings quoted with RFC-4180 quote doubling
  (Extraction.cs:86-87) -> header row -> one delimited file per partition.
  NOT reproduced: the reference's delimiter inconsistency (header uses the
  configured delimiter but rows hard-code ',' — Extraction.cs:92); Spark's
  writer is self-consistent and we follow it.
- import (`Insertion`, /root/reference/Tasks/Insertion.cs:54-105 +
  Converters/DynamicTypeConverter.cs:8-22): permissive reader (missing
  fields -> null, like CsvHelper's MissingFieldFound=null), all values read
  as strings then coerced per target-column type; the reference's
  empty-numeric-string -> 0 quirk (CLR Convert semantics) is exposed as an
  opt-in flag, default OFF (empty -> null is the sane default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CSV_OPTS = {"header": "true", "quote": '"', "escape": '"'}


def export_snapshot(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    mode: str = "overwrite",
) -> list[str]:
    """Table -> CSV files. Timestamps become epoch-millis longs; binary
    columns are hex-encoded (CSV is a text format; the reference never
    handled binary). Returns the exported column names in order."""
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            c = F.unix_millis(c.cast("timestamp"))
        elif isinstance(field.dataType, T.BinaryType):
            c = F.hex(c)
        cols.append(c.alias(field.name))
    out = df.select(*cols)
    out.write.options(**_CSV_OPTS, sep=delimiter).mode(mode).csv(path)
    return [f.name for f in df.schema.fields]


def import_snapshot(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = ",",
    empty_numeric_as_zero: bool = False,
) -> DataFrame:
    """CSV files -> DataFrame with the target schema. All fields are read as
    strings and coerced column-by-column (the reference's insert-side
    DynamicTypeConverter), so a malformed cell nulls out instead of killing
    the load (PERMISSIVE).

    ``empty_numeric_as_zero=True`` reproduces the reference's CLR
    ``Convert.ToInt64(null)`` -> 0 behavior for integral columns
    (/root/reference/Converters/DynamicTypeConverter.cs:10-12 — empty CSV
    field -> null argument -> zero)."""
    raw_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )
    raw = (
        # multiLine: extracted text carries embedded newlines (quoted by the
        # writer); without it each newline splits a record. Scale note:
        # multiLine disables intra-file input splits — fine here because the
        # export already produces one file per partition.
        spark.read.options(**_CSV_OPTS, sep=delimiter, mode="PERMISSIVE", multiLine="true")
        .schema(raw_schema)
        .csv(path)
    )
    cols = []
    for field in schema.fields:
        src = F.col(field.name)
        dt = field.dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            c = F.timestamp_millis(src.try_cast("long")).cast(dt)
        elif isinstance(dt, T.BinaryType):
            c = F.unhex(src)
        elif isinstance(dt, T.BooleanType):
            c = src.try_cast("boolean")
        elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
            c = src.try_cast(dt.simpleString())
            if empty_numeric_as_zero:
                # CLR Convert.ToInt64(null) == 0: empty/missing/unparseable
                # numeric cells load as zero, as the reference does
                c = F.coalesce(c, F.lit(0)).cast(dt.simpleString())
        else:
            c = src.try_cast(dt)
        cols.append(c.alias(field.name))
    return raw.select(*cols)


def roundtrip_schema_check(df: DataFrame, imported: DataFrame) -> bool:
    """The reference's schema-compliance gate (EndToEnd.cs:51-85) applied to
    a CSV round trip: same column names and types, order-insensitive."""
    a = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
    b = {(f.name, f.dataType.simpleString()) for f in imported.schema.fields}
    return a == b
