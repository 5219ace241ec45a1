"""Scalar / vectorized function library (the engine's UDF seam).

The reference's only scalar surface is the cast layer
(/root/reference/Converters/DynamicTypeConverter.cs:8-22) and CSV quoting
(/root/reference/Tasks/Extraction.cs:78-93); everything else here is new
engine surface mandated by the north rule (vectorized text extraction) or by
the training-data pipeline (text statistics).
"""

from migration_pair_spark.functions.extract import extract_text, extract_text_udf

__all__ = ["extract_text", "extract_text_udf"]
