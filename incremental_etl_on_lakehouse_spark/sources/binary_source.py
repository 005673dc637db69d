"""Binary-file connector for media ingestion.

Reads raw image/audio/video files into the multimodal column layout
(SURVEY.md §2.12 ``ext_multimodal_col``) using Spark's built-in
``binaryFile`` format: one row per file with (path, modificationTime,
length, content). At 100 TB the files live on object storage and the same
reader parallelizes over listing shards; small-file pressure is handled by
packing media into parquet binary columns after first read (``to_media_df``
output is exactly that shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.operators.multimodal import attach_media_meta


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw ``binaryFile`` read: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def to_media_df(files_df: DataFrame, media_type: str = "image") -> DataFrame:
    """Shape a binaryFile read into the engine's media layout with sniffed
    format metadata: (media_id, media_type, file_name, content,
    sniffed_format, n_bytes)."""
    base = files_df.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file_name"),
        "content",
    )
    return attach_media_meta(base)
