"""JSON CDC-log sources, batch and streaming.

The reference ingests multiline JSON arrays with Databricks Autoloader
(``format("cloudFiles")`` + schema inference + hints + 1 file per trigger,
``notebooks/demo-notebook.py:158-167``). OSS equivalents (SURVEY.md §1.4):

- batch: ``spark.read.option("multiline","true").json(path)``
  (identical to ``notebooks/demo-notebook.py:146``);
- streaming: Spark's native JSON file source with an explicit schema and
  ``maxFilesPerTrigger`` — real Structured Streaming, checkpointed, paced.

Schema hints are emulated by merging hint types over the inferred schema
(``cloudFiles.schemaHints``, ``notebooks/demo-notebook.py:165``): inference
runs once on whatever files exist, then hinted columns override.

At 100 TB the streaming source's file listing is the bottleneck; production
deployments switch to notification-based listing — the query shape is
unchanged, which is why this module only exposes schema/pacing knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType

CDC_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss[.SSS][XXX]"


def read_json_batch(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = True,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
) -> DataFrame:
    reader = (
        spark.read.option("multiline", str(multiline).lower())
        .option("timestampFormat", timestamp_format)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def infer_schema_with_hints(
    spark: SparkSession,
    path: str,
    hints: dict[str, str],
    multiline: bool = True,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
) -> StructType:
    """Infer a JSON schema from existing files, then apply type hints.

    Emulates Autoloader's ``inferColumnTypes`` + ``schemaHints``
    (``notebooks/demo-notebook.py:163-165``).
    """
    inferred = read_json_batch(
        spark, path, multiline=multiline, timestamp_format=timestamp_format
    ).schema
    fields = []
    for f in inferred.fields:
        if f.name in hints:
            fields.append(
                StructType.fromDDL(f"`{f.name}` {hints[f.name]}").fields[0]
            )
        else:
            fields.append(f)
    return StructType(fields)


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
    multiline: bool = True,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Streaming JSON file source, 1 file per micro-batch by default
    (the reference's ``cloudFiles.maxFilesPerTrigger=1``,
    ``notebooks/demo-notebook.py:161``).

    ``corrupt_col`` enables quarantine capture: malformed records surface
    with the raw text in that column instead of silently becoming all-null
    rows (the OSS analogue of Autoloader's rescued-data column).
    """
    if corrupt_col and corrupt_col not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        schema = StructType(schema.fields + [StructField(corrupt_col, StringType())])
    reader: DataStreamReader = (
        spark.readStream.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("timestampFormat", timestamp_format)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)
