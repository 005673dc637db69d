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

import json
import os

from pyspark.errors import AnalysisException
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


class SchemaTracker:
    """Persisted-schema tracking with additive evolution — the OSS analogue
    of Autoloader's ``cloudFiles.schemaLocation`` + ``addNewColumns``
    (``notebooks/demo-notebook.py:163-166``).

    The resolved schema is persisted as JSON at ``location`` so it survives
    restarts and never loses columns even after the files that introduced
    them are retired. :meth:`evolve` is called at stream (re)start
    boundaries: it re-infers over the landing path, widens the persisted
    schema with any NEW columns (existing columns keep their persisted
    types — inference can never flap an established type; ``hints`` win
    for brand-new columns), persists, and reports the drift. A column that
    lands mid-burst is picked up at the next boundary — the same restart
    semantics Autoloader has, minus the hard UnknownFieldException stop.

    At 100 TB the re-inference must not scan the world: Autoloader samples
    (first ~50 GB / 1000 files); callers with huge landing zones should
    point ``sample_path`` at a bounded glob (e.g. the newest partition).
    """

    def __init__(
        self,
        spark: SparkSession,
        landing_path: str,
        location: str,
        base_schema: StructType | None = None,
        hints: dict[str, str] | None = None,
        multiline: bool = True,
        timestamp_format: str = CDC_TIMESTAMP_FORMAT,
        sample_path: str | None = None,
    ):
        self.spark = spark
        self.landing_path = landing_path
        self.location = location
        self.base_schema = base_schema
        self.hints = hints or {}
        self.multiline = multiline
        self.timestamp_format = timestamp_format
        self.sample_path = sample_path or landing_path

    def _persist(self, schema: StructType) -> None:
        os.makedirs(os.path.dirname(self.location) or ".", exist_ok=True)
        tmp = self.location + ".tmp"
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, self.location)

    def current(self) -> StructType:
        """The schema to start the stream with: persisted if present, else
        the declared base schema (persisted for next time), else inferred."""
        if os.path.exists(self.location):
            with open(self.location) as f:
                return StructType.fromJson(json.load(f))
        schema = self.base_schema
        if schema is None:
            schema = infer_schema_with_hints(
                self.spark, self.sample_path, self.hints,
                self.multiline, self.timestamp_format,
            )
        self._persist(schema)
        return schema

    def evolve(self) -> tuple[StructType, list[str]]:
        """Detect drift at a stream-start boundary: returns the (possibly
        widened) schema and the list of newly added column names."""
        cur = self.current()
        try:
            inferred = read_json_batch(
                self.spark, self.sample_path,
                multiline=self.multiline,
                timestamp_format=self.timestamp_format,
            ).schema
        except AnalysisException as exc:
            # Empty landing zone (no files yet) is the one legitimate
            # nothing-to-infer case; any other analysis error — and all
            # IO/permission errors, which raise other types — propagates.
            msg = str(exc)
            if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
                return cur, []
            raise
        known = set(cur.fieldNames())
        new = []
        for f in inferred.fields:
            if f.name in known:
                continue
            if f.name in self.hints:
                f = StructType.fromDDL(f"`{f.name}` {self.hints[f.name]}").fields[0]
            new.append(f)
        if not new:
            return cur, []
        widened = StructType(cur.fields + new)
        self._persist(widened)
        return widened, [f.name for f in new]


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
