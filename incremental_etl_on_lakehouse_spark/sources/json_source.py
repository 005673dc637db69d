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

# Accepts both the reference demo's space-separated spelling
# (notebooks/demo-notebook.py:146 fixtures) and ISO-8601 'T' — the spelling
# most CDC emitters/log shippers produce. Before round 9 the 'T' form was
# rejected and whole NDJSON batches landed in quarantine instead of Bronze.
# The fraction ladder matters: the reference's own sample data carries
# MICROSECOND cdc_timestamps (data/db_cdc_log_demo_sample.json:10
# "21:32:22.987432"); a bare [.SSS] nulls those out on ingest, and a NULL
# ordering column silently blocks every later UPDATE to the key at the
# Silver merge's order guard. The [.SSSSSSSSS]/[.SSSSSS]/[.SSS] chain
# parses 1-9 fractional digits (each S-run is a variable-length
# appendFraction under Spark's Iso8601TimestampFormatter).
CDC_TIMESTAMP_FORMAT = "yyyy-MM-dd['T'][ ]HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS][XXX]"


def read_json_batch(
    spark: SparkSession,
    path: str | list[str],
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
    path: str | list[str],
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
        multiline: bool | str = True,
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
            if self.multiline == "auto":
                schema = infer_schema_auto(
                    self.spark, self.sample_path, self.hints,
                    self.timestamp_format,
                )
            else:
                schema = infer_schema_with_hints(
                    self.spark, self.sample_path, self.hints,
                    self.multiline, self.timestamp_format,
                )
        self._persist(schema)
        return schema

    def evolve(
        self, sample_files: list[str] | None = None
    ) -> tuple[StructType, list[str]]:
        """Detect drift at a stream-start boundary: returns the (possibly
        widened) schema and the list of newly added column names.

        ``sample_files`` bounds the inference read to specific files —
        drift can only appear in files not yet ingested, so a caller with
        a discovery ledger passes just the new ones and this step is
        O(new data) instead of O(landing zone)."""
        cur = self.current()
        target = sample_files if sample_files else self.sample_path
        try:
            if self.multiline == "auto":
                inferred = infer_schema_auto(
                    self.spark, target,
                    timestamp_format=self.timestamp_format,
                )
            else:
                inferred = read_json_batch(
                    self.spark, target,
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


def _pacing_options(
    reader: DataStreamReader,
    max_files_per_trigger: int | None,
    max_bytes_per_trigger: int | None,
) -> DataStreamReader:
    """Apply exactly one ingest-pacing knob (Autoloader's
    ``cloudFiles.maxFilesPerTrigger`` / ``cloudFiles.maxBytesPerTrigger``
    pair). Spark's file source rejects both together at stream start —
    raise the same contract eagerly here. Default (neither given): 1 file
    per micro-batch, the reference's pacing
    (``notebooks/demo-notebook.py:161``). Both knobs are honored by
    ``trigger(availableNow=True)`` across ALL catch-up batches (unlike
    the legacy ``trigger(once=True)``, which ignores limits) — batch
    boundaries always fall on whole files."""
    if max_files_per_trigger is not None and max_bytes_per_trigger is not None:
        raise ValueError(
            "maxFilesPerTrigger and maxBytesPerTrigger can't both be set"
        )
    if max_bytes_per_trigger is not None:
        return reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    return reader.option(
        "maxFilesPerTrigger",
        str(1 if max_files_per_trigger is None else max_files_per_trigger),
    )


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
    multiline: bool = True,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
    corrupt_col: str | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming JSON file source, 1 file per micro-batch by default
    (the reference's ``cloudFiles.maxFilesPerTrigger=1``,
    ``notebooks/demo-notebook.py:161``); ``max_bytes_per_trigger``
    switches to byte-budget pacing (Autoloader's
    ``cloudFiles.maxBytesPerTrigger`` — a SOFT maximum: each batch takes
    whole files while the running total stays under budget, at least one
    file per batch). The two knobs are mutually exclusive.

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
    )
    reader = _pacing_options(
        reader, max_files_per_trigger, max_bytes_per_trigger
    )
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


# ---------------------------------------------------------------------------
# Format-auto readers: JSON array files AND NDJSON in one landing zone.
#
# Spark's JSON source is per-file-format-blind: with multiLine=true an
# NDJSON file is parsed as ONE document and every record after the first is
# SILENTLY DROPPED (Jackson stops at the first complete value and ignores
# trailing bytes); with multiLine=false a pretty-printed array file turns
# entirely corrupt. Real landing zones mix both — NDJSON is what log
# shippers and CDC emitters produce, arrays are what the reference's demo
# lands (notebooks/demo-notebook.py:146) — so format must be dispatched
# PER FILE, which one spark.read.json call cannot do.
#
# The auto readers read each file as a single text row (wholetext) and do
# the parse JVM-side with from_json — all whole-stage codegen, no Python:
#   - file starts with '['        -> array parse (null => whole file corrupt)
#   - every line fails but the whole text parses as one object
#                                  -> pretty-printed single object
#   - otherwise                    -> per-line parse (NDJSON; bad lines
#                                     surface in ``corrupt_col``)
# from_json quirks this dispatch is built around (probed on pyspark 4.1):
# struct-schema parse NEVER returns null for non-empty garbage (it returns
# an all-null row and fills columnNameOfCorruptRecord), array-schema parse
# DOES return null on garbage, and both silently ignore trailing bytes
# after the first valid value — hence the startswith('[') gate, without
# which array parse would eat exactly one NDJSON record per file.
#
# Scale note: wholetext makes one task per FILE and holds one file's bytes
# in one row, so this path sizes to CDC landing files (MBs each, many
# files), not to multi-GB single files — the same operating envelope as
# Autoloader's default listing mode that this module emulates.
# ---------------------------------------------------------------------------

_INTERNAL_CORRUPT = "__corrupt_record"


def _json_any_records(value_col, schema: StructType, timestamp_format: str,
                      corrupt_col: str):
    """Column expression: file text -> array<struct<schema + corrupt_col>>."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType, StructField

    rec_t = StructType(
        [f for f in schema.fields if f.name != corrupt_col]
        + [StructField(corrupt_col, StringType())]
    )
    opts = {
        "timestampFormat": timestamp_format,
        "columnNameOfCorruptRecord": corrupt_col,
    }
    trimmed = F.trim(value_col)
    arr = F.from_json(trimmed, ArrayType(rec_t), opts)
    whole = F.from_json(trimmed, rec_t, opts)
    lines = F.filter(
        F.split(value_col, "\r?\n"), lambda x: F.trim(x) != F.lit("")
    )
    line_recs = F.transform(lines, lambda x: F.from_json(x, rec_t, opts))
    all_lines_corrupt = F.forall(
        line_recs, lambda r: r[corrupt_col].isNotNull()
    )
    whole_file_corrupt = F.array(
        F.struct(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in rec_t.fields[:-1]
            ],
            trimmed.alias(corrupt_col),
        )
    )
    return (
        F.when(trimmed.startswith("["), F.coalesce(arr, whole_file_corrupt))
        .when(
            all_lines_corrupt
            & whole.isNotNull()
            & whole[corrupt_col].isNull(),
            F.array(whole),
        )
        .otherwise(line_recs)
    )


def _parse_json_any(raw: DataFrame, schema: StructType, timestamp_format: str,
                    corrupt_col: str | None) -> DataFrame:
    from pyspark.sql import functions as F

    ccol = corrupt_col or _INTERNAL_CORRUPT
    recs = _json_any_records(F.col("value"), schema, timestamp_format, ccol)
    out = raw.select(F.explode(recs).alias("__rec"))
    names = [f.name for f in schema.fields if f.name != ccol]
    cols = [F.col("__rec")[n].alias(n) for n in names]
    if corrupt_col:
        cols.append(F.col("__rec")[ccol].alias(ccol))
    return out.select(*cols)


def read_json_auto_batch(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Batch read with per-file array/NDJSON dispatch (see module note)."""
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return _parse_json_any(raw, schema, timestamp_format, corrupt_col)


def read_json_auto_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
    corrupt_col: str | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ingest with per-file array/NDJSON dispatch — the pipeline's
    default landing reader. Same pacing contract as :func:`read_json_stream`
    (default 1 file per micro-batch, the reference's
    cloudFiles.maxFilesPerTrigger=1, ``notebooks/demo-notebook.py:161``;
    ``max_bytes_per_trigger`` for byte-budget pacing, mutually exclusive);
    ``corrupt_col`` is the quarantine channel (Autoloader rescued-data
    analogue)."""
    reader = spark.readStream.format("text").option("wholetext", "true")
    reader = _pacing_options(
        reader, max_files_per_trigger, max_bytes_per_trigger
    )
    raw = reader.load(path)
    return _parse_json_any(raw, schema, timestamp_format, corrupt_col)


def infer_schema_auto(
    spark: SparkSession,
    path: str | list[str],
    hints: dict[str, str] | None = None,
    timestamp_format: str = CDC_TIMESTAMP_FORMAT,
) -> StructType:
    """Schema inference across BOTH landing formats: union the fields of a
    multiLine-array inference pass and an NDJSON inference pass (each pass
    sees only the files its format can parse; the other format's files
    contribute nothing — corrupt rows infer no business columns)."""
    fields: list = []
    seen: set[str] = set()
    for multiline in (True, False):
        try:
            inferred = read_json_batch(
                spark, path, multiline=multiline,
                timestamp_format=timestamp_format,
            ).schema
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
                continue
            raise
        for f in inferred.fields:
            if f.name in seen or f.name == "_corrupt_record":
                continue
            seen.add(f.name)
            if hints and f.name in hints:
                f = StructType.fromDDL(f"`{f.name}` {hints[f.name]}").fields[0]
            fields.append(f)
    return StructType(fields)
