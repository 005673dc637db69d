"""The medallion CDC pipeline: JSON landing zone -> Bronze -> Silver -> Gold.

End-to-end re-expression of the reference's demo pipeline
(``notebooks/demo-notebook.py``), wired from the engine's reusable pieces:

- **Bronze** (``:158-194``): streaming JSON ingest (1 file per micro-batch),
  augmented with ``data_hash`` (md5 of business columns), ``file_name``
  provenance, and ``insert_timestamp`` audit columns; appended to an
  append-only lake table.
- **Silver** (``:211-287``): per micro-batch of new Bronze rows — latest-wins
  intra-batch dedup then 3-way conditional MERGE (delete / hash-guarded
  update / insert) into the current-state snapshot keyed by ``id``; change
  data feed enabled. Adds derived ``utc_visit_timestamp`` (``:253``).
- **Gold** (``:349-435``): per micro-batch of Silver *changes* — signed-delta
  conversion and additive MERGE maintaining ``(country, sum_visitors)``
  incrementally; only deltas are aggregated, never the full Silver table.

Late/out-of-order data follows the reference (``:262-276``): no watermark —
latest ``cdc_timestamp`` wins per id and re-delivered duplicates are no-ops
via the hash guard, so the pipeline is eventually consistent under
at-least-once delivery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from incremental_etl_on_lakehouse_spark.functions import data_hash, to_utc
from incremental_etl_on_lakehouse_spark.lake import LakeStreamReader, LakeTable
from incremental_etl_on_lakehouse_spark.operators.cdc import (
    cdf_signed_deltas,
    merge_agg_delta,
    merge_cdc_batch,
)
from incremental_etl_on_lakehouse_spark.sources.json_source import (
    SchemaTracker,
    read_json_auto_stream,
)

# Reference schemas: FIXTURES.md A1-A4; notebooks/demo-notebook.py:163-165,213-227,351-356
# (built without fromDDL: that needs an active SparkSession at import time)
def _fields(spec: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t) for n, t in spec])


_S, _L, _T = StringType(), LongType(), TimestampType()

CDC_LOG_SCHEMA = _fields(
    [
        ("id", _L),
        ("country", _S),
        ("district", _S),
        ("visit_timestamp", _T),
        ("num_visitors", _L),
        ("cdc_operation", _S),
        ("cdc_timestamp", _T),
    ]
)
BRONZE_SCHEMA = _fields(
    [(f.name, f.dataType) for f in CDC_LOG_SCHEMA.fields]
    + [
        ("data_hash", _S),
        ("file_name", _S),
        ("insert_timestamp", _T),
        # per-row ingest sequence: insert_timestamp is query-constant per
        # append (current_timestamp evaluates once), so it cannot break
        # intra-batch cdc_timestamp ties — record_seq can, making Silver
        # deterministic given the Bronze bytes
        ("record_seq", _L),
    ]
)
SILVER_SCHEMA = _fields(
    [
        ("id", _L),
        ("country", _S),
        ("district", _S),
        ("visit_timestamp", _T),
        ("utc_visit_timestamp", _T),
        ("num_visitors", _L),
        ("file_name", _S),
        ("data_hash", _S),
        ("cdc_operation", _S),
        ("cdc_timestamp", _T),
        ("insert_timestamp", _T),
    ]
)
GOLD_SCHEMA = _fields([("country", _S), ("sum_visitors", _L)])
QUARANTINE_SCHEMA = _fields(
    [("_corrupt_record", _S), ("file_name", _S), ("insert_timestamp", _T)]
)

BUSINESS_COLS = ["id", "country", "district", "visit_timestamp", "num_visitors"]


def augment_bronze(df: DataFrame) -> DataFrame:
    """Bronze derived columns (``notebooks/demo-notebook.py:168-170``)."""
    out = df.withColumn("data_hash", data_hash(*BUSINESS_COLS))
    if "file_name" not in out.columns:
        out = out.withColumn("file_name", F.input_file_name())
    return out.withColumn(
        "insert_timestamp", F.current_timestamp()
    ).withColumn("record_seq", F.monotonically_increasing_id())


def silver_projection(bronze_batch: DataFrame) -> DataFrame:
    """Silver source projection incl. ``utc_visit_timestamp`` (``:248-259``)."""
    return bronze_batch.select(
        "id",
        "country",
        "district",
        "visit_timestamp",
        to_utc("visit_timestamp").alias("utc_visit_timestamp"),
        "num_visitors",
        "file_name",
        "data_hash",
        "cdc_operation",
        "cdc_timestamp",
        "insert_timestamp",
        # dedup tiebreaker only — not a Silver column (MERGE ignores
        # source columns absent from the target schema)
        "record_seq",
    )


class MedallionPipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        landing_path: str,
        schema_evolution: bool = True,
    ):
        self.spark = spark
        self.root = root
        self.landing_path = landing_path
        self.schema_evolution = schema_evolution
        self.bronze_path = os.path.join(root, "bronze")
        self.silver_path = os.path.join(root, "silver")
        self.gold_path = os.path.join(root, "gold")
        self.quarantine_path = os.path.join(root, "quarantine")
        self.checkpoints = os.path.join(root, "_checkpoints")

    # ------------------------------------------------------------------ DDL

    def create_tables(self) -> None:
        LakeTable.create(self.spark, self.bronze_path, BRONZE_SCHEMA, if_not_exists=True)
        LakeTable.create(
            self.spark,
            self.silver_path,
            SILVER_SCHEMA,
            properties={"enableChangeDataFeed": "true", "statsColumns": "id"},
            if_not_exists=True,
        )
        LakeTable.create(self.spark, self.gold_path, GOLD_SCHEMA, if_not_exists=True)
        LakeTable.create(
            self.spark, self.quarantine_path, QUARANTINE_SCHEMA, if_not_exists=True
        )

    @property
    def bronze(self) -> LakeTable:
        return LakeTable(self.spark, self.bronze_path)

    @property
    def quarantine(self) -> LakeTable:
        return LakeTable(self.spark, self.quarantine_path)

    @property
    def silver(self) -> LakeTable:
        return LakeTable(self.spark, self.silver_path)

    @property
    def gold(self) -> LakeTable:
        return LakeTable(self.spark, self.gold_path)

    # ---------------------------------------------------------------- stages

    def ingest_available(self) -> None:
        """Landing JSON -> Bronze via real Structured Streaming: file source
        paced at 1 file/micro-batch, ``foreachBatch`` append sink, Spark
        checkpoint for exactly-once file tracking
        (``notebooks/demo-notebook.py:158-173``). Malformed records are
        captured to the quarantine table instead of flowing on as all-null
        rows (OSS analogue of Autoloader's rescued-data column).

        With ``schema_evolution`` (default on), each call is a stream-start
        boundary where drift is detected: the persisted schema at
        ``_checkpoints/bronze_schema.json`` is widened with any new landing
        columns (Autoloader ``schemaLocation``/``addNewColumns`` semantics,
        ``notebooks/demo-notebook.py:163-166``) and the Bronze append runs
        with ``merge_schema`` so the new columns land instead of vanishing.
        Silver keeps its fixed DDL (the reference's contract) — evolved
        columns stay Bronze-side until promoted explicitly."""
        schema = CDC_LOG_SCHEMA
        if self.schema_evolution:
            tracker = SchemaTracker(
                self.spark,
                self.landing_path,
                os.path.join(self.checkpoints, "bronze_schema.json"),
                base_schema=CDC_LOG_SCHEMA,
                multiline="auto",
            )
            schema, _new_cols = tracker.evolve()
        # format-auto: a landing zone mixing JSON-array files (the
        # reference's format) and NDJSON (what log shippers emit) ingests
        # every record of both — the plain multiLine reader silently drops
        # all but the first record of an NDJSON file
        stream = read_json_auto_stream(
            self.spark, self.landing_path, schema, corrupt_col="_corrupt_record"
        )
        bronze = self.bronze
        quarantine = self.quarantine

        def sink(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            # input_file_name() must be captured before persist: cached rows
            # no longer carry scan-time file provenance
            batch_df = batch_df.withColumn("file_name", F.input_file_name()).persist()
            try:
                bad = batch_df.where(F.col("_corrupt_record").isNotNull())
                if not bad.isEmpty():
                    # txn guard: a crash between this append and Spark's
                    # streaming-checkpoint commit re-delivers the batch —
                    # the recorded (app, batch_id) makes the replay a no-op
                    # instead of permanent duplicate rows
                    quarantine.append(
                        bad.select(
                            "_corrupt_record",
                            "file_name",
                            F.current_timestamp().alias("insert_timestamp"),
                        ),
                        txn_app_id="pipeline_quarantine",
                        txn_version=int(_batch_id),
                    )
                good = batch_df.where(F.col("_corrupt_record").isNull()).drop(
                    "_corrupt_record"
                )
                if not good.isEmpty():
                    bronze.append(
                        augment_bronze(good),
                        merge_schema=self.schema_evolution,
                        txn_app_id="pipeline_bronze",
                        txn_version=int(_batch_id),
                    )
            finally:
                batch_df.unpersist()

        (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(self.checkpoints, "bronze"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    def bronze_to_silver_available(self) -> int:
        """New Bronze commits -> dedup + CDC MERGE into Silver
        (``notebooks/demo-notebook.py:232-287``)."""
        silver = self.silver
        reader = LakeStreamReader(
            self.bronze,
            os.path.join(self.checkpoints, "silver.json"),
            mode="append",
            starting_version=0,
        )

        def apply(batch: DataFrame, version: int) -> None:
            # order guard: a LATE re-delivered older batch (cross-batch
            # reordering) must never regress Silver to stale values — the
            # hash guard alone only absorbs identical re-delivery.
            # insert_timestamp rides as the second (lexicographic) guard
            # column: it is the Bronze ingest time, immutable under replay
            # and strictly later for later-ingested batches, so a change
            # whose cdc_timestamp EQUALS the stored row's (two changes to
            # one key inside one timestamp tick, split across batches)
            # still applies, while replayed older batches stay blocked —
            # a single strict cdc_timestamp guard would drop it forever.
            merge_cdc_batch(
                silver,
                silver_projection(batch),
                key_cols=["id"],
                order_cols=["cdc_timestamp"],
                tiebreak_cols=["insert_timestamp", "record_seq"],
                order_guard_cols=["cdc_timestamp", "insert_timestamp"],
            )

        return reader.process_available(apply)

    def silver_to_gold_available(self) -> int:
        """Silver change feed -> signed deltas -> additive MERGE into Gold
        (``notebooks/demo-notebook.py:378-435``)."""
        gold = self.gold
        reader = LakeStreamReader(
            self.silver,
            os.path.join(self.checkpoints, "gold.json"),
            mode="cdf",
            starting_version=1,
        )

        def apply(changes: DataFrame, version: int) -> None:
            deltas = cdf_signed_deltas(
                changes, group_cols=["country"], value_col="num_visitors"
            ).withColumnRenamed("delta_value", "delta_visitors")
            # txn guard keyed on the source CDF version: additive merges
            # are NOT naturally idempotent (total += delta re-applies on
            # replay after a crash before the reader's offset write)
            merge_agg_delta(
                gold,
                deltas,
                group_cols=["country"],
                agg_col="sum_visitors",
                delta_col="delta_visitors",
                txn_app_id="pipeline_gold",
                txn_version=version,
            )

        return reader.process_available(apply)

    def run_available(self) -> None:
        """Process everything currently in the landing zone through all
        three stages (the demo's "run until caught up" loop)."""
        self.create_tables()
        self.ingest_available()
        self.bronze_to_silver_available()
        self.silver_to_gold_available()
