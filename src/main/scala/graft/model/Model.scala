package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model for the CDC/incremental-ingest engine.
  *
  * Target table shape is mandated by the north rule (BASELINE.json
  * `input_hint`): multi-turn conversation transcripts keyed on
  * `(conv_id, turn_idx)`. The change-event envelope mirrors the
  * reference's staged-batch lineage columns (reference:
  * Scripts/database_schema.sql:200-217 — `line_no` as a monotone
  * per-batch sequence, PK-enforced dedup keys).
  */
object Model {

  /** A single transcript turn — the row type of the maintained lake table. */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String],
      ts: Timestamp)

  /** One CDC change event. `op` is I (insert) | U (update) | D (delete);
    * `lsn` is a globally monotone sequence number (reference analog:
    * `line_no` + identity ordering, Scripts/database_schema.sql:147,208);
    * `schema_ver` tags the writer schema for schema evolution.
    * Payload columns are null for deletes (keys excepted).
    */
  final case class ChangeEvent(
      lsn: Long,
      op: String,
      schema_ver: Int,
      conv_id: String,
      turn_idx: Int,
      role: Option[String],
      text: Option[String],
      tool: Option[String],
      ts: Option[Timestamp])

  /** Merge key of the transcripts table. */
  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")

  /** Schema v1: initial transcript schema (no `tool` column yet). */
  val transcriptSchemaV1: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Schema v2: adds nullable `tool` (the added-column evolution case,
    * reference analog: dynamic staging DDL,
    * Scripts/ETL_Framework_Implementation.sql:258-291).
    */
  val transcriptSchemaV2: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Schema v3: widens `turn_idx` int32 → int64 (the type-widening
    * evolution case). Read-side conformance casts v1/v2 files up.
    */
  val transcriptSchemaV3: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", LongType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Registry of known schema versions, applied per-batch as events with a
    * newer `schema_ver` arrive (north rule: "versioned schema registry
    * applied per batch").
    */
  val schemaRegistry: Map[Int, StructType] = Map(
    1 -> transcriptSchemaV1,
    2 -> transcriptSchemaV2,
    3 -> transcriptSchemaV3)

  /** Change-event wire schema (the file-stream source schema).
    *
    * `turn_idx` is int32 HERE by design, not oversight: this is the
    * envelope old producers keep emitting after the v3 table widening —
    * exactly the binlog reality the widening exists for (narrow writers,
    * wide storage). A v3-native producer would ship a wide envelope and
    * its batches conform up the same per-batch registry path; the int64
    * evolution is therefore exercised storage-side (MergeApplySpec v3
    * widening), while the wire stays the lowest common width. int32 turns
    * bound one conversation at 2^31 turns — not a 10^10-EVENT limit
    * (events are unbounded; turn_idx is a per-conversation position).
    */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("schema_ver", IntegerType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}
