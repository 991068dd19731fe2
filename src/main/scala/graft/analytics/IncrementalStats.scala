package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.RelationalQueries.Q
import graft.cdc.MergeApply
import graft.lake.LakeTable

/** T5 ▸ incremental sufficient-statistics upsert — the reference's
  * "update pooled stats per new study WITHOUT a full rescan" promise
  * (reference: Docs/etl_requirements_reviewed_by_sr.md:420,622-625)
  * running on the engine's own machinery: per micro-batch, aggregate
  * per-group sufficient-stat DELTAS (k, Σw, Σw², Σwθ, Σwθ²) and MERGE-ADD
  * them into a snapshot-committed stats LakeTable (epoch-fenced, bucketed,
  * copy-on-write — the same commit protocol as the transcript table).
  * Pooled DerSimonian–Laird columns are closed-form derivations ON READ,
  * so the stored state stays additive and the merge stays commutative:
  * batch order cannot change the final state.
  *
  * Scale shape: each batch costs one partial-aggregated scan of the batch
  * plus a rewrite of touched stat buckets — state size is O(groups), never
  * O(events), which is exactly why the incremental path beats the full
  * rescan at 10^10 events.
  */
object IncrementalStats {

  /** Stored state: one row per group of additive sufficient statistics. */
  val statsSchema: StructType = StructType(Seq(
    StructField("group_key", StringType, nullable = false),
    StructField("k", LongType),
    StructField("s1", DoubleType),
    StructField("s2", DoubleType),
    StructField("st", DoubleType),
    StructField("st2", DoubleType)))

  val registry: Map[Int, StructType] = Map(1 -> statsSchema)

  private val statCols = Seq("k", "s1", "s2", "st", "st2")

  def createTable(spark: SparkSession, root: String, numBuckets: Int = 8): LakeTable =
    LakeTable.create(spark, root, schemaVer = 1, numBuckets = numBuckets,
      registry = registry, keyCols = Seq("group_key"))

  /** Per-group sufficient-stat deltas of one batch of (group_key, theta, w)
    * observations — the map-side-combined single shuffle per batch.
    *
    * `_hsum` rides along: the additive per-group sum of each RAW
    * observation row's xxhash64 (over the batch's exact stored column
    * values, all columns). Summing per-group sums gives the batch content
    * hash over the raw rows — order- and partition-independent, and
    * immune to the float-summation-order instability that hashing the
    * recomputed double aggregates would have (a redelivered batch summed
    * in a different partition order could miss the guard and double-count).
    * [[applyBatch]] folds it into the commit's content hash and drops it
    * before the merge.
    */
  def deltas(obs: DataFrame): DataFrame =
    obs.groupBy(col("group_key")).agg(
      count(lit(1)).as("k"),
      sum(col("w")).as("s1"),
      sum(col("w") * col("w")).as("s2"),
      sum(col("w") * col("theta")).as("st"),
      sum(col("w") * col("theta") * col("theta")).as("st2"),
      sum(xxhash64(obs.columns.map(col).toSeq: _*).cast(DecimalType(38, 0))).as("_hsum"))

  /** Streaming face of the stats table: tail a directory of observation
    * files and MERGE-ADD each micro-batch's sufficient-stat deltas —
    * the same exactly-once chain as the transcript stream (checkpointed
    * source offsets → per-writer epoch fence → content-hash re-delivery
    * guard for the non-idempotent ADD). Runs to completion over the files
    * currently present (AvailableNow) and waits.
    */
  def streamAvailable(spark: SparkSession, table: LakeTable, obsDir: String,
      checkpointDir: String, obsSchema: StructType): Unit = {
    val wid = graft.cdc.CdcStream.writerIdOf(checkpointDir)
    // maxFilesPerTrigger is PINNED to 1, not exposed: the content-hash
    // redelivery guard compares whole batches, so it assumes a restarted
    // stream re-chunks the source into the SAME batches. One file per
    // batch makes batch boundaries a property of the (immutable) source
    // files rather than of trigger timing — the only chunking for which
    // that assumption always holds.
    val q = spark.readStream.schema(obsSchema)
      .option("maxFilesPerTrigger", 1).parquet(obsDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(table, deltas(batch), epochId, writerId = wid); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** MERGE-ADD one delta batch into the stats table. Exactly-once via the
    * table's PER-WRITER epoch fence plus a batch content hash: merge-ADD is
    * NOT idempotent under re-apply (unlike the transcript LWW merge), so a
    * stream restarted with a fresh checkpoint — new writerId, epochs back
    * at 0 — must neither be silently fenced (data loss) nor double-add its
    * re-delivered batches (double count). The writer-scoped fence admits
    * the new writer; the content hash (order-independent sum of per-row
    * xxhash64 over the delta, computed inside the same head aggregate)
    * skips exactly the batches whose content was already applied —
    * reference analog: content-hash `batch_id` idempotent loads
    * (Docs/etl_requirements_reviewed_by_sr.md:162-165). Copy-on-write
    * touches only buckets whose groups appear in the batch. Returns false
    * when fenced or empty.
    */
  def applyBatch(table: LakeTable, delta: DataFrame, epochId: Long,
      writerId: String = ""): Boolean = {
    // Batch content hash over the RAW observation rows (folded from the
    // per-group `_hsum` sums deltas() carries — exact values, no float
    // recomputation), falling back to hashing the delta columns when the
    // caller built its own delta without `_hsum`.
    // UPGRADE NOTE: this definition replaced a float-aggregate hash, so
    // hashes recorded by the previous release never match ones computed
    // here — the redelivery guard is blind across that one upgrade.
    // Operational rule: do not swap checkpoints in the same deploy that
    // upgrades the engine (the per-writer epoch fence then covers
    // redelivery on its own, no hash needed).
    val bhCol =
      if (delta.columns.contains("_hsum")) LakeTable.batchContentHashFromSums(col("_hsum"))
      else {
        // Order-UNSTABLE fallback: hashing recomputed float aggregates can
        // change across partition orders, so a redelivered batch may slip
        // the fence and double-count. Loud at build time — callers should
        // construct deltas via deltas() so the exact `_hsum` rides along.
        System.err.println("[stats] delta lacks _hsum: content-hash fence falls back to " +
          "FLOAT-aggregate hashing (order-unstable across recomputation) — redelivery " +
          "protection is best-effort; build deltas via IncrementalStats.deltas()")
        LakeTable.batchContentHash(Seq(col("group_key"), col("k"), col("s1"),
          col("s2"), col("st"), col("st2")))
      }
    // the merge itself is the shared exactly-once ADD kernel
    AdditiveMerge(table, delta, epochId, writerId, bhCol)
  }

  /** Pooled DerSimonian–Laird columns from the stored state — identical
    * closed form to the one-shot a9 aggregate, so incremental-over-k-batches
    * must equal one-shot-over-the-union (IncrementalStatsSpec property;
    * driver oracle = full recompute in DuckDB).
    */
  def derive(state: DataFrame): DataFrame =
    state.select(col("group_key").as("event_type") +: col("k") +:
      graft.functions.StatFunctions.dlPooledCols: _*)

  /** Driver catalog entry: replay the events table as 4 delta batches into
    * a fresh stats table (addition commutes, so the pmod split needs no
    * ordering), then derive the pooled view. The DuckDB oracle recomputes
    * everything in one shot — the strongest equality the incremental path
    * can be held to.
    */
  private val t5 = Q("t5_incremental_stats",
    (spark, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-stats-").toString + "/stats"
      val table = createTable(spark, root)
      val obs = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("group_key"), col("value").as("theta"),
          (lit(1.0) / (lit(1.0) + col("value") * col("value"))).as("w"),
          col("event_id"))
      (0 until 4).foreach { batch =>
        val applied = applyBatch(table,
          deltas(obs.filter(pmod(col("event_id"), lit(4)) === batch)), batch.toLong)
        require(applied, s"stats batch $batch unexpectedly fenced")
      }
      derive(table.read()).orderBy("event_type")
    },
    Some(s"""WITH s AS (
              SELECT event_type, count(*) AS k,
                     sum(w) AS s1, sum(w*w) AS s2,
                     sum(w*value) AS st, sum(w*value*value) AS st2
              FROM (SELECT event_type, value, 1.0/(1.0+value*value) AS w FROM events)
              GROUP BY event_type)
            SELECT event_type, k,
                   ${graft.functions.StatFunctions.dlPooledSql}
            FROM s ORDER BY event_type"""))

  val all: Seq[Q] = Seq(t5)
}
