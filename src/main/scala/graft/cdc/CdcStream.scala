package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.model.Model

/** The streaming face of the engine: tail a change-event log (file-based
  * source — the sandbox's Kafka stand-in) and merge-apply each micro-batch
  * into the lake table via foreachBatch.
  *
  * Exactly-once chain (north rule):
  *   checkpointed source offsets → foreachBatch epochId → fenced snapshot
  *   commit. A crash between the table commit and the checkpoint advance
  *   replays the epoch; the fence turns the replay into a no-op, so the
  *   table never double-applies (reference analog: content-hash batch
  *   dedup, Docs/etl_requirements_reviewed_by_sr.md:162-165).
  *
  * Per-batch observability (reference analog: meta.etl_process_log rows
  * per step/batch, enhanced_main_etl_logging.py:219-286):
  *   - `<table>/_metrics`: one row per applied epoch — input events,
  *     deduped keys, touched buckets, duration, events/sec, snapshot id
  *   - `<table>/_lineage`: per-partition lineage — source file → epoch →
  *     committed snapshot id (north rule: "source offset → snapshot ID")
  * Both are written only when the commit actually applied, so replays do
  * not duplicate metric rows.
  */
object CdcStream {

  /** @param strategy copy-on-write (default) or merge-on-read delta
    *                  appends (see [[WriteStrategy]])
    * @param compactEveryEpochs under merge-on-read, fold the delta stack
    *                  back to base files every N applied epochs (0 = never;
    *                  compaction is itself a fenceless maintenance commit,
    *                  so a crash mid-compaction is harmless)
    * @param retry    engine-level retry of a failed epoch apply, config
    *                  data via [[graft.enrich.RulesConfig]]'s `retry`
    *                  section (see [[RetryPolicy]]; deterministic failures
    *                  never retry). Retrying the whole foreachBatch body is
    *                  safe: the epoch fence makes an already-committed
    *                  apply a no-op and metric emission is
    *                  overwrite-by-epoch.
    */
  /** @param expireEveryEpochs run snapshot expiry + orphan GC every N
    *                  applied epochs (0 = never): the in-stream face of the
    *                  retention lifecycle, so an unattended long-running
    *                  stream's `_meta`/data graveyard stays bounded without
    *                  an out-of-band maintenance job. Retention knobs
    *                  mirror [[LakeTable.expireSnapshots]]; the orphan
    *                  grace defaults to the multi-writer-safe value — only
    *                  a deployment certain it is the sole writer should
    *                  lower it.
    */
  final case class StreamConfig(
      maxFilesPerTrigger: Int = 4,
      saltFactor: Int = 4,
      availableNow: Boolean = true,
      triggerMs: Long = 500L,
      mode: MergeMode = MergeMode.Upsert,
      strategy: WriteStrategy = WriteStrategy.CopyOnWrite,
      compactEveryEpochs: Int = 0,
      retry: RetryPolicy = RetryPolicy.default,
      expireEveryEpochs: Int = 0,
      expireKeepLast: Int = 2,
      expireOlderThanMs: Long = -1L,
      expireOrphanGraceMs: Long = LakeTable.defaultOrphanGraceMs)

  /** Stream identity for epoch fencing: a UUID minted on first use and
    * persisted INSIDE the checkpoint (`<checkpoint>/graft-writer-id`) —
    * the (txnAppId, version)-style identity Delta keeps in its own
    * checkpoint state. Stable across restarts of the SAME checkpoint
    * (epochIds are scoped to a checkpoint); a WIPED or fresh checkpoint
    * mints a new id. Hashing the checkpoint PATH (the previous scheme)
    * breaks exactly the wipe case: a checkpoint deleted for corruption
    * recovery and re-created at the same path restarts epochs at 0 under
    * the OLD identity, so its first epochs fall under the old watermark
    * and genuinely new batches are silently fenced — data loss with no
    * error. Create-exclusive write settles concurrent first starts; the
    * loser reads the winner's id.
    */
  def writerIdOf(checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "graft-writer-id")
    // Resolve the checkpoint FS through the SESSION's Hadoop conf when a
    // session exists (spark.hadoop.* carries s3a/abfs/gcs credentials and
    // endpoints — a bare Configuration() can fail to authenticate or
    // resolve a different FS than the stream itself); bare defaults only
    // when no session is up at all.
    val conf = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(hadoopConf).getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) return LakeTable.readString(fs, p).trim
    // Upgrade compat: a checkpoint created BEFORE the id file existed has
    // offsets/commits but no id. Minting a fresh UUID would change identity
    // while epochIds continue from N — the crash-window batch at upgrade
    // time would re-apply unfenced (benign for LWW table state, but a
    // duplicate snapshot/metrics row; additive tables fall back to the
    // hash window). Seed with the legacy path-hash id those checkpoints
    // committed under instead; only a genuinely EMPTY checkpoint mints.
    val legacyState =
      fs.exists(new org.apache.hadoop.fs.Path(checkpointDir, "offsets")) ||
        fs.exists(new org.apache.hadoop.fs.Path(checkpointDir, "commits"))
    val fresh =
      if (legacyState) {
        val d = java.security.MessageDigest.getInstance("SHA-256")
          .digest(checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        "w-" + d.take(6).map(b => f"$b%02x").mkString
      } else "w-" + java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    fs.mkdirs(p.getParent)
    // same atomic-claim primitive the snapshot commits use (NIO CREATE_NEW
    // on file://, where Hadoop's create(overwrite=false) is non-atomic)
    if (LakeTable.writeStringExclusive(fs, p, fresh)) fresh
    else LakeTable.readString(fs, p).trim
  }

  def start(
      spark: SparkSession,
      table: LakeTable,
      eventsDir: String,
      checkpointDir: String,
      cfg: StreamConfig = StreamConfig()): StreamingQuery = {
    val wid = writerIdOf(checkpointDir)
    val events = spark.readStream
      .schema(Model.changeEventSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(eventsDir)
    // Retry scope is PER PHASE, not the whole epoch body: a transient
    // failure in a post-commit write must retry only that write — wrapping
    // everything would re-run the (now epoch-fenced) merge and take the
    // applied=false path, silently dropping the epoch's QC row and its
    // scheduled compaction on every transient post-commit error. Each
    // phase retries safely on its own: the merge is commit-fenced, the
    // observability channels overwrite by epoch, and compaction is
    // idempotent maintenance.
    val writer = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val stats = Retry.run(cfg.retry, s"epoch $epochId apply") {
          MergeApply.applyBatch(table, batch, epochId, cfg.saltFactor,
            mode = cfg.mode, writerId = wid, strategy = cfg.strategy)
        }
        Retry.run(cfg.retry, s"epoch $epochId observability") {
          if (stats.applied) {
            emitMetrics(spark, table.root, wid, stats)
            emitQc(spark, table.root, wid, stats)
            emitLineage(spark, table.root, wid, stats,
              sourceFilesOf(spark, checkpointDir, epochId))
          } else {
            // Crash-window replay: the epoch's commit already applied but
            // the metrics/lineage writes may have been lost with the crash.
            // The commit stats live in the manifest, so the rows are
            // re-derived and re-written — combined with overwrite-by-epoch
            // emission this makes observability exactly-once, not
            // at-most-once. (QC is not replayed: its observed values rode
            // the lost write plan and are not recoverable from the
            // manifest; fabricating zeros would be worse than absence.)
            // Maintenance commits CARRY the epoch's stats forward but have
            // their own snapshot id and post-maintenance row count — and a
            // SECOND writer sharing the table (a first-class shape: LWW
            // makes cross-writer applies safe) may have committed its own
            // epochs on top before this replay runs. Walk parents past
            // both until THIS writer's commit of THIS epoch is found; the
            // walk is bounded by retention, and an expired / absent target
            // means the true stats are gone: skip (absence beats wrong
            // attribution).
            // The walk is additionally BOUNDED by the per-writer epoch
            // watermark: when `fenced` is false at a snapshot, this
            // writer's commit of this epoch is not there or deeper — in
            // particular a batch that was content-hash-fenced (applied =
            // false with NO matching snapshot) skips the walk entirely
            // instead of reading every retained manifest back to the root
            // on each replay.
            var cur = table.current
            var walkable = true
            while (walkable &&
              !(!cur.maint && cur.epochId == epochId && cur.writerId == wid) &&
              cur.parent >= 0 && table.fenced(cur, epochId, wid))
              try cur = table.snapshot(cur.parent)
              catch { case scala.util.control.NonFatal(_) => walkable = false }
            if (walkable && !cur.maint && cur.epochId == epochId &&
              cur.writerId == wid && cur.inputEvents >= 0) {
              val replayStats = BatchStats(epochId, applied = true, cur.id,
                cur.inputEvents, cur.dedupedKeys, 0, cur.schemaVer, cur.maxLsn,
                cur.rows, cur.mergeMs)
              emitMetrics(spark, table.root, wid, replayStats)
              emitLineage(spark, table.root, wid, replayStats,
                sourceFilesOf(spark, checkpointDir, epochId))
            }
          }
        }
        // Maintenance fires on the SCHEDULE, not on `applied`: a fenced
        // re-run of the scheduled epoch must not skip its compaction round
        // (the delta stack would grow for another full period).
        if (cfg.compactEveryEpochs > 0 &&
          epochId % cfg.compactEveryEpochs == (cfg.compactEveryEpochs - 1))
          Retry.run(cfg.retry, s"epoch $epochId compaction") {
            table.compact(foldDeltas = true)
          }
        if (cfg.expireEveryEpochs > 0 &&
          epochId % cfg.expireEveryEpochs == (cfg.expireEveryEpochs - 1))
          Retry.run(cfg.retry, s"epoch $epochId expiry") {
            val r = table.expireSnapshots(cfg.expireKeepLast, cfg.expireOrphanGraceMs,
              cfg.expireOlderThanMs)
            // retention activity is part of the stream's operational log
            if (r.snapshotsDeleted + r.dataFilesDeleted + r.commitDirsReclaimed > 0)
              System.err.println(s"[stream] epoch $epochId expiry: $r")
            r
          }
        ()
      }
    (if (cfg.availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(cfg.triggerMs)))
      .start()
  }

  /** Run the stream to completion over the files currently in `eventsDir`
    * (AvailableNow) and wait — the batch-replay entry point used by tests
    * and the bench.
    */
  def runAvailable(
      spark: SparkSession,
      table: LakeTable,
      eventsDir: String,
      checkpointDir: String,
      cfg: StreamConfig = StreamConfig()): Unit = {
    val q = start(spark, table, eventsDir, checkpointDir, cfg.copy(availableNow = true))
    q.awaitTermination()
  }

  /** The authoritative source-offset record for an epoch: the
    * FileStreamSource commit log at `<checkpoint>/sources/0/<epochId>`
    * (one JSON entry per input file). By the time foreachBatch sees the
    * batch it is a LogicalRDD with no file provenance, so lineage is read
    * from the offset log — which is exactly the "source offset" the north
    * rule asks to link to the committed snapshot id.
    *
    * Every compact-interval-th batch (CompactibleFileStreamLog, default
    * 10) is written as `<epochId>.compact` holding ALL entries so far
    * instead of a plain per-batch file — for those epochs the compact file
    * is read and filtered to THIS batch's entries by their `batchId`
    * field, else 1 in 10 epochs would silently record no lineage.
    */
  private def sourceFilesOf(spark: SparkSession, checkpointDir: String, epochId: Long): Seq[String] = {
    // Only a genuinely ABSENT offset-log entry maps to "no files" (an
    // epoch the source wrote no entry for). Every other failure — a
    // transient FS error opening/reading the log, a parse error — must
    // PROPAGATE so the observability retry re-runs the phase: swallowing
    // it here would record a permanent '<none>' lineage row (the
    // overwrite-by-epoch emission makes that loss final) while Retry.run
    // sees success; the same rule channel() states for its reads.
    val dir = new org.apache.hadoop.fs.Path(s"$checkpointDir/sources/0")
    val fs = dir.getFileSystem(hadoopConf(spark))
    val plain = new org.apache.hadoop.fs.Path(dir, epochId.toString)
    val compacted = new org.apache.hadoop.fs.Path(dir, s"$epochId.compact")
    // exists→read is not atomic against the source's log compactor: the
    // plain per-batch file can vanish between the two calls when this epoch
    // IS the compaction batch. Its entries live on in `<epochId>.compact`,
    // so a lost race re-routes there — returning Nil would permanently
    // record '<none>' lineage for a batch whose offsets are still on disk.
    val attempt: Option[(String, Boolean)] =
      (if (fs.exists(plain))
         try Some((LakeTable.readString(fs, plain), false))
         catch { case _: java.io.FileNotFoundException => None } // raced the compactor
       else None)
        .orElse(
          if (fs.exists(compacted))
            try Some((LakeTable.readString(fs, compacted), true))
            catch { case _: java.io.FileNotFoundException => None }
          else None)
    val (content, fromCompact) = attempt.getOrElse(return Nil)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def keep(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
      !fromCompact || !n.has("batchId") || n.get("batchId").asLong() == epochId
    content.linesIterator.filter(l => l.startsWith("{") || l.startsWith("["))
      .flatMap { line =>
        val n = mapper.readTree(line)
        if (n.isArray)
          (0 until n.size()).map(n.get).filter(keep)
            .map(_.get("path").asText())
        else if (n.has("path") && keep(n)) Seq(n.get("path").asText())
        else Nil
      }.toSeq
  }

  /** One metrics row per applied (writer, epoch), written OVERWRITE into a
    * per-writer per-epoch directory — re-emission after a crash replaces
    * rather than duplicates. The WRITER scoping is load-bearing: epochIds
    * restart at 0 under a fresh checkpoint (a first-class hand-over the
    * per-writer commit fence exists for), so an epoch-only key would let
    * writer B's epoch 0 clobber writer A's epoch-0 observability rows.
    */
  private def emitMetrics(spark: SparkSession, root: String, wid: String,
      s: BatchStats): Unit = {
    import spark.implicits._
    val eps = if (s.durationMs > 0) s.inputEvents * 1000.0 / s.durationMs else 0.0
    Seq((wid, s.epochId, s.snapshotId, s.inputEvents, s.dedupedKeys, s.touchedBuckets,
      s.schemaVer, s.maxLsn, s.liveRows, s.durationMs, eps, s.observedRows, s.observedLive))
      .toDF("writer_id", "epoch_id", "snapshot_id", "input_events", "deduped_keys",
        "touched_buckets", "schema_ver", "max_lsn", "live_rows", "duration_ms",
        "events_per_sec", "observed_rows", "observed_live")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_metrics/$wid/e${s.epochId}")
  }

  /** S9 ▸ QC channel: per-epoch batch-quality metrics — tombstone count
    * over input events (head agg, narrow columns only) and null-payload
    * count over the RESOLVED live rows (observed on the merge write plan,
    * so the fat payload column is never scanned twice) — advisory channel,
    * emitted per applied epoch (reference: _load_qc_metrics study-level QC
    * rows, Scripts/python/enhanced_main_etl.py:998-1020).
    */
  private def emitQc(spark: SparkSession, root: String, wid: String,
      s: BatchStats): Unit = {
    import spark.implicits._
    val delRate = if (s.inputEvents > 0) s.qcDeletes.toDouble / s.inputEvents else 0.0
    val nullRate = if (s.observedLive > 0) s.qcNullText.toDouble / s.observedLive else 0.0
    Seq((wid, s.epochId, s.inputEvents, s.qcDeletes, s.qcNullText, delRate, nullRate))
      .toDF("writer_id", "epoch_id", "input_events", "n_deletes", "n_null_text",
        "delete_rate", "null_text_rate")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_qc/$wid/e${s.epochId}")
  }

  /** Hadoop conf per session, weakly keyed: `sessionState.newHadoopConf()`
    * deep-copies the whole SparkConf + Hadoop resource set (~100 ms,
    * measured at LakeTable's per-commit listing) — per-epoch metadata
    * probes must not pay that on the serial driver path every batch.
    */
  private val hadoopConfCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, org.apache.hadoop.conf.Configuration]())

  private def hadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration = {
    val got = hadoopConfCache.get(spark)
    if (got != null) got
    else {
      val c = spark.sessionState.newHadoopConf()
      hadoopConfCache.put(spark, c)
      c
    }
  }

  /** Read back the QC table. */
  /** Cold-start safe read of an observability channel: a table where no
    * epoch has applied yet (or whose every batch was empty/fenced) has no
    * channel directory — monitoring must see an empty table with the
    * channel's schema, not an AnalysisException.
    */
  private def channel(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    // Only a MISSING path means cold start. Any other probe failure
    // (transient FS outage, permissions) must propagate — mapping it to
    // "empty channel" would tell monitoring "no epochs applied" while the
    // data is intact, with the error swallowed.
    val exists = try p.getFileSystem(hadoopConf(spark)).exists(p)
      catch { case _: java.io.FileNotFoundException => false }
    if (exists) spark.read.option("recursiveFileLookup", "true").schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val qcSchema = StructType(Seq(
    StructField("writer_id", StringType),
    StructField("epoch_id", LongType), StructField("input_events", LongType),
    StructField("n_deletes", LongType), StructField("n_null_text", LongType),
    StructField("delete_rate", DoubleType), StructField("null_text_rate", DoubleType)))

  private val metricsSchema = StructType(Seq(
    StructField("writer_id", StringType),
    StructField("epoch_id", LongType), StructField("snapshot_id", LongType),
    StructField("input_events", LongType), StructField("deduped_keys", LongType),
    StructField("touched_buckets", IntegerType), StructField("schema_ver", IntegerType),
    StructField("max_lsn", LongType), StructField("live_rows", LongType),
    StructField("duration_ms", LongType), StructField("events_per_sec", DoubleType),
    StructField("observed_rows", LongType), StructField("observed_live", LongType)))

  private val lineageSchema = StructType(Seq(
    StructField("writer_id", StringType),
    StructField("source_file", StringType), StructField("epoch_id", LongType),
    StructField("snapshot_id", LongType)))

  /** Drop LEGACY layout rows superseded by writer-scoped ones. Channels
    * written before writer scoping lived at `_channel/eN` with no
    * writer_id column (read back as null writer_id); a crash-window
    * replay after the upgrade re-emits the same epoch into
    * `_channel/<writer>/eN`, so without this filter monitoring would see
    * the epoch twice (duplicated input_events in any aggregate).
    *
    * The supersede key is (epoch_id, snapshot_id), NOT epoch_id alone: a
    * post-upgrade writer under a FRESH checkpoint restarts its epochs at
    * 0, so a bare epoch match would hide legacy rows describing DIFFERENT
    * batches that genuinely applied (undercounted aggregates). Only a
    * re-emission of the SAME commit — same epoch AND same snapshot —
    * duplicates a legacy row.
    */
  private def dropSupersededLegacy(df: DataFrame): DataFrame = {
    val key = Seq("epoch_id", "snapshot_id")
    val scoped = df.filter(col("writer_id").isNotNull)
    val legacyLive = df.filter(col("writer_id").isNull)
      .join(scoped.select(key.map(col): _*).distinct(), key, "left_anti")
    scoped.unionByName(legacyLive.select(scoped.columns.map(col).toSeq: _*))
  }

  /** QC rows are NEVER superseded across layouts: the crash-window replay
    * deliberately does not re-emit QC (its observed values rode the lost
    * write plan), so a scoped QC row for a legacy epoch id can only come
    * from a DIFFERENT batch (a fresh-checkpoint writer reusing the
    * number) — both rows are real and must both survive.
    */
  def qc(spark: SparkSession, tableRoot: String): DataFrame =
    channel(spark, s"$tableRoot/_qc", qcSchema)

  private def emitLineage(spark: SparkSession, root: String, wid: String,
      s: BatchStats, sourceFiles: Seq[String]): Unit = {
    import spark.implicits._
    val rows = if (sourceFiles.isEmpty) Seq((wid, "<none>", s.epochId, s.snapshotId))
      else sourceFiles.map(f => (wid, f, s.epochId, s.snapshotId))
    rows.toDF("writer_id", "source_file", "epoch_id", "snapshot_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_lineage/$wid/e${s.epochId}")
  }

  /** Read back the metrics table (per-batch observability surface). */
  def metrics(spark: SparkSession, tableRoot: String): DataFrame =
    dropSupersededLegacy(channel(spark, s"$tableRoot/_metrics", metricsSchema))

  /** Read back the lineage table: source file → epoch → snapshot. */
  def lineage(spark: SparkSession, tableRoot: String): DataFrame =
    dropSupersededLegacy(channel(spark, s"$tableRoot/_lineage", lineageSchema))
}
