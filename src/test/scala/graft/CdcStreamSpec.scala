package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcStream, MergeApply, StreamFiles}
import graft.cdc.CdcStream.StreamConfig
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

class CdcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "stream-spec")

  private def tmp(): String = Files.createTempDirectory("graft-stream-").toString

  /** Write the emitted (out-of-order) event stream as N parquet files —
    * the file-based change log the stream tails.
    */
  private def writeEventFiles(cfg: GenConfig, dir: String, nFiles: Int): Unit = {
    val all = ChangeGen.emittedEvents(spark, cfg).collect()
    all.grouped(math.max(1, (all.length + nFiles - 1) / nFiles)).zipWithIndex.foreach {
      case (chunk, i) =>
        import spark.implicits._
        StreamFiles.writeFlat(spark.createDataset(chunk.toSeq).toDF(), dir, f"chunk-$i%04d")
    }
  }

  private def stateOf(table: LakeTable): Seq[(String, Int, String)] = {
    import spark.implicits._
    table.read().orderBy("conv_id", "turn_idx")
      .select($"conv_id", $"turn_idx".cast("int"), $"text")
      .as[(String, Int, String)].collect().toSeq
  }

  private def oracleOf(cfg: GenConfig): Seq[(String, Int, String)] = {
    val events = (0L until cfg.totalRows).map(i => ChangeGen.rowAt(cfg, i))
    ChangeGen.oracleFold(events).toSeq.sortBy { case ((c, t), _) => (c, t) }
      .map { case ((c, t), turn) => (c, t.toInt, turn.text) }
  }

  test("streamed replay (foreachBatch, AvailableNow) equals oracle; metrics + lineage emitted") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 40, maxTurns = 15, numEvents = 3000)
    writeEventFiles(cfg, s"$base/events", nFiles = 8)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 8)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 2))
    assert(stateOf(table) == oracleOf(cfg))
    assert(table.current.schemaVer == 2) // v2 tail evolved the schema

    val m = CdcStream.metrics(spark, table.root)
    assert(m.count() >= 4) // 8 files / 2 per trigger
    assert(m.select("input_events").collect().map(_.getLong(0)).sum == cfg.totalRows)
    val l = CdcStream.lineage(spark, table.root)
    // every source file is linked to the snapshot that committed it
    assert(l.select("source_file").distinct().count() == 8)

    // S9: QC channel — one row per applied epoch, tombstone counts summing
    // to the generator's delete-event count (observed on the merge plan)
    val qc = CdcStream.qc(spark, table.root)
    assert(qc.count() == m.count())
    val expectedDeletes = (0L until cfg.totalRows)
      .count(i => ChangeGen.rowAt(cfg, i).op == "D")
    assert(qc.select("n_deletes").collect().map(_.getLong(0)).sum == expectedDeletes)
  }

  test("checkpoint resume: second run over same dir applies nothing new, state intact") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 20, maxTurns = 10, numEvents = 1500)
    writeEventFiles(cfg, s"$base/events", nFiles = 4)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp")
    val snapAfter = table.current.id
    val metricsAfter = CdcStream.metrics(spark, table.root).count()

    // restart from the same checkpoint: no new files → no new epochs
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp")
    assert(table.current.id == snapAfter)
    assert(CdcStream.metrics(spark, table.root).count() == metricsAfter)
    assert(stateOf(table) == oracleOf(cfg))

    // new late files arrive → stream picks them up incrementally
    val late = GenConfig(numConvs = 20, maxTurns = 10, numEvents = 2000)
    import spark.implicits._
    val extra = (1500L until late.totalRows).map(i => ChangeGen.rowAt(late, i))
    StreamFiles.writeFlat(spark.createDataset(extra).toDF(), s"$base/events", "late-0001")
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp")
    assert(stateOf(table) == oracleOf(late))
  }

  test("crash replay: re-applying the last epoch out-of-band is fenced, no duplicates") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 15, maxTurns = 8, numEvents = 800)
    writeEventFiles(cfg, s"$base/events", nFiles = 2)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 1))
    val lastEpoch = table.current.epochId
    val before = stateOf(table)
    // simulate the crash-window replay: foreachBatch re-delivers the last
    // micro-batch with the same epochId AND the same writer identity (a
    // replay from the same checkpoint carries the same writerId)
    val replayed = ChangeGen.events(spark, cfg).toDF()
    val st = MergeApply.applyBatch(table, replayed, lastEpoch,
      writerId = CdcStream.writerIdOf(s"$base/cp"))
    assert(!st.applied)
    assert(stateOf(table) == before)
  }

  test("fresh checkpoint: epochs restart at 0 but commits APPLY (no silent fencing)") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 15, maxTurns = 8, numEvents = 800)
    writeEventFiles(cfg, s"$base/events", nFiles = 2)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp1")
    val snapAfter = table.current.id
    val state = stateOf(table)
    // operator restarts the stream with a NEW checkpoint dir: epochIds
    // restart at 0. Per-writer fencing means these commits re-apply (the
    // merge is row-level idempotent) instead of being silently dropped.
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp2")
    assert(table.current.id > snapAfter, "fresh-checkpoint commits were silently fenced")
    assert(stateOf(table) == state)
    assert(stateOf(table) == oracleOf(cfg))
  }

  test("crash window: lost metrics re-emitted from manifest on replay, no duplicates") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 15, maxTurns = 8, numEvents = 1000)
    writeEventFiles(cfg, s"$base/events", nFiles = 4)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 2))
    val lastEpoch = table.current.epochId
    val nMetrics = CdcStream.metrics(spark, table.root).count()
    val state = stateOf(table)
    // simulate the crash between snapshot commit and checkpoint advance,
    // with the metrics write lost: drop the last commit marker (stream will
    // replay the epoch) and the epoch's metrics directory
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    val wid = CdcStream.writerIdOf(s"$base/cp")
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$base/cp/commits/$lastEpoch"), false))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"${table.root}/_metrics/$wid/e$lastEpoch"), true))
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 2))
    // commit was fenced (no double apply), but the metrics row came back
    assert(stateOf(table) == state)
    val m = CdcStream.metrics(spark, table.root)
    assert(m.count() == nMetrics, "metrics duplicated or lost after crash replay")
    val replayRow = m.filter(org.apache.spark.sql.functions.col("epoch_id") === lastEpoch).collect()
    assert(replayRow.length == 1)
    assert(replayRow(0).getAs[Long]("input_events") > 0)
  }

  test("crash window after a scheduled compaction: replay attributes the EPOCH snapshot, not the maintenance one") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 15, maxTurns = 8, numEvents = 1200)
    writeEventFiles(cfg, s"$base/events", nFiles = 4)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    val sc = StreamConfig(maxFilesPerTrigger = 2,
      strategy = graft.cdc.WriteStrategy.MergeOnRead, compactEveryEpochs = 2)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp", sc)
    val lastEpoch = table.current.epochId
    assert(table.current.maint, "schedule should leave a compaction commit on top")
    import org.apache.spark.sql.functions.col
    val before = CdcStream.metrics(spark, table.root)
      .filter(col("epoch_id") === lastEpoch).collect()(0)
    val wid = CdcStream.writerIdOf(s"$base/cp")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$base/cp/commits/$lastEpoch"), false))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"${table.root}/_metrics/$wid/e$lastEpoch"), true))
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp", sc)
    val after = CdcStream.metrics(spark, table.root)
      .filter(col("epoch_id") === lastEpoch).collect()
    assert(after.length == 1)
    // the replayed row must point at the epoch's own commit snapshot — the
    // compaction commit carries the epoch's stats forward but has its own
    // id and post-fold row count
    assert(after(0).getAs[Long]("snapshot_id") == before.getAs[Long]("snapshot_id"))
    assert(after(0).getAs[Long]("input_events") == before.getAs[Long]("input_events"))
  }

  test("observability channels are writer-scoped: a fresh checkpoint's epoch 0 does not clobber the old writer's") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 15, maxTurns = 8, numEvents = 1000)
    writeEventFiles(cfg, s"$base/events", nFiles = 4)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cpA",
      StreamConfig(maxFilesPerTrigger = 2))
    val rowsA = CdcStream.metrics(spark, table.root).count()
    // hand-over: same events re-applied under a fresh checkpoint — its
    // epochIds restart at 0 (row-level idempotent under LWW)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cpB",
      StreamConfig(maxFilesPerTrigger = 2))
    val m = CdcStream.metrics(spark, table.root)
    assert(m.select("writer_id").distinct().count() == 2)
    assert(m.count() == 2 * rowsA, "writer B's epochs overwrote writer A's rows")
    assert(CdcStream.lineage(spark, table.root)
      .select("writer_id").distinct().count() == 2)
  }

  test("streamed merge-on-read with periodic delta folding equals oracle") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 30, maxTurns = 12, numEvents = 2400)
    writeEventFiles(cfg, s"$base/events", nFiles = 8)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 8)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 2,
        strategy = graft.cdc.WriteStrategy.MergeOnRead, compactEveryEpochs = 2))
    assert(stateOf(table) == oracleOf(cfg))
    // 8 files / 2 per trigger = epochs 0..3; folds fire after epochs 1 and
    // 3, so the final table is fully folded back to base files
    assert(table.current.files.forall(_.kind == graft.lake.FileEntry.Base))
    assert(table.current.rows == table.read().count())
  }

  test("lineage survives file-source log compaction: compact epochs list only their own files") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 20, maxTurns = 10, numEvents = 1400)
    writeEventFiles(cfg, s"$base/events", nFiles = 7)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    // Interval 3 → batches 2 and 5 are written as `<id>.compact` files
    // holding ALL entries so far; with the default 10 a short test never
    // crosses a compaction boundary and the regression stays invisible.
    val key = "spark.sql.streaming.fileSource.log.compactInterval"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "3")
    try CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(maxFilesPerTrigger = 1))
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    assert(stateOf(table) == oracleOf(cfg))
    val l = CdcStream.lineage(spark, table.root)
    assert(l.select("source_file").distinct().count() == 7)
    // one file per epoch everywhere — the compact epochs must list exactly
    // their OWN file, neither zero (pre-fix: plain per-batch log file
    // missing) nor the whole history (unfiltered compact read)
    val perEpoch = l.groupBy("epoch_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perEpoch == (0L until 7L).map(_ -> 1L).toMap)
  }

  test("observability readers are cold-start safe: empty channels, not exceptions") {
    val base = tmp()
    LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    // no epoch has applied → no _metrics/_qc/_lineage dirs exist yet
    assert(CdcStream.metrics(spark, s"$base/table").count() == 0L)
    assert(CdcStream.qc(spark, s"$base/table").count() == 0L)
    assert(CdcStream.lineage(spark, s"$base/table").count() == 0L)
    assert(CdcStream.metrics(spark, s"$base/table").columns.contains("events_per_sec"))
  }

  test("legacy (pre-writer-scoping) channel rows are superseded per epoch, kept otherwise") {
    import spark.implicits._
    val base = tmp()
    LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 4)
    val root = s"$base/table"
    // Legacy layout: _metrics/eN parquet with NO writer_id column (as the
    // pre-scoping release wrote it) for epochs 0 and 1.
    def legacy(e: Long): Unit =
      Seq((e, 1L, 100L, 10L, 2, 1, 50L, 10L, 5L, 1.0, 10L, 10L))
        .toDF("epoch_id", "snapshot_id", "input_events", "deduped_keys",
          "touched_buckets", "schema_ver", "max_lsn", "live_rows", "duration_ms",
          "events_per_sec", "observed_rows", "observed_live")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/_metrics/e$e")
    legacy(0L); legacy(1L)
    def scoped(w: String, e: Long, snap: Long): Unit =
      Seq((w, e, snap, 100L, 10L, 2, 1, 50L, 10L, 5L, 1.0, 10L, 10L))
        .toDF("writer_id", "epoch_id", "snapshot_id", "input_events", "deduped_keys",
          "touched_buckets", "schema_ver", "max_lsn", "live_rows", "duration_ms",
          "events_per_sec", "observed_rows", "observed_live")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/_metrics/$w/e$e")
    // Post-upgrade crash replay re-emits epoch 0 of the SAME commit
    // (snapshot 1 — the replay re-derives the id from the epoch commit
    // itself): the legacy row is superseded.
    scoped("w1", 0L, snap = 1L)
    // A FRESH-checkpoint writer reuses epoch number 1 for a DIFFERENT
    // batch (snapshot 7): both rows are real — a bare epoch-id supersede
    // would hide the legacy batch and undercount every aggregate.
    scoped("w2", 1L, snap = 7L)
    val m = CdcStream.metrics(spark, root)
    // Epoch 0 appears ONCE (scoped replay wins over its own legacy row).
    assert(m.filter($"epoch_id" === 0L).count() == 1L)
    assert(m.filter($"epoch_id" === 0L && $"writer_id".isNotNull).count() == 1L)
    // Epoch 1: the legacy batch AND w2's unrelated batch both survive.
    assert(m.filter($"epoch_id" === 1L).count() == 2L)
    assert(m.filter($"epoch_id" === 1L && $"writer_id".isNull).count() == 1L)
    assert(m.count() == 3L)
  }

  test("A8 observe: merge metrics ride the write plan and match file stats") {
    val base = tmp()
    val cfg = GenConfig(numConvs = 20, maxTurns = 10, numEvents = 1200)
    val table = LakeTable.create(spark, s"$base/table", schemaVer = 2, numBuckets = 4)
    val st = MergeApply.applyBatch(table, ChangeGen.events(spark, cfg).toDF(), 0L)
    assert(st.applied)
    assert(st.observedRows == st.dedupedKeys,
      s"observed ${st.observedRows} != file-stat ${st.dedupedKeys}")
    assert(st.observedLive == table.read().count())
  }
}
