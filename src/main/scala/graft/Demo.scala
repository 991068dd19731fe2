package graft

import org.apache.spark.sql.functions._

import graft.cdc.MergeApply
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

/** CLI entry point: replay a deterministic CDC change stream into a fresh
  * lake table and print the per-batch stats + final-state summary.
  *
  * Usage: runMain graft.Demo [events] [batches] [cores] [tableDir] [mode]
  * mode = batch (default) | stream (Structured Streaming foreachBatch path
  * with checkpoint, metrics and lineage tables).
  * (also the spark-submit main for ad-hoc runs on a real cluster).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val events = if (args.length > 0) args(0).toLong else 20000L
    val batches = if (args.length > 1) args(1).toInt else 4
    val cores = if (args.length > 2) args(2).toInt else 8
    val dir = if (args.length > 3) args(3)
      else java.nio.file.Files.createTempDirectory("graft-demo-").toString
    val mode = if (args.length > 4) args(4) else "batch"
    if (mode == "stream") { runStream(events, batches, cores, dir); return }
    val spark = Sessions.local(cores, appName = "graft-demo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = GenConfig(numEvents = events)
    val root = s"$dir/transcripts"
    val table =
      if (LakeTable.exists(spark, root)) LakeTable.load(spark, root)
      else LakeTable.create(spark, root, schemaVer = 1, numBuckets = 32)

    val per = math.max(1L, (cfg.totalRows + batches - 1) / batches)
    val startEpoch = table.current.epochId + 1
    (0 until batches).foreach { b =>
      val slice = ChangeGen.eventSlice(spark, cfg, b * per, math.min(cfg.totalRows, (b + 1) * per))
      val st = MergeApply.applyBatch(table, slice.toDF(), startEpoch + b)
      println(s"[demo] epoch=${st.epochId} applied=${st.applied} snapshot=${st.snapshotId} " +
        s"events=${st.inputEvents} keys=${st.dedupedKeys} buckets=${st.touchedBuckets} " +
        s"schemaVer=${st.schemaVer} liveRows=${st.liveRows} ms=${st.durationMs}")
    }

    val out = table.read()
    val n = out.count()
    println(s"[demo] table=$root snapshot=${table.current.id} schemaVer=${table.current.schemaVer} liveRows=$n")
    out.orderBy("conv_id", "turn_idx").show(5, truncate = false)

    // oracle check
    val oracle = ChangeGen.oracleDf(spark, cfg)
    val diff = out.select($"conv_id", $"turn_idx".cast("long").as("turn_idx"), $"role", $"text")
      .except(oracle.toDF().select($"conv_id", $"turn_idx".cast("long").as("turn_idx"), $"role", $"text"))
      .count()
    println(s"[demo] oracle-diff-rows=$diff (${if (diff == 0) "MATCH" else "MISMATCH"})")
    spark.stop()
  }

  /** Streaming-mode demo: write the change log as files, tail it with the
    * Structured Streaming engine (foreachBatch + checkpoint), then report
    * metrics / lineage / oracle equality.
    */
  private def runStream(events: Long, nFiles: Int, cores: Int, dir: String): Unit = {
    import graft.cdc.{CdcStream, StreamFiles}
    import graft.cdc.CdcStream.StreamConfig
    val spark = Sessions.local(cores, appName = "graft-demo-stream")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = GenConfig(numEvents = events)
    // Distributed chunked write (no driver collect): the stream demo runs
    // at any scale the batch path does.
    val nChunks = StreamFiles.writeChunkedOrdered(
      ChangeGen.emittedKeyed(spark, cfg), s"$dir/events", nFiles, Seq("k", "i"), "e")
    println(s"[demo] wrote $nChunks stream chunk files under $dir/events")
    val table =
      if (LakeTable.exists(spark, s"$dir/transcripts")) LakeTable.load(spark, s"$dir/transcripts")
      else LakeTable.create(spark, s"$dir/transcripts", schemaVer = 1, numBuckets = 32)
    CdcStream.runAvailable(spark, table, s"$dir/events", s"$dir/cp",
      StreamConfig(maxFilesPerTrigger = 1))
    println(s"[demo] stream done: snapshot=${table.current.id} schemaVer=${table.current.schemaVer} " +
      s"liveRows=${table.current.rows}")
    CdcStream.metrics(spark, table.root).orderBy("epoch_id").show(100, truncate = false)
    val lin = CdcStream.lineage(spark, table.root)
    println(s"[demo] lineage rows=${lin.count()} distinct-sources=" +
      lin.select("source_file").distinct().count())
    val oracle = ChangeGen.oracleDf(spark, cfg)
    val diff = table.read()
      .select($"conv_id", $"turn_idx".cast("long").as("turn_idx"), $"role", $"text")
      .except(oracle.toDF().select($"conv_id", $"turn_idx".cast("long").as("turn_idx"), $"role", $"text"))
      .count()
    println(s"[demo] oracle-diff-rows=$diff (${if (diff == 0) "MATCH" else "MISMATCH"})")
    spark.stop()
  }
}
