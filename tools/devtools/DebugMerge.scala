package graft

import graft.cdc.MergeApply
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

/** Dev utility: single merge batch at a given core count with stage-level
  * task parallelism reporting (detects internal parallelism caps vs host
  * contention). Usage: runMain graft.DebugMerge [cores] [events]
  */
object DebugMerge {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val events = if (args.length > 1) args(1).toLong else 10000000L
    val spark = Sessions.local(cores, appName = s"debug-merge-$cores")
    spark.sparkContext.setLogLevel("WARN")
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, String, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.name.take(60).replace("\n", " "),
          i.taskMetrics.executorRunTime,
          i.taskMetrics.executorCpuTime / 1000000L))
      }
    })
    val dir = java.nio.file.Files.createTempDirectory("graft-dbgmerge-").toString
    val cfg = GenConfig(numEvents = events, numConvs = 5000, maxTurns = 40)
    ChangeGen.eventSlice(spark, cfg, 0, events).toDF().write.parquet(s"$dir/batch")
    val table = LakeTable.create(spark, s"$dir/table", schemaVer = 1, numBuckets = 64)
    // warm
    MergeApply.applyBatch(table, spark.read.parquet(s"$dir/batch").limit(1000000), -1L)
    stages.clear()
    val t0 = System.nanoTime()
    val st = MergeApply.applyBatch(table, spark.read.parquet(s"$dir/batch"), 0L)
    println(f"[dbg] cores=$cores events=$events ms=${st.durationMs} " +
      f"eps=${events * 1000.0 / st.durationMs}%.0f")
    stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, name, run, cpu) =>
      println(s"[dbg] stage=$id tasks=$n wallMs=$ms taskRunMs=$run taskCpuMs=$cpu name=$name")
    }
    spark.stop()
  }
}
