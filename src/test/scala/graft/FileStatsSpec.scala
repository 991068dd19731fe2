package graft

import java.nio.file.Files

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.MergeApply
import graft.functions.FileStatsAgg
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

/** The manifest stats that ride the write pass (FileStatsAgg observation)
  * must be byte-identical to the parquet-footer-derived stats they
  * replaced — same per-file rows/live on the same files, tombstones
  * included.
  */
class FileStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "filestats-spec")

  private def tmp(): String = Files.createTempDirectory("graft-fs-").toString

  test("FileStatsAgg observation matches a groupBy of the same data") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i.toLong % 7, i % 3 == 0)).toDF("k", "alive")
    val obs = Observation("fsagg-test")
    df.observe(obs, FileStatsAgg.column(spark, col("k"), col("alive")).as("fs")).count()
    val got = obs.get("fs").asInstanceOf[collection.Map[Long, collection.Seq[Long]]]
      .map { case (k, v) => k -> ((v(0), v(1))) }
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("rows"), sum(when(col("alive"), 1L).otherwise(0L)).as("live"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("write-pass manifest stats equal footer-derived stats, tombstones included") {
    val cfg = GenConfig(numConvs = 60, maxTurns = 12, numEvents = 5000)
    val batch = ChangeGen.events(spark, cfg).toDF()
    assert(batch.filter(col("op") === "D").count() > 0, "fixture must contain deletes")

    val fast = LakeTable.create(spark, tmp(), schemaVer = 1, numBuckets = 16)
    MergeApply.applyBatch(fast, batch, epochId = 0)

    // the runtime switch forces the footer fallback path
    val slow = LakeTable.create(spark, tmp(), schemaVer = 1, numBuckets = 16)
    spark.conf.set("spark.graft.writeStats", "footer")
    try MergeApply.applyBatch(slow, batch, epochId = 0)
    finally spark.conf.unset("spark.graft.writeStats")

    def statKey(t: LakeTable) = t.current.files
      .map(f => (f.bucket, f.rows, f.live, f.kind)).sortBy(x => (x._1, x._2))
    assert(fast.current.files.forall(_.live >= 0))
    assert(statKey(fast) == statKey(slow))
    assert(fast.current.rows == slow.current.rows)
    // the min/max ranges must agree between the write-pass aggregate and
    // the parquet-footer-derived form too (same files, same extremes)
    def rangeKey(t: LakeTable) = t.current.files
      .map(f => (f.bucket, f.rows, f.stats)).sortBy(x => (x._1, x._2))
    assert(fast.current.files.forall(_.stats.exists(s => s.hasKeyRange && s.hasLsn)))
    assert(rangeKey(fast) == rangeKey(slow))
  }
}
