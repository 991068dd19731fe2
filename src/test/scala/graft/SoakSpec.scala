package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcStream, StreamFiles, WriteStrategy}
import graft.cdc.CdcStream.StreamConfig
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

/** Marks the long-running lifecycle suites (exclude locally with
  * `sbt "testOnly * -- -l graft.SlowTest"`).
  */
object SlowTest extends Tag("graft.SlowTest")

/** O(100)-epoch lifecycle soak: a long-running stream with compaction and
  * snapshot expiry on a cadence must keep per-bucket file counts, `_meta`
  * size, and per-epoch wall time BOUNDED — the O(n)-in-epochs metadata
  * growth failure modes that 4-epoch runs cannot observe. Walls come from
  * the engine's own `_metrics` channel (`duration_ms` per epoch).
  */
class SoakSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "soak-spec")

  test("100-epoch merge-on-read soak: bounded files/bucket, bounded _meta, " +
      "flat per-epoch wall, oracle-exact final state", SlowTest) {
    val base = Files.createTempDirectory("graft-soak-").toString
    val epochs = 100
    val cfg = GenConfig(numConvs = 250, maxTurns = 12, numEvents = 60000)
    // one event file per epoch
    val all = ChangeGen.emittedEvents(spark, cfg).collect()
    val per = math.max(1, (all.length + epochs - 1) / epochs)
    import spark.implicits._
    all.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      StreamFiles.writeFlat(spark.createDataset(chunk.toSeq).toDF(),
        s"$base/events", f"chunk-$i%04d")
    }

    val table = LakeTable.create(spark, s"$base/table", schemaVer = 1, numBuckets = 8)
    CdcStream.runAvailable(spark, table, s"$base/events", s"$base/cp",
      StreamConfig(
        maxFilesPerTrigger = 1,
        strategy = WriteStrategy.MergeOnRead,
        compactEveryEpochs = 8,
        expireEveryEpochs = 10,
        expireKeepLast = 2,
        expireOrphanGraceMs = 0L)) // single writer: immediate reclamation

    // correctness first: the full lifecycle (delta appends + periodic
    // folds + expiry) must not perturb the replayed state
    val got = table.read().orderBy("conv_id", "turn_idx")
      .select($"conv_id", $"turn_idx".cast("int"), $"text")
      .as[(String, Int, String)].collect().toSeq
    val oracle = ChangeGen.oracleFold(
      (0L until cfg.totalRows).map(i => ChangeGen.rowAt(cfg, i)))
      .toSeq.sortBy { case ((c, t), _) => (c, t) }
      .map { case ((c, t), turn) => (c, t.toInt, turn.text) }
    assert(got == oracle)

    // bounded per-bucket read amplification: compaction every 8 epochs
    // caps the delta stack — without it this would be ~100 files/bucket
    val perBucket = table.current.files.groupBy(_.bucket).values.map(_.size)
    assert(perBucket.max <= 16,
      s"per-bucket file count unbounded: ${perBucket.toSeq.sorted.reverse.take(3)}")

    // bounded _meta: expiry keeps the last 2 snapshots (+ current pointer
    // + writer artifacts) — without it this would be ~113 manifests
    val metaFiles = new java.io.File(s"$base/table/_meta").listFiles()
    assert(metaFiles.length <= 12,
      s"_meta unbounded: ${metaFiles.length} files")
    assert(table.snapshotIds.size <= 4)

    // flat per-epoch wall from the engine's own metrics channel: median of
    // the last decile ≤ 1.3× the median of the first POST-WARMUP decile
    // (epochs 10-19; the first ten carry JIT/classload noise). Medians
    // keep a storm-spiked epoch from deciding the verdict.
    val walls = CdcStream.metrics(spark, table.root)
      .select("epoch_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(walls.size >= epochs - 1, s"missing epoch walls: ${walls.size}")
    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val early = median((10L until 20L).flatMap(walls.get))
    val late = median((90L until 100L).flatMap(walls.get))
    info(f"per-epoch wall: early median $early%.0f ms, late median $late%.0f ms")
    assert(late <= early * 1.3,
      f"per-epoch wall grew: early $early%.0f ms -> late $late%.0f ms")
  }
}
