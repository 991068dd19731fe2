package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.MergeApply
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.{FileEntry, LakeTable}

/** Sharded manifest format (tables with > 64 buckets): the snapshot JSON
  * carries per-bucket-group manifest references instead of inline file
  * entries, so both the snapshot JSON size and the metadata written per
  * commit stay O(buckets touched) no matter how many buckets (files) the
  * table holds — the Iceberg manifest-list shape, which is what lets a
  * 4096-bucket 100 TB table commit in O(1) metadata.
  */
class LakeShardingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "sharding-spec")

  private def tmp(): String = Files.createTempDirectory("graft-shard-").toString

  private def fe(bucket: Int, tag: String): FileEntry =
    FileEntry(s"/nonexistent/$tag-b$bucket.parquet", bucket, 1, rows = 1L, live = 1L)

  private def snapJsonBytes(root: String, id: Long): Long =
    new java.io.File(s"$root/_meta", f"snap-$id%010d.json").length()

  test("4096-bucket table: snapshot JSON and metadata-write volume stay " +
      "O(buckets touched), file lists round-trip exactly") {
    val root = tmp()
    val t = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 4096)
    // seed: one file in each of 512 spread-out buckets (metadata only)
    val seed = (0 until 512).map(i => fe(i * 8, "seed"))
    assert(t.commit(seed, Set.empty, 0L, 1, 0L, 0L, writerId = "w",
      baseSnapshotId = t.current.id).applied)
    val seedBytes = snapJsonBytes(root, 1L)

    def metaFiles(): Set[String] =
      new java.io.File(root, "_meta").list().toSet

    // ten commits, each replacing 3 buckets — each must write ≤ 3 new
    // group manifests and keep the snapshot JSON flat
    (1 to 10).foreach { e =>
      val buckets = Set(e * 24, e * 24 + 8, e * 24 + 16) // all seeded buckets
      val before = metaFiles()
      assert(t.commit(buckets.toSeq.map(b => fe(b, s"e$e")), buckets, e.toLong, 1,
        0L, 0L, writerId = "w", baseSnapshotId = t.current.id).applied)
      val newGroupManifests = (metaFiles() -- before).filter(_.startsWith("m-"))
      assert(newGroupManifests.size <= 3,
        s"commit $e wrote ${newGroupManifests.size} group manifests for 3 touched buckets")
      val bytes = snapJsonBytes(root, e + 1L)
      assert(bytes <= seedBytes + 2048,
        s"snapshot JSON grew to $bytes bytes (seed $seedBytes) — not O(buckets touched)")
    }

    // round-trip: the resolved file list equals what the commits built
    val cur = LakeTable.load(spark, root).current
    assert(cur.files.size == 512)
    assert(cur.files.count(_.path.contains("/e10-")) == 3)
    assert(cur.files.count(_.path.contains("/seed-")) == 512 - 30)
    // a snapshot with 512 files inline would be ~50 KB; sharded stays small
    assert(snapJsonBytes(root, 11L) < 8 * 1024)
  }

  test("replay + compaction + snapshot expiry all run green on the sharded format") {
    val cfg = GenConfig(numConvs = 40, maxTurns = 15, numEvents = 3000)
    val root = tmp()
    // 128 buckets > shardBucketThreshold → sharded metadata from commit 1
    val table = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 128)
    val all = ChangeGen.emittedEvents(spark, cfg).collect()
    import spark.implicits._
    all.grouped(700).zipWithIndex.foreach { case (chunk, i) =>
      assert(MergeApply.applyBatch(table,
        spark.createDataset(chunk.toSeq).toDF(), epochId = i.toLong).applied)
    }
    assert(table.current.groupRefs.nonEmpty, "expected sharded metadata")

    val oracle = ChangeGen.oracleFold(
      (0L until cfg.totalRows).map(i => ChangeGen.rowAt(cfg, i))).toSeq
      .sortBy { case ((c, t), _) => (c, t) }
      .map { case ((c, t), turn) => (c, t.toLong, turn.role, turn.text) }
    def state() = table.read().orderBy("conv_id", "turn_idx")
      .select($"conv_id", $"turn_idx".cast("long"), $"role", $"text")
      .as[(String, Long, String, String)].collect().toSeq
    assert(state() == oracle)

    // compaction commits through the same sharded diff path
    table.compact(maxFilesPerBucket = 1)
    assert(state() == oracle)

    // expiry must drop unreferenced group manifests but keep every live one
    table.expireSnapshots(keepLast = 1)
    val metaNames = new java.io.File(root, "_meta").list().toSet
    val liveRefs = table.current.groupRefs.map(_.path).toSet
    assert(liveRefs.subsetOf(metaNames), "expiry deleted a live group manifest")
    assert(state() == oracle)
  }
}
