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

  test("inline-manifest parent (pre-sharding upgrade) migrates losslessly " +
      "on its first sharded commit") {
    // Simulate a 128-bucket table written by a release that predates the
    // sharded format: its snapshot embeds `files` inline and has no
    // groupRefs. The first commit under the sharded format must
    // materialize EVERY group holding files — reusing the (empty) parent
    // refs would silently drop all untouched groups' files.
    val root = tmp()
    new java.io.File(s"$root/_meta").mkdirs()
    val oldFiles = (0 until 128 by 2).map(b => fe(b, "old"))
    val filesJson = oldFiles.map(f =>
      s"""{"path":"${f.path}","bucket":${f.bucket},"schemaVer":1,"rows":1,"live":1}""")
      .mkString("[", ",", "]")
    val json = s"""{"id":1,"parent":0,"epochId":0,"schemaVer":1,"numBuckets":128,""" +
      s""""rows":64,"maxLsn":0,"writer":"old","inputEvents":-1,"dedupedKeys":-1,""" +
      s""""mergeMs":-1,"writerEpochs":[{"w":"old","e":0}],"batchHashes":[],""" +
      s""""files":$filesJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_meta/snap-0000000001.json"), json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_meta/_current"), "snap-0000000001.json")
    val t = LakeTable.load(spark, root)
    assert(t.current.files.size == oldFiles.size)
    assert(t.commit(Seq(fe(0, "new")), Set(0), 1L, 1, 0L, 1L, writerId = "w",
      baseSnapshotId = t.current.id).applied)
    val after = LakeTable.load(spark, root).current
    assert(after.groupRefs.nonEmpty, "expected sharded metadata after migration")
    val paths = after.files.map(_.path).toSet
    assert(paths.contains(fe(0, "new").path))
    oldFiles.filter(_.bucket != 0).foreach(f => assert(paths.contains(f.path),
      s"${f.path} vanished in the inline->sharded migration"))
  }

  test("orphan GC grace: young unreferenced files survive expiry, zero-grace reclaims them") {
    // A concurrent committer writes data files and group manifests BEFORE
    // claiming its snapshot id — an expiry in that window must not eat
    // them. The grace is an age floor on orphan deletion.
    val root = tmp()
    val t = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 8)
    assert(t.commit(Seq(fe(0, "a")), Set(0), 0L, 1, 0L, 0L, writerId = "w",
      baseSnapshotId = t.current.id).applied)
    val stray = new java.io.File(s"$root/data/inflight-commit.parquet")
    stray.getParentFile.mkdirs()
    java.nio.file.Files.writeString(stray.toPath, "pretend parquet")
    val strayMeta = new java.io.File(s"$root/_meta/m-g0000-inflight.json")
    java.nio.file.Files.writeString(strayMeta.toPath, "{}")
    t.expireSnapshots(keepLast = 1) // default grace: both must survive
    assert(stray.exists(), "young orphan data file was GC'd inside the grace window")
    assert(strayMeta.exists(), "young orphan group manifest was GC'd inside the grace window")
    t.expireSnapshots(keepLast = 1, orphanGraceMs = 0L)
    assert(!stray.exists(), "zero-grace expiry should reclaim the orphan data file")
    assert(!strayMeta.exists(), "zero-grace expiry should reclaim the orphan group manifest")
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
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0L)
    val metaNames = new java.io.File(root, "_meta").list().toSet
    val liveRefs = table.current.groupRefs.map(_.path).toSet
    assert(liveRefs.subsetOf(metaNames), "expiry deleted a live group manifest")
    assert(state() == oracle)
  }
}
