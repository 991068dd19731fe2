package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.MergeApply
import graft.lake.LakeTable
import graft.model.Model

/** Time-based snapshot retention: `expireSnapshots(olderThanMs)` keeps
  * every snapshot younger than the age even beyond `keepLast`, so the
  * changelog/time-travel retention contract is expressible in time units
  * (reference analog: DATEADD-cutoff purge,
  * Scripts/ETL_Framework_Implementation.sql:445-485).
  */
class ExpirySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "expiry-spec")

  private val ts = new java.sql.Timestamp(1704067200000L)
  private def ev(lsn: Long, conv: String, turn: Int) =
    Model.ChangeEvent(lsn, "I", 2, conv, turn, Some("user"), Some(s"t$lsn"), None, Some(ts))

  private def commitBatch(table: LakeTable, epoch: Long): Unit = {
    import spark.implicits._
    val df = spark.createDataset((0 until 20).map(i =>
      ev(epoch * 100 + i, s"conv-${i % 5}", i % 4 + 1))).toDF()
    assert(MergeApply.applyBatch(table, df, epochId = epoch).applied)
  }

  private def ageManifest(root: String, id: Long, ageMs: Long): Unit = {
    val f = new java.io.File(s"$root/_meta", f"snap-$id%010d.json")
    assert(f.exists())
    assert(f.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("history lists retained snapshots with lineage, maintenance flag, and shrinks with expiry") {
    val root = Files.createTempDirectory("graft-expiry-").toString
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    commitBatch(table, 0L)
    // merge-on-read epoch: appends deltas, so the compaction below has
    // real fold work (two CoW epochs leave one file per bucket — no-op)
    import spark.implicits._
    val df = spark.createDataset((0 until 20).map(i =>
      ev(100L + i, s"conv-${i % 5}", i % 4 + 1))).toDF()
    assert(MergeApply.applyBatch(table, df, epochId = 1L,
      strategy = graft.cdc.WriteStrategy.MergeOnRead).applied)
    assert(table.compact(foldDeltas = true).applied)
    val h = table.history.orderBy("snapshot_id").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L), "ids 0..3 retained")
    // lineage: each row's parent is the previous id (create's parent is -1)
    assert(h.map(_.getLong(1)).toSeq == Seq(-1L, 0L, 1L, 2L))
    // the compaction row is flagged maintenance and carries epoch 1 forward
    val maint = h.last
    assert(maint.getBoolean(maint.fieldIndex("is_maintenance")))
    assert(maint.getLong(maint.fieldIndex("epoch_id")) == 1L)
    assert(h.forall(r => !r.isNullAt(r.fieldIndex("committed_at"))))
    val report = table.expireSnapshots(keepLast = 1, orphanGraceMs = 0L)
    assert(table.history.count() == 1L)
    // the report reflects the sweep: 3 of 4 snapshots dropped, and the
    // compaction-replaced data files actually left the tree
    assert(report.snapshotsDeleted == 3, report.toString)
    assert(report.dataFilesDeleted > 0, report.toString)
  }

  test("age-based retention keeps young snapshots beyond keepLast, drops old ones") {
    val root = Files.createTempDirectory("graft-expiry-").toString
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    (0L to 3L).foreach(commitBatch(table, _)) // snapshots 1..4, current = 4
    assert(table.snapshotIds == Seq(0L, 1L, 2L, 3L, 4L))

    // snapshots 0-2 are "a week old"; 3 and 4 are fresh
    (0L to 2L).foreach(ageManifest(root, _, 7L * 24 * 3600 * 1000))

    // count-based alone would keep only snapshot 4; the age clause must
    // additionally keep fresh snapshot 3
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0L,
      olderThanMs = 24L * 3600 * 1000)
    assert(table.snapshotIds == Seq(3L, 4L))

    // the young survivor stays fully readable (its data files were kept)
    assert(table.readAt(3L).count() == 20L)
    assert(table.read().count() == 20L)

    // aging snapshot 3 out and expiring again drops it
    ageManifest(root, 3L, 7L * 24 * 3600 * 1000)
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0L,
      olderThanMs = 24L * 3600 * 1000)
    assert(table.snapshotIds == Seq(4L))
    assert(table.read().count() == 20L)
  }

  test("expiry never reclaims a commit dir holding only an in-flight _temporary") {
    val root = Files.createTempDirectory("graft-expiry-").toString
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    commitBatch(table, 0L)
    // an in-flight writer's staging dir: no part files yet, old mtime
    // (object stores report synthetic dir mtimes), grace 0
    val staging = new java.io.File(s"$root/data/c999-inflight/_temporary")
    assert(staging.mkdirs())
    assert(staging.getParentFile.setLastModified(System.currentTimeMillis() - 3600_000))
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0L)
    assert(staging.exists(), "in-flight staging dir must survive the sweep")
    assert(table.read().count() == 20L)
  }

  test("negative olderThanMs preserves the count-based behavior exactly") {
    val root = Files.createTempDirectory("graft-expiry-").toString
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    (0L to 3L).foreach(commitBatch(table, _))
    table.expireSnapshots(keepLast = 2, orphanGraceMs = 0L)
    assert(table.snapshotIds == Seq(3L, 4L))
  }
}
