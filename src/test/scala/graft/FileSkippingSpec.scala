package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{MergeApply, WriteStrategy}
import graft.lake.{FileEntry, FileStats, LakeTable, Snapshot}
import graft.model.Model

/** Manifest-level min/max file skipping: the engine's substitute for the
  * reference's secondary indexes (SURVEY §4; reference:
  * Scripts/database_schema.sql:165-169). A point read of one conversation
  * must prune to its bucket AND then to the file(s) whose key range covers
  * it — without opening any parquet footer — while files without stats
  * (legacy manifests) are never skipped.
  */
class FileSkippingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "fileskip-spec")

  private def tmp(): String = Files.createTempDirectory("graft-skip-").toString

  private val ts = new java.sql.Timestamp(1704067200000L)
  private def ev(lsn: Long, conv: String, turn: Int, text: String) =
    Model.ChangeEvent(lsn, "I", 2, conv, turn, Some("user"), Some(text), None, Some(ts))

  private def df(events: Seq[Model.ChangeEvent]) = {
    import spark.implicits._
    spark.createDataset(events).toDF()
  }

  test("driver-side bucketOfKey matches the Column bucket transform") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"conv-$i") ++
      Seq("", "snow☃man", "a b/c", "élève")
    val got = keys.toDF("k")
      .withColumn("b", MergeApply.bucketOf(col("k"), 16))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      assert(LakeTable.bucketOfKey(k, 16) == got(k), s"bucket drift for key '$k'")
    }
  }

  test("write-pass manifest stats carry key/turn/lsn ranges that cover the data") {
    val root = tmp()
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    val events = (0 until 200).map(i => ev(100 + i, f"conv-${i % 50}%03d", i / 50 + 1, s"t$i"))
    assert(MergeApply.applyBatch(table, df(events), epochId = 0).applied)
    val files = table.current.files
    assert(files.nonEmpty)
    files.foreach { f =>
      val s = f.stats.getOrElse(fail(s"file ${f.path} has no stats"))
      assert(s.hasKeyRange && s.has2 && s.hasLsn)
      assert(s.minKey <= s.maxKey)
      assert(s.minLsn >= 100 && s.maxLsn <= 299)
      assert(s.min2 >= 1 && s.max2 <= 4)
    }
    // roundtrip: a freshly loaded table parses the same stats back
    val reloaded = LakeTable.load(spark, root).current.files
    assert(reloaded.map(f => (f.path, f.stats)).sortBy(_._1) ==
      files.map(f => (f.path, f.stats)).sortBy(_._1))
  }

  test("point read prunes a multi-file bucket to the covering file, result exact") {
    val table = LakeTable.create(spark, tmp(), schemaVer = 2, numBuckets = 4)
    // two merge-on-read batches with lexicographically disjoint conv ranges:
    // every bucket ends up with one delta file per batch
    def batch(prefix: String, lsnBase: Long) =
      (0 until 80).flatMap(i => (1 to 2).map(t =>
        ev(lsnBase + i * 2 + t, f"$prefix-$i%03d", t, s"$prefix $i $t")))
    assert(MergeApply.applyBatch(table, df(batch("aaa", 0)), epochId = 0,
      strategy = WriteStrategy.MergeOnRead).applied)
    assert(MergeApply.applyBatch(table, df(batch("bbb", 10000)), epochId = 1,
      strategy = WriteStrategy.MergeOnRead).applied)
    val snap = table.current
    val byBucket = snap.files.groupBy(_.bucket)
    assert(byBucket.nonEmpty && byBucket.values.forall(_.size >= 2),
      "fixture must plant multi-file buckets")

    val key = "aaa-042"
    val pruned = table.filesForKey(key)
    assert(pruned.size == 1,
      s"expected exactly the covering file, got ${pruned.map(_.path)}")
    assert(pruned.head.bucket == LakeTable.bucketOfKey(key, snap.numBuckets))
    assert(pruned.head.stats.exists(s => s.minKey <= key && key <= s.maxKey))

    val got = table.readKey(key).orderBy("turn_idx").collect().toSeq
    val want = table.read().filter(col("conv_id") === key)
      .orderBy("turn_idx").collect().toSeq
    assert(got == want && got.size == 2)
  }

  test("range read skips non-overlapping files, result exact") {
    val table = LakeTable.create(spark, tmp(), schemaVer = 2, numBuckets = 4)
    def batch(prefix: String, lsnBase: Long) =
      (0 until 60).map(i => ev(lsnBase + i, f"$prefix-$i%03d", 1, s"$prefix $i"))
    assert(MergeApply.applyBatch(table, df(batch("aaa", 0)), epochId = 0,
      strategy = WriteStrategy.MergeOnRead).applied)
    assert(MergeApply.applyBatch(table, df(batch("bbb", 10000)), epochId = 1,
      strategy = WriteStrategy.MergeOnRead).applied)
    val snap = table.current
    val lo = UTF8String.fromString("aaa-010")
    val hi = UTF8String.fromString("aaa-019")
    val overlapping = snap.files.filter(LakeTable.mayOverlapKeyRange(_, lo, hi))
    assert(overlapping.nonEmpty && overlapping.size < snap.files.size,
      "range pruning must drop the bbb files")
    assert(overlapping.forall(_.stats.exists(_.minKey.startsWith("aaa"))))

    val got = table.readKeyRange("aaa-010", "aaa-019")
      .orderBy("conv_id").collect().toSeq
    val want = table.read()
      .filter(col("conv_id") >= "aaa-010" && col("conv_id") <= "aaa-019")
      .orderBy("conv_id").collect().toSeq
    assert(got == want && got.size == 10)
  }

  test("manifest codec: stats roundtrip, legacy entries parse to None and never skip") {
    val withStats = FileEntry("/p/a.parquet", 3, 2, 100, 90, FileEntry.Base,
      Some(FileStats("conv-a", "conv-z", 1, 9, 50, 150)))
    val nullKeyStats = FileEntry("/p/b.parquet", 1, 2, 10, 10, FileEntry.Delta,
      Some(FileStats(null, null, Long.MaxValue, Long.MinValue, 7, 7)))
    val noStats = FileEntry("/p/c.parquet", 0, 1, 5, 5)
    val snap = Snapshot(4L, 3L, 9L, 2, 4, 115L, 150L,
      Seq(withStats, nullKeyStats, noStats), writerId = "w1")
    val back = LakeTable.parseManifest(LakeTable.manifestJson(snap))
    assert(back.files == Seq(withStats, nullKeyStats, noStats))

    // a LEGACY manifest (written before the stats field existed) parses
    // to stats=None and is never skipped by any probe
    val legacyJson = LakeTable.manifestJson(
      snap.copy(files = snap.files.map(_.copy(stats = None))))
    assert(!legacyJson.contains("\"mnl\""))
    val legacy = LakeTable.parseManifest(legacyJson)
    assert(legacy.files.forall(_.stats.isEmpty))
    val probe = UTF8String.fromString("zzz-outside-any-range")
    assert(legacy.files.forall(LakeTable.mayContainKey(_, probe)))
    // unknown-key stats (null min/max) also never skip
    assert(LakeTable.mayContainKey(nullKeyStats, probe))
    // known ranges DO skip
    assert(!LakeTable.mayContainKey(withStats, probe))
  }

  test("point read on a non-string-keyed table fails loudly, not silently empty") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("p1", LongType, nullable = false),
      StructField("p2", LongType, nullable = false),
      StructField("n", LongType)))
    val table = LakeTable.create(spark, tmp() + "/pairs", schemaVer = 1,
      numBuckets = 4, registry = Map(1 -> schema), keyCols = Seq("p1", "p2"))
    // bucketOfKey hashes the STRING form; the write side bucketed on the
    // native long — a silent wrong-bucket prune would return empty here
    val e = intercept[IllegalArgumentException](table.readKey("42"))
    assert(e.getMessage.contains("not a string"))
    val e2 = intercept[IllegalArgumentException](table.filesForKey("42"))
    assert(e2.getMessage.contains("not a string"))
  }
}
