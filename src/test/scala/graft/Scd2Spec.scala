package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Scd2History
import graft.cdc.Scd2History.Scd2Config

/** M7 write-path invariants (reference:
  * Docs/etl_requirements_reviewed_by_sr.md:518-558): after replaying
  * ordered change batches, every key has exactly ONE active row, version
  * ranges are contiguous (each close equals the next open), and the active
  * payload equals the last change per key.
  */
class Scd2Spec extends AnyFunSuite {

  lazy val spark = Sessions.local(8, appName = "scd2-spec")

  private def changes(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      (s"k${i % 13}", s"state-${i % 5}", i * 1.5, i.toLong)
    }.toDF("user_id", "event_type", "value", "event_id")
  }

  test("replay: one active row per key, contiguous ranges, LWW payload") {
    val df = changes(400)
    val cfg = Scd2Config(Seq("user_id"), Seq("event_type", "value"), "event_id")
    val root = Files.createTempDirectory("graft-scd2-spec-").toString
    val table = Scd2History.createTable(spark, root, cfg, df.schema, numBuckets = 4)
    // 5 ordered batches of 80 changes
    (0 until 5).foreach { b =>
      val batch = df.filter(col("event_id") > b * 80 && col("event_id") <= (b + 1) * 80)
      assert(Scd2History.applyBatch(table, cfg, batch, b.toLong))
    }
    val hist = table.read().collect()
    assert(hist.length == 400) // every change is a version

    val byKey = hist.groupBy(_.getAs[String]("user_id"))
    byKey.foreach { case (k, rows) =>
      val active = rows.filter(_.getAs[Boolean]("is_active"))
      assert(active.length == 1, s"$k has ${active.length} active rows")
      // active row is the max-ord change, open-ended
      val maxFrom = rows.map(_.getAs[Long]("effective_from")).max
      assert(active(0).getAs[Long]("effective_from") == maxFrom)
      assert(active(0).isNullAt(active(0).fieldIndex("effective_to")))
      // contiguity: sorted versions chain from -> to -> from
      val sorted = rows.sortBy(_.getAs[Long]("effective_from"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("effective_to") == b.getAs[Long]("effective_from"),
            s"$k range gap at ${a.getAs[Long]("effective_from")}")
        case _ =>
      }
    }
    // replaying the last batch is fenced — history unchanged
    val last = df.filter(col("event_id") > 320)
    assert(!Scd2History.applyBatch(table, cfg, last, 4L))
    assert(table.read().count() == 400)
  }

  test("fresh-checkpoint restart: new writer admitted, re-delivered batch " +
      "content fenced by hash (close-out+insert is not re-apply idempotent)") {
    val df = changes(200)
    val cfg = Scd2Config(Seq("user_id"), Seq("event_type", "value"), "event_id")
    val root = Files.createTempDirectory("graft-scd2-writer-").toString
    val table = Scd2History.createTable(spark, root, cfg, df.schema, numBuckets = 4)
    val b0 = df.filter(col("event_id") <= 100)
    val b1 = df.filter(col("event_id") > 100)
    assert(Scd2History.applyBatch(table, cfg, b0, 0L, writerId = "w1"))
    assert(Scd2History.applyBatch(table, cfg, b1, 1L, writerId = "w1"))
    assert(table.read().count() == 200)
    // restart with a fresh checkpoint: writer w2, epoch 0 re-delivers b1's
    // content — must NOT re-apply (it would close the versions it itself
    // inserted), and must not be silently fenced either when it later
    // brings new data.
    assert(!Scd2History.applyBatch(table, cfg, b1, 0L, writerId = "w2"))
    assert(table.read().count() == 200)
    val fresh = {
      import spark.implicits._
      Seq(("k-new", "state-9", 1.0, 999L)).toDF("user_id", "event_type", "value", "event_id")
    }
    assert(Scd2History.applyBatch(table, cfg, fresh, 1L, writerId = "w2"))
    assert(table.read().count() == 201)
    // w1's watermark survives w2's commits
    assert(!Scd2History.applyBatch(table, cfg, b1, 1L, writerId = "w1"))
    assert(table.read().count() == 201)
  }

  test("streaming ingest: fresh-checkpoint re-delivery is hash-fenced, " +
      "later files still apply") {
    val df = changes(120)
    val cfg = Scd2Config(Seq("user_id"), Seq("event_type", "value"), "event_id")
    val srcDir = Files.createTempDirectory("graft-scd2-src-").toString
    graft.cdc.StreamFiles.writeFlat(df.filter(col("event_id") <= 60), srcDir, "f0")
    graft.cdc.StreamFiles.writeFlat(df.filter(col("event_id") > 60), srcDir, "f1")
    val root = Files.createTempDirectory("graft-scd2-stream-").toString
    val table = Scd2History.createTable(spark, root, cfg, df.schema, numBuckets = 4)
    val ckptA = Files.createTempDirectory("graft-scd2-ckptA-").toString
    Scd2History.streamAvailable(spark, table, cfg, srcDir, ckptA, df.schema)
    assert(table.read().count() == 120)
    // fresh checkpoint re-reads everything: close-out+insert must not
    // re-apply (it would close the versions it itself inserted)
    val ckptB = Files.createTempDirectory("graft-scd2-ckptB-").toString
    Scd2History.streamAvailable(spark, table, cfg, srcDir, ckptB, df.schema)
    assert(table.read().count() == 120)
    // a later change file still applies through checkpoint B
    import spark.implicits._
    graft.cdc.StreamFiles.writeFlat(
      Seq(("k-late", "state-9", 9.9, 999L)).toDF("user_id", "event_type", "value", "event_id"),
      srcDir, "f2")
    Scd2History.streamAvailable(spark, table, cfg, srcDir, ckptB, df.schema)
    assert(table.read().count() == 121)
    assert(table.read().filter(col("user_id") === "k-late" && col("is_active")).count() == 1)
  }
}
