package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{MergeApply, WriteStrategy}
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.{FileEntry, LakeTable}

/** Merge-on-read write strategy: delta appends must produce the same
  * LWW final state as copy-on-write, deltas must fold back to base files
  * under compaction, and the two strategies must interleave on one table.
  */
class MergeOnReadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "mor-spec")

  private def tmp(): String = Files.createTempDirectory("graft-mor-").toString

  private def finalState(table: LakeTable): Seq[(String, Long, String, String, Option[String])] = {
    import spark.implicits._
    table.read()
      .orderBy("conv_id", "turn_idx")
      .select($"conv_id", $"turn_idx".cast("long"), $"role", $"text",
        if (table.read().columns.contains("tool")) $"tool"
        else org.apache.spark.sql.functions.lit(null).cast("string").as("tool"))
      .as[(String, Long, String, String, Option[String])]
      .collect().toSeq
  }

  private def oracleState(cfg: GenConfig): Seq[(String, Long, String, String, Option[String])] = {
    val events = (0L until cfg.totalRows).map(i => ChangeGen.rowAt(cfg, i))
    ChangeGen.oracleFold(events).toSeq
      .sortBy { case ((c, t), _) => (c, t) }
      .map { case ((c, t), turn) => (c, t, turn.role, turn.text, turn.tool) }
  }

  private def replay(table: LakeTable, cfg: GenConfig, batches: Int,
      strategyOf: Int => WriteStrategy): Unit = {
    import spark.implicits._
    val all = ChangeGen.emittedEvents(spark, cfg).collect() // emission order, bounded OOO
    val per = (all.length + batches - 1) / batches
    all.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val st = MergeApply.applyBatch(table, spark.createDataset(chunk.toSeq).toDF(),
        epochId = i.toLong, strategy = strategyOf(i))
      assert(st.applied)
    }
  }

  test("pure merge-on-read replay equals the oracle; commits never read the table") {
    val cfg = GenConfig(numConvs = 40, maxTurns = 15, numEvents = 3000)
    val root = tmp()
    val table = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 8)
    replay(table, cfg, batches = 4, _ => WriteStrategy.MergeOnRead)
    // every data file is an appended delta — no bucket was ever rewritten
    assert(table.current.files.nonEmpty)
    assert(table.current.files.forall(_.kind == FileEntry.Delta))
    // manifest row count is UNKNOWN with unresolved deltas (may shadow)
    assert(table.current.rows == -1L)
    // the read path resolves the delta stack to the exact LWW fold
    assert(finalState(table) == oracleState(cfg))
  }

  test("foldDeltas compaction restores base files and exact row accounting") {
    val cfg = GenConfig(numConvs = 30, maxTurns = 12, numEvents = 2000)
    val root = tmp()
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 8)
    replay(table, cfg, batches = 3, _ => WriteStrategy.MergeOnRead)
    val res = table.compact(foldDeltas = true)
    assert(res.applied)
    assert(table.current.files.forall(_.kind == FileEntry.Base))
    // one resolved version per key → manifest live count is exact again
    assert(table.current.rows == table.read().count())
    assert(finalState(table) == oracleState(cfg))
    // idempotent: nothing left to fold
    assert(!table.compact(foldDeltas = true).applied)
  }

  test("interleaved copy-on-write and merge-on-read batches converge") {
    val cfg = GenConfig(numConvs = 40, maxTurns = 15, numEvents = 3000)
    val root = tmp()
    val table = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 8)
    // MoR, CoW, MoR, CoW: each CoW batch rewrites its touched buckets and
    // resolves any earlier deltas living there
    replay(table, cfg, batches = 4,
      i => if (i % 2 == 0) WriteStrategy.MergeOnRead else WriteStrategy.CopyOnWrite)
    assert(finalState(table) == oracleState(cfg))
  }

  test("merge-on-read replay is epoch-fenced like copy-on-write") {
    import spark.implicits._
    val cfg = GenConfig(numConvs = 10, maxTurns = 10, numEvents = 500)
    val root = tmp()
    val table = LakeTable.create(spark, root, schemaVer = 2, numBuckets = 4)
    val df = ChangeGen.events(spark, cfg).toDF()
    val first = MergeApply.applyBatch(table, df, epochId = 5, strategy = WriteStrategy.MergeOnRead)
    assert(first.applied)
    val nFiles = table.current.files.size
    val replayed = MergeApply.applyBatch(table, df, epochId = 5, strategy = WriteStrategy.MergeOnRead)
    assert(!replayed.applied)
    assert(table.current.files.size == nFiles) // no duplicate delta stack
    assert(finalState(table) == oracleState(cfg))
  }
}
