package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{MergeApply, Retry, RetryPolicy}
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
import graft.lake.LakeTable

/** End-to-end multi-writer convergence: two writers (distinct writer ids,
  * own epoch counters — the "CDC stream per source" deployment shape the
  * commit protocol's claim/rebase/conflict machinery exists for) apply
  * interleaved halves of one change log to the SAME table from concurrent
  * threads, with OVERLAPPING buckets, each epoch wrapped in the engine
  * retry (a lost claim or write-set conflict re-runs applyBatch, which
  * re-reads `current` and re-derives — the documented recovery). The final
  * state must equal the LWW fold oracle over the FULL log: nothing lost to
  * a silently dropped snapshot, nothing double-applied.
  *
  * ConcurrentCommitSpec pins the commit-level races in isolation; this
  * drives the whole merge path through them.
  */
class MultiWriterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "multiwriter-spec")

  test("two concurrent writers over overlapping buckets converge to the LWW oracle") {
    import spark.implicits._
    val cfg = GenConfig(numEvents = 2000L)
    val root = Files.createTempDirectory("graft-mw-").toString + "/transcripts"
    val table = LakeTable.create(spark, root, schemaVer = 1, numBuckets = 8)
    val half = cfg.totalRows / 2
    // generous retry budget: with every bucket overlapping, most epochs of
    // one writer conflict with the other's in-flight commit at least once
    val policy = RetryPolicy(maxAttempts = 16, backoffMs = 25L, backoffFactor = 1.5)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(wid: String, from: Long, until: Long): Thread = {
      val t = new Thread(() => {
        try {
          val per = (until - from + 3) / 4
          (0 until 4).foreach { b =>
            val lo = from + b * per
            val hi = math.min(until, lo + per)
            if (lo < hi) {
              val slice = ChangeGen.eventSlice(spark, cfg, lo, hi).toDF()
              Retry.run(policy, s"$wid epoch $b") {
                MergeApply.applyBatch(table, slice, epochId = b.toLong, writerId = wid)
              }
              ()
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
      t.setName(wid)
      t
    }
    val a = writer("w-a", 0L, half)
    val b = writer("w-b", half, cfg.totalRows)
    a.start(); b.start()
    a.join(300000L); b.join(300000L)
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")

    val expected = ChangeGen.oracleFold(
      ChangeGen.events(spark, cfg).collect().toSeq)
      .toSeq.map { case ((c, t), turn) => (c, t.toInt, turn.text) }.sorted
    val got = table.read().orderBy("conv_id", "turn_idx")
      .select($"conv_id", $"turn_idx", $"text")
      .as[(String, Int, String)].collect().toSeq.sorted
    assert(got == expected, s"final state diverged: ${got.size} vs ${expected.size} rows")
    // both writers' watermarks survive in the final snapshot (the
    // per-writer fence map), so a replay of either is a no-op
    val cur = table.current
    assert(cur.writerEpochs.get("w-a").contains(3L))
    assert(cur.writerEpochs.get("w-b").contains(3L))
  }
}
