package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.SimilarityQueries

/** Recall gate for the approximate-NN path: the LSH-bucketed sim2 must
  * recover a floor fraction of the exact brute-force sim1 top-5 neighbor
  * sets on the driver testdata embeddings. The DuckDB oracle checks that
  * sim2 computes its own pipeline exactly; this spec checks the pipeline
  * is a GOOD approximation — bucketing that returned junk would still
  * hash-match its oracle, so recall needs its own gate.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = Sessions.local(8, appName = "similarity-spec")

  private val sfDir = "/root/testdata/sf0.001"

  private def topk(name: String): Map[Long, Set[Long]] = {
    val q = graft.SparkEntry.queries(name)
    q(spark, sfDir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("nid"))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  private def recallVsExact(name: String): Double = {
    val exact = topk("sim1_cosine_topk")
    val approx = topk(name)
    assert(exact.nonEmpty)
    val (hit, total) = exact.foldLeft((0, 0)) { case ((h, t), (qid, nbrs)) =>
      (h + approx.getOrElse(qid, Set.empty).intersect(nbrs).size, t + nbrs.size)
    }
    hit.toDouble / total
  }

  test("sim2 LSH ANN recall >= 0.8 of sim1 exact top-5") {
    val recall = recallVsExact("sim2_lsh_ann")
    assert(recall >= 0.8, f"sim2 recall $recall%.3f < 0.8")
  }

  /** Floor 0.6, not 0.8: the testdata embeddings are isotropic (no
    * directional clusters — within-label mean cosine ≈ 0.002), and on
    * isotropic data a cell-partitioned ANN recalls ≈ the probed cell
    * fraction (8/20 here) plus the rerank's margin. The gate catches a
    * broken probe/assign pipeline (which craters to ≈0), not the
    * data-dependent ceiling.
    */
  test("sim3 IVF ANN recall >= 0.6 of sim1 exact top-5") {
    val recall = recallVsExact("sim3_ivf_ann")
    assert(recall >= 0.6, f"sim3 recall $recall%.3f < 0.6")
  }
}
