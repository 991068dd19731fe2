package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.SimilarityQueries

/** The bench publishes production-hash (xxhash64) timings for d2/d3 next
  * to the sha256-reproducible catalog mode ([[SimilarityQueries.prodVariants]]).
  * This spec gates that the production path is a working dedup, not just a
  * timed no-op: planted EXACT duplicates are invariant under any hash
  * function (identical text → identical signature → same buckets), so both
  * prod twins must surface every planted pair — a broken hash column, band
  * bucket or pairing join drops them.
  */
class ProdHashSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(8, appName = "prodhash-spec")

  private def plantedDocs = {
    import spark.implicits._
    // 40 distinct docs with enough tokens to shingle, plus 5 exact copies
    val base = (0 until 40).map { i =>
      (i.toLong,
        s"document $i body ${i * 7} ${i * 13} alpha beta gamma delta " +
          s"epsilon zeta eta theta iota kappa lambda mu token${i % 11}")
    }
    val copies = (0 until 5).map(i => ((100 + i).toLong, base(i)._2))
    (base ++ copies).toDF("doc_id", "text")
  }

  test("d2 production (xxhash64) minhash finds every planted exact duplicate") {
    val pairs = SimilarityQueries.minhashPairs(plantedDocs, minJaccardEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, (100 + i).toLong)),
        s"d2 prod missed planted exact-dup pair ($i, ${100 + i}); got $pairs")
    }
  }

  test("d3 production (xxhash64) simhash finds every planted exact duplicate at hamming 0") {
    val rows = SimilarityQueries.simhashPairs(SimilarityQueries.simhashProd(plantedDocs))
      .collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, (100 + i).toLong)),
        s"d3 prod missed planted exact-dup pair ($i, ${100 + i}); got $pairs")
    }
    val planted = rows.filter(r => r.getLong(1) >= 100 && r.getLong(1) == r.getLong(0) + 100)
    assert(planted.forall(_.getInt(2) == 0),
      s"planted exact dups must be hamming 0: ${planted.mkString(",")}")
  }
}
