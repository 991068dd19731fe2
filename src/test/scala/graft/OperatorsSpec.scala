package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.BinaryPipeline
import graft.sim.SimilarityQueries

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(8, appName = "operators-spec")
  private val sf = "/root/testdata/sf0.001"

  // ---- MinHash-LSH near-dup detection (planted fixtures) ----

  private def plantedDocs() = {
    import spark.implicits._
    // 20 docs with disjoint vocabularies + planted dup pairs
    val uniques = (0 until 20).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${i}x$j").mkString(" "))
    }
    val identical = Seq((100L, uniques(0)._2), (101L, uniques(0)._2))
    val nearWords = (0 until 30).map(j => if (j == 7) "CHANGED" else s"w5x$j")
    val near = Seq((102L, uniques(5)._2), (103L, nearWords.mkString(" ")))
    (uniques.drop(6) ++ identical ++ near).toDF("doc_id", "text")
  }

  test("minhash LSH finds planted exact and near duplicates, no false cross-vocab pairs") {
    val pairs = SimilarityQueries.minhashPairs(plantedDocs(), minJaccardEst = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((100L, 101L)).contains(1.0))
    assert(asMap.contains((102L, 103L)))
    assert(asMap((102L, 103L)) >= 0.4 && asMap((102L, 103L)) < 1.0)
    // disjoint-vocabulary docs must not pair up
    val falsePairs = pairs.filterNot(p => Set((100L, 101L), (102L, 103L)).contains((p._1, p._2)))
    assert(falsePairs.isEmpty, s"unexpected pairs: ${falsePairs.mkString(",")}")
  }

  test("d4 jaccard: frequent token skipped before the self-join, pairs from rare tokens only") {
    import spark.implicits._
    // every doc carries the hot token "the" (df = 40 > cap); docs 0/1 share
    // their entire rare vocabulary, all others are rare-disjoint
    val shared = (0 until 9).map(j => s"dup$j").mkString(" ")
    val docsDf = ((0 until 38).map(i =>
      (i.toLong, s"the " + (0 until 9).map(j => s"u${i}x$j").mkString(" "))) ++
      Seq((100L, s"the $shared"), (101L, s"the $shared")))
      .toDF("doc_id", "text")
    // the guard: no token with df > cap reaches the index the join runs on
    val idx = graft.textops.TextQueries.invertedIndex(
      graft.textops.TextQueries.tokenSets(docsDf), maxDf = 10L)
    val maxDf = idx.groupBy("token").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxDf <= 10L, s"token with df=$maxDf leaked past the guard")
    assert(idx.filter(col("token") === "the").isEmpty)
    // pairs: only the planted dup pair survives, at jaccard 1.0 over the
    // rare vocabulary ("the" contributes to neither shared nor sizes)
    val pairs = graft.textops.TextQueries.ngramJaccardPairs(docsDf, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs.keySet == Set((100L, 101L)))
    assert(pairs((100L, 101L)) == 1.0)
  }

  test("simhash: identical docs at hamming 0, near-dups close, disjoint docs far") {
    val sh = SimilarityQueries.simhash(plantedDocs()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(100L, 101L) == 0)
    assert(ham(102L, 103L) <= 12)
    assert(ham(6L, 7L) > 12) // disjoint vocabularies
  }

  // ---- hyperplane-LSH ANN (planted near-identical vectors) ----

  test("LSH bands put near-identical vectors in a shared bucket") {
    import spark.implicits._
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (math.sin(seed * 131 + i * 17).toFloat))
    val noisy = vec(3).zipWithIndex.map { case (v, i) => v + (if (i % 16 == 0) 0.01f else 0f) }
    val df = ((0 until 40).map(i => (i.toLong, vec(i))) ++ Seq((100L, noisy)))
      .toDF("vec_id", "embedding")
    val banded = SimilarityQueries.withLshBands(df, "embedding", nPlanes = 16, bandBits = 4)
      .select(col("vec_id"), explode(col("bands")).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bucket"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 100L)), s"planted near-dup not bucketed together: $pairs")
  }

  // ---- embedding-cosine near-dup (planted scaled copies) ----

  test("embedding near-dup finds every planted scaled copy and nothing else") {
    import spark.implicits._
    // seeded gaussians: cross-pair cosine concentrates near 0 in 64-d, so
    // the only pairs above 0.99 are the planted scaled copies
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      (0 until 64).map(_ => r.nextGaussian().toFloat)
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val corpus = SimilarityQueries.withPlantedScaledDups(base, every = 10)
    val pairs = SimilarityQueries.embeddingDupPairs(corpus, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = Set(0L, 10L, 20L, 30L).map(i => (i, i + 100000L))
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      s"pairs: ${pairs.mkString(",")}")
    // a scaled copy is cosine-identical to its source
    assert(pairs.forall(_._3 == 1.0))
  }

  // ---- frame sampling fan-out ----

  test("frame sampling: bounded fan-out, full-stride frames, deterministic digests") {
    val frames = SparkEntry.queries("mm2_frame_sample")(spark, sf).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.forall { case (_, fs) => fs.length >= 1 && fs.length <= 8 })
    // frame indices are contiguous from 0 and every non-final frame is full
    byDoc.foreach { case (doc, fs) =>
      val sorted = fs.sortBy(_.getAs[Int]("frame_idx"))
      assert(sorted.map(_.getAs[Int]("frame_idx")).toSeq == (0 until fs.length))
      sorted.dropRight(1).foreach(f => assert(f.getAs[Int]("frame_len") == 64,
        s"doc $doc short mid-frame"))
      assert(sorted.last.getAs[Int]("frame_len") <= 64)
    }
    assert(frames.forall(_.getAs[String]("frame_md5").length == 32))
  }

  // ---- multimodal binary plumbing ----

  test("binary decode pipeline: deterministic features, kind-dependent channels") {
    val media = BinaryPipeline.mediaFromDocuments(spark, sf)
    val f1 = BinaryPipeline.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = BinaryPipeline.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.digest).toSeq == f2.map(_.digest).toSeq)
    assert(f1.map(_.embedding.toSeq).toSeq == f2.map(_.embedding.toSeq).toSeq)
    assert(f1.forall(f => if (f.kind == "audio") f.channels == 1 else f.channels == 3))
    assert(f1.forall(f => f.embedding.length == 16 && f.n_bytes > 0))
  }

  // ---- classifier precedence (reference table-driven goldens, SURVEY §5) ----

  test("regex classifier: override beats rule beats default") {
    val rows = SparkEntry.queries("c1_regex_classifier")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (brand, ptype, label, method) =
        (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[String]("label"), r.getAs[String]("method"))
      if (brand == "Brand#13") assert(label == "OVERRIDE_13" && method == "override")
      else if (ptype.endsWith("BRASS")) assert(label == "BRASS_END" && method == "rule")
      else if (ptype.startsWith("PROMO")) assert(label == "PROMO" && method == "rule")
      else if (ptype.contains("POLISHED") || ptype.contains("BURNISHED"))
        assert(label == "SHINY" && method == "rule")
      else assert(label == "UNKNOWN" && method == "default")
    }
    assert(rows.exists(_.getAs[String]("method") == "override"))
    assert(rows.exists(_.getAs[String]("method") == "rule"))
  }

  // ---- melt fixture (reference golden: 3 genes × 2 samples → 6 rows) ----

  test("unpivot melts wide matrix to long rows (reference 3x2 fixture)") {
    import spark.implicits._
    val wide = Seq(
      ("ENSG00000000003", 1.735, 0.448),
      ("ENSG00000000005", 0.173, 0.448),
      ("ENSG00000000419", 4.689, 0.448))
      .toDF("Gene", "SRR1652895", "SRR1652896")
    val long = wide.unpivot(Array(col("Gene")),
      Array(col("SRR1652895"), col("SRR1652896")),
      "sample_accession_code", "expression_value")
    assert(long.count() == 6)
    assert(long.columns.toSeq == Seq("Gene", "sample_accession_code", "expression_value"))
    val first = long.orderBy("Gene", "sample_accession_code").head()
    assert(first.getString(0) == "ENSG00000000003")
    assert(first.getString(1) == "SRR1652895")
    assert(first.getDouble(2) == 1.735)
  }
}
