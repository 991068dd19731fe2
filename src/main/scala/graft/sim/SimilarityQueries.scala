package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.RelationalQueries.Q

/** Similarity search + hash-based near-dup operators over the
  * `embeddings` and `documents` tables.
  *
  * Two tiers, mirroring how a 100 TB pipeline runs ANN:
  *   - `sim1_cosine_topk`: exact brute-force cosine top-k — the
  *     correctness baseline, DuckDB-verified in double precision.
  *   - `sim2_lsh_ann`: random-hyperplane LSH bucketing + in-bucket exact
  *     re-rank — the scale path: candidate generation is a bucket-equi-join
  *     (shuffle on short signatures, never the O(n²) cross product).
  *   - `d2_minhash_lsh` / `d3_simhash`: banded MinHash and SimHash
  *     near-dup candidate generation over documents.
  *
  * All vector math is higher-order array expressions (zip_with/aggregate)
  * in double precision — codegen-compatible, no UDFs.
  */
object SimilarityQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Double-precision dot product of two float arrays. */
  private def dotD(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  private def normD(a: String): Column =
    expr(s"sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v))")

  /** SIM1 ▸ brute-force cosine top-5 for the first 30 query vectors.
    * Ranking is on the ROUNDED similarity with vec_id tiebreak so the
    * Spark/DuckDB rank order is stable under last-ulp summation
    * differences.
    */
  private[sim] val sim1 = Q("sim1_cosine_topk",
    (spark, dir) => {
      val e = emb(spark, dir)
      // Norms are computed ONCE PER VECTOR before the cross join — per
      // candidate-pair recomputation would pay two extra 64-multiply
      // aggregates on every one of the 30×N pair rows (the DuckDB twin
      // precomputes nrm per vec_id for the same reason). Same doubles:
      // identical expression over the identical array.
      val q = e.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), normD("embedding").as("qn"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"), normD("embedding").as("nn"))
      val sims = q.crossJoin(c).filter(col("qid") =!= col("nid"))
        .withColumn("sim", round(dotD("qv", "nv") / (col("qn") * col("nn")), 4))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      sims.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("nid"), col("sim"))
        .orderBy("qid", "nid")
    },
    Some("""WITH t AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                              generate_subscripts(embedding, 1) AS pos
                       FROM embeddings),
            n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM t GROUP BY vec_id),
            dots AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
                     FROM t a JOIN t b ON a.pos = b.pos
                     WHERE a.vec_id < 30 AND a.vec_id <> b.vec_id
                     GROUP BY 1, 2),
            sims AS (SELECT qid, nid,
                            round(dot/(na.nrm*nb.nrm), 4) AS sim
                     FROM dots JOIN n na ON na.vec_id = qid
                               JOIN n nb ON nb.vec_id = nid)
            SELECT qid, nid, sim FROM (
              SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, nid) AS rn FROM sims)
            WHERE rn <= 5 ORDER BY qid, nid"""))

  // ---- LSH machinery (deterministic pseudo-random planes, seed-fixed) ----

  private def mix(z0: Long): Long = graft.functions.Splitmix.mix(z0)

  /** `nPlanes` deterministic hyperplanes of dimension `dim`, components in
    * [-1, 1) derived from splitmix64 — no java.util.Random, reproducible
    * across executors.
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        (mix(seed ^ (p.toLong << 32) ^ i.toLong) >>> 11) * (2.0 / (1L << 53)) - 1.0
      }
    }

  /** Hyperplanes whose components derive from sha256("lsh:p:i"): the first
    * 13 hex digits as a 52-bit integer v, mapped to v/2^51 - 1 ∈ [-1, 1).
    * Both steps are exact in IEEE double (v is ≤52 bits; dividing by a
    * power of two and subtracting 1 stay on the 2^-51 grid), so any engine
    * with sha256 regenerates the planes bit-identically — DuckDB does, in
    * the sim2 oracle. Statistically the same uniform planes as [[planes]].
    */
  def planesSha(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    def shaHex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        java.lang.Long.parseLong(shaHex(s"lsh:$p:$i").take(13), 16) /
          (1L << 51).toDouble - 1.0
      }
    }
  }

  /** Attach an LSH bit-signature and per-band bucket ids to an embedding
    * column. Bands of `bandBits` bits each → `nPlanes/bandBits` buckets.
    * `reproducible` swaps the splitmix64 planes for the sha256-derived
    * ones ([[planesSha]]) so an external oracle can replay the bucketing.
    */
  def withLshBands(df: DataFrame, embCol: String, nPlanes: Int, bandBits: Int,
      reproducible: Boolean = false, dim: Int = 64): DataFrame = {
    val pl = typedlit(if (reproducible) planesSha(nPlanes, dim) else planes(nPlanes, dim))
    val bands = nPlanes / bandBits
    // The width check FAILS LOUD per row: a vector of any other width
    // would zip_with against null-padded planes, null the dot product,
    // and silently hand every row the all-zero signature — one hot
    // bucket holding the whole corpus, which the hot-bucket guard then
    // silently drops. Wrong-dim input is caller error, not data.
    df.withColumn("_planes", pl)
      .withColumn("sig", expr(
        s"transform(_planes, pl -> CASE WHEN size($embCol) <> $dim THEN " +
          s"CAST(raise_error(concat('withLshBands: expected $dim-dim ', " +
          s"'embedding in $embCol, got ', CAST(size($embCol) AS STRING))) AS INT) " +
          s"WHEN aggregate(zip_with($embCol, pl, " +
          // KNOWN boundary sensitivity: the sign of a float dot product is
          // summation-order-dependent within ~1 ulp of 0 (Spark sums in
          // array order; the DuckDB twin's SUM picks its own order), so a
          // vector lying essentially ON a hyperplane could bucket
          // differently across engines. Unmitigated by choice: rounding
          // only moves the knife edge (to the rounding boundary), and the
          // isotropic test embeddings put |dot| ~ O(1/√dim) — odds of a
          // ≤1e-12 dot are negligible. A production port should quantize
          // embeddings (e.g. float16 grid) if bit-exact cross-engine
          // replay at the plane boundary ever matters.
          "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END)"))
      .withColumn("bands", expr(
        s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, " +
          s"aggregate(slice(sig, b * $bandBits + 1, $bandBits), 0, (a, v) -> a * 2 + v) AS bucket))"))
      .drop("_planes")
  }

  /** SIM2 ▸ multi-probe LSH approximate NN: candidates = (query, neighbor)
    * pairs whose band signatures are within Hamming distance 1 in any band
    * — implemented as an equi-join on (band, bucket) after exploding each
    * QUERY band into its bucket plus all 1-bit-flip probe buckets
    * (candidate side stays exact, so the index is untouched). Exact cosine
    * re-rank to top-5. Recall vs sim1 is asserted in SimilaritySpec (≥0.8
    * floor); the catalog entry runs with sha256-derived planes
    * ([[planesSha]]) so the DuckDB oracle replays the whole pipeline —
    * planes, signatures, probe buckets, re-rank — and the driver
    * hash-checks it.
    *
    * Multi-probe is the scale lever: it buys recall without adding hash
    * tables, so the index shuffle stays one (band, bucket) exchange. Band
    * width (`bandBits`) is the selectivity knob — sized ~log2(n)/bands at
    * production scale so probe fan-out × bucket size stays bounded.
    */
  private[sim] val sim2 = Q("sim2_lsh_ann",
    (spark, dir) => {
      val bandBits = 4
      val base = emb(spark, dir)
      // The (band,bucket) exchange, probe explosion, and candidate dedup
      // carry BARE IDS ONLY — the 64-float payloads join back after the
      // distinct (the same discipline d2/d5 apply at their candidate
      // sites; a probe fan-out of 5 × 4 bands can re-derive one (qid,nid)
      // pair up to 20 times, and deduping struct-of-array rows would
      // shuffle and compare vector payloads 20× over).
      val e = withLshBands(base, "embedding", nPlanes = 16, bandBits = bandBits,
        reproducible = true)
        .select(col("vec_id"), explode(col("bands")).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      // 1-bit-flip probe set: the bucket itself + bandBits neighbors.
      val probes = (0 until bandBits).map(b => col("bucket").bitwiseXOR(lit(1 << b))) :+ col("bucket")
      val q = e.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("band"),
          explode(array(probes: _*)).as("bucket"))
      val candIds = q.join(
        e.select(col("vec_id").as("nid"), col("band"), col("bucket")),
        Seq("band", "bucket"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid")).distinct()
      // Vector + once-per-vector norm join back (norms per pair would pay
      // two extra 64-multiply aggregates on every candidate row).
      val vecs = base.select(col("vec_id"), col("embedding"), normD("embedding").as("nrm"))
      val cands = candIds
        .join(vecs.select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("nrm").as("qn")), "qid")
        .join(vecs.select(col("vec_id").as("nid"), col("embedding").as("nv"),
          col("nrm").as("nn")), "nid")
      val sims = cands
        .withColumn("sim", round(dotD("qv", "nv") / (col("qn") * col("nn")), 4))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      sims.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("nid"), col("sim"))
        .orderBy("qid", "nid")
    },
    Some(sim2OracleSql))

  /** DuckDB twin of sim2: regenerates the sha256-derived planes
    * (bit-identical doubles, see [[planesSha]]), recomputes signature bits
    * and band buckets, explodes the query side into 1-bit-flip probe
    * buckets, and re-ranks candidates by exact cosine rounded to 4 — the
    * same rounding contract sim1 uses. Constants mirror the catalog call
    * (16 planes, 4-bit bands, 30 query vectors, top-5).
    */
  private def sim2OracleSql: String =
    """WITH pl AS (
         SELECT p, i,
                CAST(('0x' || substr(sha256('lsh:' || p || ':' || i), 1, 13)) AS BIGINT)
                  / 2251799813685248.0 - 1.0 AS w
         FROM generate_series(0, 15) AS gp(p), generate_series(0, 63) AS gi(i)),
       t AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                    generate_subscripts(embedding, 1) AS pos
             FROM embeddings),
       dots AS (SELECT t.vec_id, pl.p, sum(t.v * pl.w) AS dot
                FROM t JOIN pl ON pl.i = t.pos - 1
                GROUP BY t.vec_id, pl.p),
       sig AS (SELECT vec_id,
                      list(CASE WHEN dot > 0 THEN 1 ELSE 0 END ORDER BY p) AS sig
               FROM dots GROUP BY vec_id),
       bands AS (SELECT vec_id, b AS band,
                        sig[b*4+1]*8 + sig[b*4+2]*4 + sig[b*4+3]*2 + sig[b*4+4] AS bucket
                 FROM sig, generate_series(0, 3) AS gb(b)),
       qprobes AS (SELECT vec_id AS qid, band,
                          unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                  xor(bucket, 4), xor(bucket, 8)]) AS bucket
                   FROM bands WHERE vec_id < 30),
       cand AS (SELECT DISTINCT q.qid, n.vec_id AS nid
                FROM qprobes q JOIN bands n ON n.band = q.band AND n.bucket = q.bucket
                WHERE n.vec_id <> q.qid),
       nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM t GROUP BY vec_id),
       dsim AS (SELECT c.qid, c.nid, sum(a.v * b.v) AS dot
                FROM cand c
                JOIN t a ON a.vec_id = c.qid
                JOIN t b ON b.vec_id = c.nid AND b.pos = a.pos
                GROUP BY c.qid, c.nid),
       sims AS (SELECT qid, nid, round(dot / (na.nrm * nb.nrm), 4) AS sim
                FROM dsim JOIN nrm na ON na.vec_id = qid
                          JOIN nrm nb ON nb.vec_id = nid)
       SELECT qid, nid, sim FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, nid) AS rn FROM sims)
       WHERE rn <= 5 ORDER BY qid, nid"""

  /** D2 ▸ banded MinHash-LSH near-dup candidates over documents: 3-word
    * shingles → 16 minhashes → 4 bands of 4 → bucket-join pairs +
    * estimated Jaccard (fraction of matching minhashes). The catalog entry
    * runs in `reproducible = true` mode (sha256-derived 32-bit hex-string
    * hashes, string band buckets) so DuckDB can replay the exact pipeline
    * and the driver hash-checks it; production callers keep the default
    * xxhash64 mode (same algorithm, cheaper hash).
    */
  private[sim] val d2 = Q("d2_minhash_lsh",
    (spark, dir) => minhashPairs(docs(spark, dir), minJaccardEst = 0.5,
      reproducible = true),
    Some(d2OracleSql))

  /** Shared MinHash pipeline: returns candidate pairs (d1, d2, est_jaccard).
    *
    * Scale guards (the difference between LSH that works at 100 TB and one
    * that melts down on the first degenerate bucket):
    *   - frequent-bucket skip: band buckets holding more than
    *     `maxBucketSize` docs are dropped before pairing — a bucket of n
    *     docs makes n²/2 candidates, and hot buckets are exactly the ones
    *     whose members a real dedup re-examines by other means
    *   - candidate pairs are deduped on bare (d1, d2) ids first; the
    *     16-element signature arrays are joined back afterwards, so the
    *     distinct never shuffles array payloads
    */
  def minhashPairs(documents: DataFrame, minJaccardEst: Double,
      nHashes: Int = 16, bandSize: Int = 4, maxBucketSize: Int = 64,
      reproducible: Boolean = false): DataFrame = {
    val bands = nHashes / bandSize
    // Per-permutation shingle hash. Default: xxhash64(s, seed=p) — fast,
    // codegen'd. Reproducible: 8-hex-digit (32-bit) slices of sha256 hex
    // digests kept AS STRINGS — fixed-width lowercase hex makes
    // lexicographic min ≡ numeric min, so no per-row parse is needed
    // (a conv(...,16,10) per permutation per shingle row measured ~2× on
    // the whole pipeline), minhash equality/banding only ever needs
    // equality, and DuckDB replays `min(substr(sha256(...)))`
    // byte-identically. One digest feeds EIGHT permutations, so the
    // sha256 cost per shingle is nHashes/8 digests. The digests are
    // materialized as projection columns (`_d<g>`) before the aggregate so
    // they are computed once per row regardless of codegen subexpression
    // elimination.
    def permHash(p: Int) =
      if (reproducible) substring(col(s"_d${p / 8}"), (p % 8) * 8 + 1, 8)
      else xxhash64(col("s"), lit(p))
    // Band bucket identity only needs equality; reproducible mode keeps
    // the raw joined-minhash string (DuckDB: array_to_string of the list
    // slice), default mode hashes it down to 8 bytes for the shuffle.
    val bucketSql =
      if (reproducible) s"concat_ws(',', slice(minhashes, b * $bandSize + 1, $bandSize))"
      else s"xxhash64(concat_ws(',', slice(minhashes, b * $bandSize + 1, $bandSize)))"
    // Relational minhash: explode shingles, then one codegen'd min-agg per
    // permutation. The Aggregate is a plan barrier, so downstream
    // references never re-inline the shingling work (nested higher-order
    // lambdas are interpreted AND get duplicated by projection collapse —
    // measured 180× slower), and ReuseExchange shares the one shuffle
    // across the self-join sides.
    val shingleRows = documents
      .withColumn("toks", filter(split(lower(col("text")), " "), x => x =!= ""))
      .withColumn("shingles", expr(
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) ELSE array(concat_ws(' ', toks)) END"))
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val hashInput =
      if (reproducible)
        (0 until (nHashes + 7) / 8).foldLeft(shingleRows) { (df, g) =>
          df.withColumn(s"_d$g", sha2(concat_ws(":", lit(g.toString), col("s")), 256))
        }
      else shingleRows
    val sh = hashInput
      .groupBy(col("doc_id"))
      .agg(array((0 until nHashes).map(p => min(permHash(p))): _*).as("minhashes"))
    val banded = sh.withColumn("bb", expr(
      s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, " +
        s"$bucketSql AS bucket))"))
      .select(col("doc_id"), explode(col("bb")).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val smallBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val kept = banded.join(smallBuckets, Seq("band", "bucket"))
    val candidates = kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    candidates
      .join(sh.select(col("doc_id").as("d1"), col("minhashes").as("m1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("minhashes").as("m2")), "d2")
      .withColumn("est_jaccard", round(
        expr("size(filter(zip_with(m1, m2, (x, y) -> x = y), b -> b))") /
          lit(nHashes.toDouble), 4))
      .filter(col("est_jaccard") >= minJaccardEst)
      .select(col("d1"), col("d2"), col("est_jaccard"))
      .orderBy("d1", "d2")
  }

  /** Number of SimHash bits. 63 (not 64) keeps the fingerprint
    * non-negative in a signed long, so `>>`, `xor` and `bit_count` behave
    * identically in Spark and DuckDB with no sign-extension edge cases.
    */
  val simhashBits = 63

  /** Hot-bucket guard shared by d2/d3: a bucket of n members yields n²/2
    * candidate pairs, so one degenerate bucket melts the join at scale.
    */
  val maxSimhashBucket = 64

  private val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** D3 ▸ 63-bit SimHash per document + same-high-16-bit-bucket candidate
    * pairs with Hamming distance ≤ 8. Token hash bits are sha256-derived
    * (bit b = high bit of hex digit b of sha256(token)) so the whole
    * operator is byte-reproducible in DuckDB — the driver hash-checks it.
    *
    * Scale guards: bucket-join (never all-pairs) + frequent-bucket skip
    * (buckets over [[maxSimhashBucket]] docs are dropped before pairing,
    * mirroring the d2 MinHash guard).
    */
  private[sim] val d3 = Q("d3_simhash",
    (spark, dir) => simhashPairs(simhash(docs(spark, dir))),
    Some(d3OracleSql))

  /** Bucket-join pairing over a (doc_id, simhash) frame — shared by the
    * reproducible catalog entry and the production-hash bench twin.
    */
  def simhashPairs(sh: DataFrame): DataFrame = {
    val bucketed = sh.withColumn("bucket", shiftright(col("simhash"), simhashBits - 16))
    val small = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxSimhashBucket)
      .select(col("bucket"))
    val kept = bucketed.join(small, Seq("bucket"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)"))
      .filter(col("hamming") <= 8)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), col("hamming"))
      .orderBy("d1", "d2")
  }

  /** xxhash64 production twin of [[simhash]]: bit b of the fingerprint
    * reads bit b of xxhash64(token) — no hex strings, no sha256 digests;
    * the whole bit-sum stage is codegen'd long arithmetic. Not
    * DuckDB-replayable (xxhash64 is Spark-side), so it carries no oracle:
    * the driver hash-checks the sha256 mode, the bench times BOTH so the
    * recorded numbers include what production would actually run.
    */
  def simhashProd(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), " "), x => x =!= "")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = tok.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("b0"),
      (1 until simhashBits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
          .as(s"b$b")): _*)
    val simhashCol = (0 until simhashBits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    bitSums.select(col("doc_id"), simhashCol.as("simhash"))
  }

  /** Production-hash bench twins of d2/d3: identical algorithm and scale
    * guards, xxhash64 in place of the sha256 the DuckDB oracle replays.
    * Bench-only (no driver catalog entry — no oracle is possible), so the
    * published per-query table reflects production cost, not just the
    * oracle-reproducible mode (the catalog d2/d3 pay a documented ~2-3×
    * digest premium for replayability).
    */
  val prodVariants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "d2_minhash_lsh_prod" -> ((spark: SparkSession, dir: String) =>
      minhashPairs(docs(spark, dir), minJaccardEst = 0.5)),
    "d3_simhash_prod" -> ((spark: SparkSession, dir: String) =>
      simhashPairs(simhashProd(docs(spark, dir)))))

  /** Token-level SimHash: per bit, sum +/-1 over token hashes, bit set
    * where the sum is positive. Relational shape: explode tokens once,
    * [[simhashBits]] codegen'd conditional-sum aggregates (one per bit),
    * recombine — one shuffle, no interpreted nested lambdas. The per-token
    * hash is the sha256 hex string; bit b reads the high bit of hex digit
    * b (uniform, and exactly reproducible in any engine with sha256).
    */
  def simhash(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), " "), x => x =!= "")).as("t"))
      .select(col("doc_id"), sha2(col("t"), 256).as("h"))
    val bitSums = tok.groupBy(col("doc_id")).agg(
      sum(when(substring(col("h"), 1, 1).isin(hexHigh: _*), 1L).otherwise(-1L)).as("b0"),
      (1 until simhashBits).map(b =>
        sum(when(substring(col("h"), b + 1, 1).isin(hexHigh: _*), 1L).otherwise(-1L)).as(s"b$b")): _*)
    val simhashCol = (0 until simhashBits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    bitSums.select(col("doc_id"), simhashCol.as("simhash"))
  }

  /** DuckDB twin of d2 in reproducible mode: same shingling, same
    * sha256-derived per-permutation 8-hex-digit string hashes (min over
    * fixed-width lowercase hex ≡ numeric min in both engines' binary
    * collation), same string band buckets, same hot-bucket skip and
    * signature-match Jaccard estimate. Constants mirror the catalog call
    * (16 hashes, 4×4 bands, maxBucketSize 64, est ≥ 0.5).
    */
  private def d2OracleSql: String =
    """WITH toks AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         FROM documents),
       sh AS (
         SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks)-2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [array_to_string(toks, ' ')] END) AS s
         FROM toks),
       mh AS (
         SELECT doc_id, p,
            min(substr(sha256(CAST(p // 8 AS VARCHAR) || ':' || s),
                       (p % 8) * 8 + 1, 8)) AS h
         FROM sh, generate_series(0, 15) AS g(p)
         GROUP BY doc_id, p),
       sig AS (SELECT doc_id, list(h ORDER BY p) AS minhashes FROM mh GROUP BY doc_id),
       banded AS (
         SELECT doc_id, b AS band,
                array_to_string(minhashes[b*4+1:b*4+4], ',') AS bucket
         FROM sig, generate_series(0, 3) AS g(b)),
       smallb AS (SELECT band, bucket FROM banded GROUP BY band, bucket HAVING count(*) <= 64),
       kept AS (SELECT b.* FROM banded b JOIN smallb USING (band, bucket)),
       cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                FROM kept a JOIN kept b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.doc_id < b.doc_id),
       withsig AS (SELECT d1, d2, s1.minhashes AS m1, s2.minhashes AS m2 FROM cand
                   JOIN sig s1 ON s1.doc_id = cand.d1 JOIN sig s2 ON s2.doc_id = cand.d2),
       est AS (SELECT d1, d2,
                 round(sum(CASE WHEN m1[i] = m2[i] THEN 1 ELSE 0 END)/16.0, 4) AS est_jaccard
               FROM withsig, generate_series(1, 16) AS g(i) GROUP BY d1, d2)
       SELECT d1, d2, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY d1, d2"""

  // ---- D5: embedding-cosine near-duplicate detection ----

  /** Deterministic near-dup fixture: every `every`-th vector gets a copy
    * scaled by 0.5 under a shifted id. Multiplying a float by 0.5 is exact
    * (exponent decrement), cosine is invariant under positive scaling, and
    * `sign(w·(x/2)) = sign(w·x)` exactly in IEEE arithmetic — so each
    * planted copy is byte-different from its source yet *guaranteed* to
    * share every LSH band bucket with it. This models the real
    * normalized-duplicate phenomenon (same content, different scale) while
    * keeping the catalog entry's result fully deterministic.
    */
  def withPlantedScaledDups(embeddings: DataFrame, every: Int = 10,
      idOffset: Long = 100000L): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    base.unionByName(
      base.filter(col("vec_id") % every === 0)
        .select((col("vec_id") + idOffset).as("vec_id"),
          expr("transform(embedding, x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))")
            .as("embedding")))
  }

  /** Near-duplicate pairs by embedding cosine: random-hyperplane LSH
    * bucketing (same index machinery as sim2) generates candidates, exact
    * cosine ≥ `minCosine` verifies them. Output is dedup-shaped:
    * `(keep_id, dup_id, sim)` with `keep_id < dup_id` — the survivor is the
    * smaller id, matching d1's min-id convention.
    *
    * Scale shape: candidates come from a (band, bucket) equi-join — never
    * all-pairs — with the d2/d3 frequent-bucket skip (`maxBucketSize`), and
    * the pair distinct runs on bare ids before vectors are joined back, so
    * the shuffle never carries embedding payloads.
    */
  def embeddingDupPairs(corpus: DataFrame, minCosine: Double,
      nPlanes: Int = 16, bandBits: Int = 4, maxBucketSize: Int = 64,
      reproducible: Boolean = false): DataFrame = {
    val banded = withLshBands(corpus, "embedding", nPlanes, bandBits, reproducible)
      .select(col("vec_id"), explode(col("bands")).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val small = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val kept = banded.join(small, Seq("band", "bucket"))
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("keep_id"), col("b.vec_id").as("dup_id"))
      .distinct()
    // once-per-vector norms ride the join-back (two extra 64-multiply
    // aggregates per verified pair otherwise)
    val vecs = corpus.select(col("vec_id"), col("embedding"),
      normD("embedding").as("nrm"))
    cand
      .join(vecs.select(col("vec_id").as("keep_id"), col("embedding").as("v1"),
        col("nrm").as("n1")), "keep_id")
      .join(vecs.select(col("vec_id").as("dup_id"), col("embedding").as("v2"),
        col("nrm").as("n2")), "dup_id")
      .withColumn("sim", round(dotD("v1", "v2") / (col("n1") * col("n2")), 4))
      .filter(col("sim") >= minCosine)
      .select(col("keep_id"), col("dup_id"), col("sim"))
      .orderBy("keep_id", "dup_id")
  }

  /** D5 ▸ embedding-cosine near-dup over the embeddings table with planted
    * scaled-copy duplicates (the testdata has no natural pair above cosine
    * 0.52, so the fixture plants byte-different cosine-1.0 copies — see
    * [[withPlantedScaledDups]]). Runs with sha256-derived planes so the
    * DuckDB oracle replays the whole pipeline — planting, bucketing,
    * hot-bucket skip, verify — and the driver hash-checks it.
    */
  private[sim] val d5 = Q("d5_embedding_dup",
    (spark, dir) => embeddingDupPairs(withPlantedScaledDups(emb(spark, dir)),
      minCosine = 0.99, reproducible = true),
    Some(d5OracleSql))

  /** DuckDB twin of d5: replant the scaled copies, regenerate the sha256
    * planes/signatures/band buckets (bit-identical, see [[planesSha]]),
    * apply the same hot-bucket skip, verify candidates at cosine ≥ 0.99
    * rounded to 4 — the full pipeline, not just the expected answer.
    */
  private def d5OracleSql: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
       corpus AS (
         SELECT vec_id, embedding FROM base
         UNION ALL
         SELECT vec_id + 100000,
                list_transform(embedding, x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))
         FROM base WHERE vec_id % 10 = 0),
       pl AS (
         SELECT p, i,
                CAST(('0x' || substr(sha256('lsh:' || p || ':' || i), 1, 13)) AS BIGINT)
                  / 2251799813685248.0 - 1.0 AS w
         FROM generate_series(0, 15) AS gp(p), generate_series(0, 63) AS gi(i)),
       t AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                    generate_subscripts(embedding, 1) AS pos
             FROM corpus),
       dots AS (SELECT t.vec_id, pl.p, sum(t.v * pl.w) AS dot
                FROM t JOIN pl ON pl.i = t.pos - 1
                GROUP BY t.vec_id, pl.p),
       sig AS (SELECT vec_id,
                      list(CASE WHEN dot > 0 THEN 1 ELSE 0 END ORDER BY p) AS sig
               FROM dots GROUP BY vec_id),
       bands AS (SELECT vec_id, b AS band,
                        sig[b*4+1]*8 + sig[b*4+2]*4 + sig[b*4+3]*2 + sig[b*4+4] AS bucket
                 FROM sig, generate_series(0, 3) AS gb(b)),
       small AS (SELECT band, bucket FROM bands GROUP BY band, bucket
                 HAVING count(*) <= 64),
       kept AS (SELECT b.* FROM bands b JOIN small USING (band, bucket)),
       cand AS (SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id
                FROM kept a JOIN kept b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.vec_id < b.vec_id),
       nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM t GROUP BY vec_id),
       dsim AS (SELECT c.keep_id, c.dup_id, sum(a.v * b.v) AS dot
                FROM cand c
                JOIN t a ON a.vec_id = c.keep_id
                JOIN t b ON b.vec_id = c.dup_id AND b.pos = a.pos
                GROUP BY c.keep_id, c.dup_id),
       sims AS (SELECT keep_id, dup_id, round(dot / (na.nrm * nb.nrm), 4) AS sim
                FROM dsim JOIN nrm na ON na.vec_id = keep_id
                          JOIN nrm nb ON nb.vec_id = dup_id)
       SELECT keep_id, dup_id, sim FROM sims WHERE sim >= 0.99
       ORDER BY keep_id, dup_id"""

  // ---- SIM3: IVF-flat approximate nearest neighbor ----

  /** SIM3 ▸ IVF-flat ANN — the coarse-quantizer scale path beside sim2's
    * LSH: every vector is assigned to its nearest centroid cell (inverted
    * lists), a query probes its `nprobe` nearest cells and exact-reranks
    * only those cells' members. Centroids are sampled deterministically
    * (every 25th vec_id — sampling-based centroid init, no Lloyd
    * iterations, so the whole operator is replayable in SQL; iterative
    * k-means would make centroids depend on float summation order across
    * partitions and break cross-engine determinism).
    *
    * Scale shape: K ~ √N centroids broadcast to every task (one narrow
    * cross join against a K-row build side — no N×N anything), assignment
    * is a single window per vector, and probe→candidates is an equi-join
    * on cell id. Candidate count ≈ nprobe/K of the corpus per query.
    * Cell ranking uses ROUNDED cosine (4dp) with centroid-id tiebreak so
    * the probe set is stable under last-ulp summation differences.
    *
    * Honest recall note: the driver testdata embeddings are isotropic
    * (within-label mean cosine 0.002 — no directional clusters), and on
    * isotropic data ANY cell-partitioned ANN recalls ≈ the probed cell
    * fraction. The catalog entry therefore probes 8 of 20 cells (measured
    * recall ~0.73 vs sim1's exact top-5; SimilaritySpec gates ≥ 0.6). On
    * a real clustered corpus the same operator runs K ~ √N, nprobe ≪ K —
    * the probe fraction, not the mechanics, is what changes.
    */
  private[sim] val sim3 = Q("sim3_ivf_ann",
    (spark, dir) => {
      // One norm per vector, computed at the scan and carried through —
      // recomputing it per (vector, centroid) row of the K-way broadcast
      // expansion (and again per candidate pair in the rerank) would run
      // the 64-multiply aggregate K+probe times per vector instead of once
      // (the DuckDB twin's nrm CTE is this same factoring).
      val e = emb(spark, dir).select(col("vec_id"), col("embedding"),
        normD("embedding").as("nrm"))
      val cents = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("nrm").as("cn"))
      val ranked = e.crossJoin(broadcast(cents))
        .withColumn("csim",
          round(dotD("embedding", "cv") / (col("nrm") * col("cn")), 4))
        .withColumn("crn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid").asc)))
      val assign = ranked.filter(col("crn") === 1)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"),
          col("nrm").as("nn"), col("cid"))
      val probes = ranked.filter(col("vec_id") < 30 && col("crn") <= 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("nrm").as("qn"), col("cid"))
      // Each vector lives in exactly one cell and a query's probe cells are
      // distinct, so (qid, nid) pairs are already unique — no distinct.
      val cand = probes.join(assign, "cid").filter(col("qid") =!= col("nid"))
      val sims = cand
        .withColumn("sim", round(dotD("qv", "nv") / (col("qn") * col("nn")), 4))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      sims.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("nid"), col("sim"))
        .orderBy("qid", "nid")
    },
    Some(sim3OracleSql))

  /** DuckDB twin of sim3: same sampled centroids, same rounded-cosine cell
    * ranking with centroid-id tiebreak, same nprobe=8 probe set, same
    * exact rerank to top-5. Constants mirror the catalog call.
    */
  private def sim3OracleSql: String =
    """WITH t AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                         generate_subscripts(embedding, 1) AS pos
                  FROM embeddings),
       nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM t GROUP BY vec_id),
       cdots AS (SELECT a.vec_id, b.vec_id AS cid, sum(a.v * b.v) AS dot
                 FROM t a JOIN t b ON b.pos = a.pos AND b.vec_id % 25 = 0
                 GROUP BY a.vec_id, b.vec_id),
       ranked AS (SELECT cdots.vec_id, cid,
                         row_number() OVER (PARTITION BY cdots.vec_id
                           ORDER BY round(dot / (na.nrm * nc.nrm), 4) DESC, cid) AS crn
                  FROM cdots JOIN nrm na ON na.vec_id = cdots.vec_id
                             JOIN nrm nc ON nc.vec_id = cid),
       assign AS (SELECT vec_id AS nid, cid FROM ranked WHERE crn = 1),
       probes AS (SELECT vec_id AS qid, cid FROM ranked
                  WHERE vec_id < 30 AND crn <= 8),
       cand AS (SELECT qid, nid FROM probes JOIN assign USING (cid)
                WHERE nid <> qid),
       dsim AS (SELECT c.qid, c.nid, sum(a.v * b.v) AS dot
                FROM cand c
                JOIN t a ON a.vec_id = c.qid
                JOIN t b ON b.vec_id = c.nid AND b.pos = a.pos
                GROUP BY c.qid, c.nid),
       sims AS (SELECT qid, nid, round(dot / (na.nrm * nb.nrm), 4) AS sim
                FROM dsim JOIN nrm na ON na.vec_id = qid
                          JOIN nrm nb ON nb.vec_id = nid)
       SELECT qid, nid, sim FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, nid) AS rn FROM sims)
       WHERE rn <= 5 ORDER BY qid, nid"""

  /** DuckDB twin of d3, generated (63 conditional-sum columns). */
  private def d3OracleSql: String = {
    val inList = hexHigh.map(h => s"'$h'").mkString(", ")
    val bitSums = (0 until simhashBits).map(b =>
      s"CAST(sum(CASE WHEN substr(h, ${b + 1}, 1) IN ($inList) THEN 1 ELSE -1 END) AS BIGINT) AS b$b")
      .mkString(", ")
    val shSum = (0 until simhashBits).map(b =>
      s"CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    s"""WITH tok AS (
          SELECT doc_id, sha256(t) AS h FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
            FROM documents) WHERE t <> ''),
        bits AS (SELECT doc_id, $bitSums FROM tok GROUP BY doc_id),
        sh AS (SELECT doc_id, $shSum AS simhash FROM bits),
        bkt AS (SELECT doc_id, simhash, simhash >> ${simhashBits - 16} AS bucket FROM sh),
        small AS (SELECT bucket FROM bkt GROUP BY bucket
                  HAVING count(*) <= $maxSimhashBucket),
        kept AS (SELECT b.* FROM bkt b JOIN small USING (bucket))
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        ORDER BY d1, d2"""
  }

  val all: Seq[Q] = Seq(sim1, sim2, sim3, d2, d3, d5)
}
