package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.RelationalQueries.Q
import graft.cdc.MergeApply
import graft.lake.LakeTable

/** Materialized candidate-pair view + refresh job (reference: the ETL
  * spec's candidate-pair materialization and analytics-view refresh procs,
  * Docs/etl_requirements_reviewed_by_sr.md:255,278): j4's theta-self-join
  * pair aggregate persisted as a maintained, snapshot-committed LakeTable
  * instead of being recomputed per query.
  *
  * Refresh semantics: stored-proc-style FULL refresh — recompute the pair
  * aggregate and atomically replace the view's buckets in one fenced
  * snapshot commit (readers keep seeing the old snapshot until the commit
  * lands; a crashed refresh leaves the previous snapshot intact). The
  * epoch fence makes a replayed refresh a no-op.
  *
  * Scale shape: the view is an AGGREGATE (pairs × counts), orders of
  * magnitude smaller than the fact table, so the rewrite cost is O(view),
  * not O(facts); the recompute itself is the same one-shuffle self-join
  * j4 runs. An incremental (delta-driven) refresh would reuse
  * [[IncrementalStats]]' merge-ADD pattern — pair counts are additive —
  * and is the documented growth path when the pair space itself gets hot.
  */
object MaterializedPairs {

  val pairSchema: StructType = StructType(Seq(
    StructField("p1", LongType, nullable = false),
    StructField("p2", LongType, nullable = false),
    StructField("n_orders", LongType, nullable = false)))

  def createTable(spark: SparkSession, root: String, numBuckets: Int = 8): LakeTable =
    LakeTable.create(spark, root, schemaVer = 1, numBuckets = numBuckets,
      registry = Map(1 -> pairSchema), keyCols = Seq("p1", "p2"))

  /** The candidate-pair aggregate (j4's shape): co-occurring part pairs
    * per order with a HAVING floor. One shuffle on the join key; the pair
    * expansion is the workload.
    */
  def candidatePairs(lineitem: DataFrame, minOrders: Long = 2L): DataFrame = {
    val a = lineitem.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = lineitem.select(col("l_orderkey"), col("l_partkey").as("p2"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
  }

  /** Recompute the view and atomically replace its contents (all buckets)
    * in one fenced snapshot commit. Returns false when fenced.
    */
  def refresh(table: LakeTable, source: DataFrame, epochId: Long,
      writerId: String = ""): Boolean = {
    val cur = table.current
    if (table.fenced(cur, epochId, writerId)) return false
    val b = cur.numBuckets
    val rows = candidatePairs(source)
      .withColumn("_lsn", lit(epochId))
      .withColumn("_deleted", lit(false))
      .withColumn("_bucket", MergeApply.bucketOf(col("p1"), b))
    val files = table.writeDataFiles(
      rows.repartition(math.max(1, math.min(b, 8)), col("_bucket")), schemaVer = 1)
    val newLive = files.map(_.live).sum
    // full refresh: REPLACE every bucket (stale pairs must vanish)
    table.commit(files, (0 until b).toSet, epochId, schemaVer = 1,
      rowDelta = newLive - math.max(0L, cur.rows), maxLsnSeen = epochId,
      writerId = writerId).applied
  }

  /** Driver catalog entry: build + refresh the materialized pair table
    * from lineitem, read the VIEW back — the DuckDB oracle recomputes the
    * identical aggregate directly, so the materialization must be
    * transparent (same rows as computing it fresh).
    */
  private val j4m = Q("j4_materialized_pairs",
    (spark, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-mv-").toString + "/pairs"
      val table = createTable(spark, root)
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      // two refreshes: the second supersedes the first (epoch-fenced
      // replace), proving refresh idempotence rides the commit protocol
      require(refresh(table, li.filter(col("l_orderkey") % 2 === 0), 0L), "refresh 0 fenced")
      require(refresh(table, li, 1L), "refresh 1 fenced")
      table.read().orderBy("p1", "p2")
    },
    Some("""SELECT a.l_partkey AS p1, b.l_partkey AS p2,
            count(DISTINCT a.l_orderkey) AS n_orders
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
            ORDER BY p1, p2"""))

  val all: Seq[Q] = Seq(j4m)
}
