package graft

/** Scratch profiler for the hash-sketch pipelines (dev utility). */
object DebugD2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(16, appName = "debug-d2")
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    time("warmup xxhash")(
      graft.sim.SimilarityQueries.minhashPairs(docs, 0.5).count())
    time("production (xxhash64)")(
      println("pairs=" + graft.sim.SimilarityQueries.minhashPairs(docs, 0.5).count()))
    time("reproducible (sha256)")(
      println("pairs=" + graft.sim.SimilarityQueries
        .minhashPairs(docs, 0.5, reproducible = true).count()))
    time("simhash")(
      println("simhash=" + graft.sim.SimilarityQueries.simhash(docs).count()))
    spark.stop()
  }
}
