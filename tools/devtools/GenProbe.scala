package graft
import graft.gen.ChangeGen
import graft.gen.ChangeGen.GenConfig
object GenProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, appName = "gen-probe")
    spark.sparkContext.setLogLevel("WARN")
    val cfg = GenConfig(numEvents = 8000000L, numConvs = 5000, maxTurns = 40)
    def time[T](n: String)(f: => T): T = { val t=System.nanoTime(); val r=f; System.err.println(f"[gen] $n ${(System.nanoTime()-t)/1e9}%.1fs"); r }
    // 1. pure compute, no encoder: count of mapped longs
    time("mix-only count")(spark.range(0, cfg.totalRows).rdd.map(i => ChangeGen.rowAt(cfg, i).lsn).sum())
    // 2. dataset encoder path, no write
    time("encoded count")(ChangeGen.eventSlice(spark, cfg, 0, cfg.totalRows).toDF().count())
    // 3. full write to /tmp
    time("write /tmp")(ChangeGen.eventSlice(spark, cfg, 0, cfg.totalRows).toDF().write.mode("overwrite").parquet("/tmp/genprobe-disk"))
    // 4. full write to tmpfs
    time("write shm")(ChangeGen.eventSlice(spark, cfg, 0, cfg.totalRows).toDF().write.mode("overwrite").parquet("/dev/shm/genprobe-shm"))
    spark.stop()
  }
}
