package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults: AQE on
  * (runtime re-plan + skew-join splitting), shuffle partitions sized to
  * cores (not the 200 default), UTC session time zone for oracle parity.
  */
object Sessions {
  def local(cores: Int, shufflePartitions: Int = -1, appName: String = "graft"): SparkSession = {
    // Shuffle-partition multiplier (default 1 → partitions = cores).
    // Over-partitioning (e.g. ×4) + AQE coalescing balances skewed/
    // straggling reduce tasks across cores; A/B knob for the merge loop.
    val mult = sys.env.get("SPARK_GRAFT_SP_MULT").map(_.toInt).getOrElse(1)
    val sp = if (shufflePartitions > 0) shufflePartitions else cores * mult
    // SPARK_GRAFT_AQE=0 turns adaptive execution off — an A/B knob for
    // measuring AQE's per-stage driver re-planning cost in the merge loop.
    val aqe = !sys.env.get("SPARK_GRAFT_AQE").contains("0")
    // Shuffle/spill on tmpfs when the host has one (measured: the 8-core
    // merge epoch dropped 10.4 s → 6.3 s once shuffle files stopped
    // hitting the VM's virtio disk — the disk was a fixed-bandwidth
    // serializer that capped N→4N scaling). The real-cluster analogue is
    // executors shuffling to local NVMe; SPARK_GRAFT_LOCAL_DIR overrides.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
      .orElse(if (new java.io.File("/dev/shm").isDirectory) Some("/dev/shm/graft-spark-local")
              else None)
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // Survive multi-minute hypervisor pauses on the shared sandbox host
      // (a 260 s whole-JVM freeze was observed); without this the local
      // executor gets heartbeat-evicted and the session is dead.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
    localDir.foreach(d => b.config("spark.local.dir", d))
    b.getOrCreate()
  }
}
