package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Model.{ChangeEvent, Turn}

/** Deterministic, seed-fixed change-event generator (FIXTURES.md §1).
  *
  * Every field of every event is a pure function of (seed, index) via a
  * splitmix64 mixer, so the stream is reproducible across runs, partitions
  * and parallelism levels — a requirement for the replay-equality tests
  * and the two-parallelism bench. No wall-clock, no java.util.Random state.
  *
  * Shape knobs mirror the fixture spec: hot-conversation skew, ~2%
  * duplicate re-emissions (same LSN), bounded out-of-order emission, a
  * schema-v2 tail that starts carrying the `tool` column.
  */
object ChangeGen {

  final case class GenConfig(
      numConvs: Int = 200,
      maxTurns: Int = 50,
      numEvents: Long = 20000L,
      seed: Long = 42L,
      hotConvs: Int = 5,
      hotFraction: Double = 0.30,
      dupFraction: Double = 0.02,
      oooWindow: Int = 64,
      pInsert: Double = 0.60,
      pUpdate: Double = 0.30,
      v2From: Double = 0.60) {
    def totalRows: Long = numEvents + (numEvents * dupFraction).toLong
  }

  private val baseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  @inline private def mix(z0: Long): Long = graft.functions.Splitmix.mix(z0)

  @inline private def h(seed: Long, a: Long, b: Long): Long = mix(mix(seed ^ a) ^ b)

  @inline private def u01(x: Long): Double = (x >>> 11) * (1.0 / (1L << 53))

  @inline private def posMod(x: Long, m: Int): Int = { val r = (x % m).toInt; if (r < 0) r + m else r }

  private val roles = Array("user", "assistant", "system", "tool")

  /** The base event at 0-based index `i` (lsn = i + 1). */
  def eventAt(cfg: GenConfig, i: Long): ChangeEvent = {
    val s = cfg.seed
    val lsn = i + 1
    val hot = u01(h(s, i, 1)) < cfg.hotFraction
    val convIdx =
      if (hot) posMod(h(s, i, 2), cfg.hotConvs)
      else cfg.hotConvs + posMod(h(s, i, 2), math.max(1, cfg.numConvs - cfg.hotConvs))
    val convId = f"conv-$convIdx%06d"
    val turn = posMod(h(s, i, 3), cfg.maxTurns)
    val opU = u01(h(s, i, 4))
    val op = if (opU < cfg.pInsert) "I" else if (opU < cfg.pInsert + cfg.pUpdate) "U" else "D"
    val ver = if (lsn > (cfg.numEvents * cfg.v2From).toLong) 2 else 1
    val role = roles(posMod(h(s, i, 5), roles.length))
    val del = op == "D"
    val text =
      if (del) None
      else Some(s"turn $turn of $convId rev $lsn :: ${java.lang.Long.toHexString(h(s, i, 6))}")
    val tool =
      if (del || ver < 2) None
      else if (role == "assistant" && posMod(h(s, i, 7), 3) == 0) Some(s"tool-${posMod(h(s, i, 7), 8)}")
      else None
    val ts = if (del) None else Some(new Timestamp(baseEpochMs + lsn * 1000L))
    ChangeEvent(lsn, op, ver, convId, turn,
      if (del) None else Some(role), text, tool, ts)
  }

  /** Row at generator index `i` over the full emitted stream: indices past
    * `numEvents` are duplicate re-emissions of a deterministic earlier
    * event (same LSN + payload — the exactly-once replay fixture).
    */
  def rowAt(cfg: GenConfig, i: Long): ChangeEvent =
    if (i < cfg.numEvents) eventAt(cfg, i)
    else eventAt(cfg, posMod(h(cfg.seed, i, 8), math.min(cfg.numEvents, Int.MaxValue).toInt).toLong)

  /** Emission-order key: LSN perturbed by a bounded FORWARD offset at
    * stride 1, so neighboring events genuinely swap places — an event with
    * lsn L and offset near `oooWindow` sorts after events up to
    * `lsn + oooWindow - 1` with small offsets. This produces real
    * out-of-order arrival (inversions), bounded by the window; a stride
    * wider than the window would keep the stream fully sorted and make the
    * out-of-order fixture claim vacuous (ChangeGenSpec asserts inversions
    * exist).
    */
  def emitKey(cfg: GenConfig, i: Long): Long = {
    val e = rowAt(cfg, i)
    e.lsn + posMod(h(cfg.seed, i, 9), cfg.oooWindow)
  }

  /** Distributed generation: one deterministic row per index. */
  def events(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0, cfg.totalRows).as[Long].map(i => rowAt(cfg, i))
  }

  /** A contiguous slice [from, until) of the emitted stream in generator
    * index order — the micro-batch unit for batch-mode replay.
    */
  def eventSlice(spark: SparkSession, cfg: GenConfig, from: Long, until: Long): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(from, until).as[Long].map(i => rowAt(cfg, i))
  }

  /** Events in (perturbed) emission order — for writing stream input files.
    * Generator index is the tiebreak so the emission order is total and
    * reproducible across runs/parallelism.
    */
  def emittedEvents(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0, cfg.totalRows).as[Long]
      .map(i => (emitKey(cfg, i), i, rowAt(cfg, i)))
      .orderBy("_1", "_2").map(_._3)
  }

  /** Emitted stream with its (emit key, generator index) order columns kept
    * alongside the event struct (`k`, `i`, `e`) — the distributed input to
    * [[graft.cdc.StreamFiles.writeChunkedOrdered]], which needs the order
    * columns to range-partition without a driver-side sort/collect.
    */
  def emittedKeyed(spark: SparkSession, cfg: GenConfig): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, cfg.totalRows).as[Long]
      .map(i => (emitKey(cfg, i), i, rowAt(cfg, i)))
      .toDF("k", "i", "e")
  }

  /** The reference oracle: a deliberately naive in-memory fold by ascending
    * LSN, last-writer-wins, delete removes the key (SURVEY.md §5.3). The
    * engine's final table state must equal this map exactly.
    */
  def oracleFold(events: Seq[ChangeEvent]): Map[(String, Long), Turn] = {
    val m = scala.collection.mutable.Map[(String, Long), Turn]()
    events.sortBy(_.lsn).foreach { e =>
      val k = (e.conv_id, e.turn_idx.toLong)
      if (e.op == "D") m.remove(k)
      else m(k) = Turn(e.conv_id, e.turn_idx, e.role.orNull, e.text.orNull, e.tool, e.ts.orNull)
    }
    m.toMap
  }

  /** Oracle computed distributedly for larger inputs: per-key max-LSN event
    * (provably equal to the fold — a key's final state depends only on its
    * own max-LSN event).
    */
  def oracleDf(spark: SparkSession, cfg: GenConfig): Dataset[Turn] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    events(spark, cfg).toDF()
      .groupBy($"conv_id", $"turn_idx")
      .agg(max_by(struct(col("*")), $"lsn").as("e"))
      .select($"e.*")
      .filter($"op" =!= "D")
      .select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
      .as[Turn]
  }
}
