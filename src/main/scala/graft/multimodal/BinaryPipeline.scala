package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images / audio / video ride through the
  * engine as opaque `binary` payloads with typed metadata, processed in
  * batched per-partition passes (the Scala analog of `mapInPandas` — one
  * decoder instantiation per partition, vectorized batch shape, results as
  * typed rows).
  *
  * The actual codecs (JPEG decode, resampling, frame sampling) are NOT in
  * this container, so the decode step is a clearly-marked deterministic
  * fake ([[FakeCodec]]); everything Spark-level around it is real and
  * tested: the schema, the binary column handling, the per-partition
  * batching, the partition-size control for fat rows, and the
  * feature-struct output shape.
  *
  * Scale notes: binary payloads make rows fat, so the pipeline
  * repartitions by byte budget before the decode pass (a 100 TB corpus
  * wants ~128 MB of payload per task, not a fixed row count), and the
  * decode emits fixed-width features so everything downstream is columnar
  * again.
  */
object BinaryPipeline {

  /** Typed metadata travelling with each payload. */
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long, digest: String)

  /** Fixed-width features produced by the decode pass. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float])

  /** STUB: deterministic stand-in for the real media codec. Derives
    * pseudo-dimensions and a pseudo-embedding purely from the payload
    * bytes, so tests are reproducible. A real deployment swaps this for
    * an actual decoder (e.g. javacv / a JNI codec) with the same
    * signature — the Spark plumbing does not change.
    */
  object FakeCodec {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val md = MessageDigest.getInstance("SHA-256").digest(bytes)
      def u(i: Int): Int = md(i % md.length) & 0xff
      val width = 64 + (u(0) << 4 | u(1) >> 4)
      val height = 64 + (u(2) << 4 | u(3) >> 4)
      val channels = if (kind == "audio") 1 else 3
      val emb = Array.tabulate(16)(i => ((u(2 * i) << 8 | u(2 * i + 1)) / 65535.0f) - 0.5f)
      (width, height, channels, emb)
    }
  }

  /** Wrap an id + binary payload DataFrame (`media_id`, `kind`, `payload`)
    * with typed metadata — pure column expressions, stays in codegen.
    */
  def withMeta(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", sha2(col("payload"), 256))

  /** The batched decode pass. `targetBytesPerPartition` sizes tasks by
    * payload volume (fat-row aware) before the per-partition decode.
    */
  def decodeFeatures(
      df: DataFrame,
      targetBytesPerPartition: Long = 128L * 1024 * 1024): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    val withBytes = withMeta(df)
    // Partition sizing comes from plan-time statistics: for a file-backed
    // source this is the on-disk byte count the planner already knows, so
    // no job runs. The old exact pass (sum(octet_length(payload))) read
    // every payload byte — a full extra scan of the corpus just to pick a
    // partition count. The exact aggregate survives only as the fallback
    // for sources whose plan stats are the unknown sentinel.
    // The stat is COMPRESSED on-disk bytes while the budget protects
    // in-memory decoded payload, so it is scaled by a conservative
    // decompression factor — over-partitioning costs a few extra tasks,
    // under-partitioning OOMs the per-partition decode this knob exists to
    // bound. (Real media bytes are mostly entropy-coded already; 4x covers
    // parquet's framing plus moderately compressible payloads.)
    val decompressionFactor = 4L
    val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val totalBytes =
      if (statBytes > 0 && statBytes < BigInt(Long.MaxValue) / 8)
        statBytes.toLong * decompressionFactor
      else withBytes.agg(sum(col("n_bytes"))).head().get(0) match {
        case null => 0L
        case x: Long => x
        case x: java.math.BigDecimal => x.longValue()
      }
    // NO parallelism-based cap: the byte budget exists precisely to bound
    // the decoded payload held by one task — capping partitions at
    // cores×N hands a big corpus on a small cluster arbitrarily oversized
    // partitions, the exact OOM this knob prevents. Excess partitions
    // merely queue (cheap); oversized ones kill executors. The quotient is
    // clamped in LONG space (an Int overflow near the stat guard would
    // wrap to a tiny — even single — partition count).
    val parts = math.max(1L, math.min(
      totalBytes / math.max(1L, targetBytesPerPartition) + 1L,
      Int.MaxValue.toLong)).toInt
    withBytes
      .repartition(parts, col("media_id"))
      .select(col("media_id"), col("kind"), col("payload"), col("n_bytes"), col("digest"))
      .as[(Long, String, Array[Byte], Long, String)]
      .mapPartitions { it =>
        // one codec instantiation per partition (mapInPandas batch shape)
        it.map { case (id, kind, payload, nBytes, digest) =>
          val (w, h, c, emb) = FakeCodec.decode(kind, payload)
          MediaFeatures(id, kind, nBytes, digest, w, h, c, emb)
        }
      }
  }

  /** Demo source: turn the documents table into a binary "media" table
    * (text bytes standing in for encoded media).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "audio").otherwise("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
}
