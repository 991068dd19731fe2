package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group column RANGES keyed by a caller-supplied long —
  * `map<long, struct<min_key, max_key, min2, max2, min_lsn, max_lsn>>` —
  * the companion of [[FileStatsAgg]] on the data-file write pass.
  *
  * Purpose: manifest-level min/max FILE STATS (the engine's substitute for
  * the reference's secondary indexes, Scripts/database_schema.sql:165-169).
  * Keyed by `(write partition id, bucket)` like FileStatsAgg, it yields
  * every output file's key/LSN ranges the moment the write finishes, so
  * point and range reads can SKIP files without opening them — at 100 TB a
  * bucket is ~25 GB across many files, and manifest-level ranges prune to
  * the one file a conversation lives in before any parquet footer I/O.
  *
  * Ordering contract: `key` (the table's first merge key, cast to string
  * by the caller) is min/maxed in UTF8String BINARY order — the same
  * unsigned-byte order parquet uses for its binary column statistics — so
  * probe-side comparisons (LakeTable's pruning) are done in the same
  * space via `UTF8String.fromString`. `k2`/`lsn` are plain long ranges; a
  * null `k2` (table without a second integral key) leaves min2 > max2,
  * the "unknown" sentinel the manifest codec preserves.
  */
case class FileRangeAgg(
    key: Expression,
    keyStr: Expression,
    k2: Expression,
    lsn: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[FileRangeAgg.Buf]] {
  import FileRangeAgg.Buf

  override def children: Seq[Expression] = Seq(key, keyStr, k2, lsn)
  override def nullable: Boolean = false
  override def dataType: DataType = FileRangeAgg.resultType
  override def prettyName: String = "graft_file_ranges"

  override def createAggregationBuffer(): mutable.LongMap[Buf] = mutable.LongMap.empty

  override def update(buf: mutable.LongMap[Buf], input: InternalRow): mutable.LongMap[Buf] = {
    val kRaw = key.eval(input)
    if (kRaw != null) {
      val b = buf.getOrElseUpdate(kRaw.asInstanceOf[Long], new Buf)
      keyStr.eval(input) match {
        case s: UTF8String =>
          // UTF8String from an unsafe row points into a reused buffer —
          // clone before retaining across rows.
          if (b.minKey == null || s.binaryCompare(b.minKey) < 0) b.minKey = s.clone()
          if (b.maxKey == null || s.binaryCompare(b.maxKey) > 0) b.maxKey = s.clone()
        case _ => b.keyNulls = true
      }
      k2.eval(input) match {
        case x: java.lang.Long =>
          val v = x.longValue()
          if (v < b.min2) b.min2 = v
          if (v > b.max2) b.max2 = v
        case x: java.lang.Integer =>
          val v = x.longValue()
          if (v < b.min2) b.min2 = v
          if (v > b.max2) b.max2 = v
        case _ =>
      }
      lsn.eval(input) match {
        case x: java.lang.Long =>
          val v = x.longValue()
          if (v < b.minLsn) b.minLsn = v
          if (v > b.maxLsn) b.maxLsn = v
        case _ =>
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Buf], other: mutable.LongMap[Buf]): mutable.LongMap[Buf] = {
    other.foreach { case (k, o) =>
      val b = buf.getOrElseUpdate(k, new Buf)
      if (o.minKey != null && (b.minKey == null || o.minKey.binaryCompare(b.minKey) < 0)) b.minKey = o.minKey
      if (o.maxKey != null && (b.maxKey == null || o.maxKey.binaryCompare(b.maxKey) > 0)) b.maxKey = o.maxKey
      b.keyNulls |= o.keyNulls
      if (o.min2 < b.min2) b.min2 = o.min2
      if (o.max2 > b.max2) b.max2 = o.max2
      if (o.minLsn < b.minLsn) b.minLsn = o.minLsn
      if (o.maxLsn > b.maxLsn) b.maxLsn = o.maxLsn
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Buf]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, b) =>
      keys(i) = k
      // A group that saw any null key yields null min/max: a file whose
      // key column has nulls cannot be pruned by key range (the internal
      // write path never produces null keys, but the registry exposes the
      // function to arbitrary SQL).
      val mk = if (b.keyNulls) null else b.minKey
      val xk = if (b.keyNulls) null else b.maxKey
      vals(i) = new GenericInternalRow(Array[Any](mk, xk, b.min2, b.max2, b.minLsn, b.maxLsn))
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.LongMap[Buf]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    def writeStr(s: UTF8String): Unit =
      if (s == null) out.writeInt(-1)
      else { val b = s.getBytes; out.writeInt(b.length); out.write(b) }
    buf.foreach { case (k, b) =>
      out.writeLong(k)
      writeStr(b.minKey)
      writeStr(b.maxKey)
      out.writeBoolean(b.keyNulls)
      out.writeLong(b.min2); out.writeLong(b.max2)
      out.writeLong(b.minLsn); out.writeLong(b.maxLsn)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Buf] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Buf]
    def readStr(): UTF8String = {
      val len = in.readInt()
      if (len < 0) null
      else { val b = new Array[Byte](len); in.readFully(b); UTF8String.fromBytes(b) }
    }
    var i = 0
    while (i < n) {
      val k = in.readLong()
      val b = new Buf
      b.minKey = readStr(); b.maxKey = readStr()
      b.keyNulls = in.readBoolean()
      b.min2 = in.readLong(); b.max2 = in.readLong()
      b.minLsn = in.readLong(); b.maxLsn = in.readLong()
      buf.update(k, b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FileRangeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FileRangeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FileRangeAgg =
    copy(key = newChildren(0), keyStr = newChildren(1), k2 = newChildren(2), lsn = newChildren(3))
}

object FileRangeAgg {

  final class Buf {
    var minKey: UTF8String = null
    var maxKey: UTF8String = null
    var keyNulls: Boolean = false
    var min2: Long = Long.MaxValue
    var max2: Long = Long.MinValue
    var minLsn: Long = Long.MaxValue
    var maxLsn: Long = Long.MinValue
  }

  val resultType: DataType = MapType(
    LongType,
    StructType(Seq(
      StructField("min_key", StringType),
      StructField("max_key", StringType),
      StructField("min2", LongType, nullable = false),
      StructField("max2", LongType, nullable = false),
      StructField("min_lsn", LongType, nullable = false),
      StructField("max_lsn", LongType, nullable = false))),
    valueContainsNull = false)

  val fnName = "graft_file_ranges"

  /** Register + build a column, same route as [[FileStatsAgg.column]]. */
  def column(spark: SparkSession, key: Column, keyStr: Column, k2: Column, lsn: Column): Column = {
    val reg = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction(fnName,
        exprs => FileRangeAgg(exprs(0), exprs(1), exprs(2), exprs(3)).toAggregateExpression(), "built-in")
    call_function(fnName, key, keyStr, k2, lsn)
  }
}
