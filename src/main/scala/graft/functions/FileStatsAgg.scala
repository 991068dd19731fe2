package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact grouped (rows, live-rows) counts keyed by a caller-supplied long —
  * `map<long, array<long>[rows, live]>` — as a native Catalyst aggregate.
  *
  * Purpose: manifest FILE STATS FROM THE WRITE PASS ITSELF. Keyed by
  * `(write partition id, bucket)` and hung on the data-file write plan via
  * `Dataset.observe`, it yields every output file's row/live counts the
  * moment the write finishes — replacing the per-commit parquet-footer
  * read pass, which is O(files) SERIAL driver time on every epoch's
  * critical path (measured ~0.7 s/epoch at 64 buckets on local disk; on an
  * object store each footer open is a driver round-trip, so at 100 TB the
  * pass would dominate the commit). The footer path remains the fallback
  * (foreign files, speculative execution, stats/file mismatch).
  *
  * Why a custom `TypedImperativeAggregate` and not builtins: `observe`
  * admits no GROUP BY, and Spark has no exact `map_agg`. The group count
  * is bounded by `write tasks × buckets per task` (≤ a few thousand), so
  * the buffer stays tiny; update cost is one hash probe + two adds per
  * row. Not a UDF: no row-level serialization — inputs are read with
  * unsafe-row accessors and the buffer is a primitive-keyed map.
  */
case class FileStatsAgg(
    key: Expression,
    live: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Array[Long]]] {

  override def children: Seq[Expression] = Seq(key, live)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, ArrayType(LongType, containsNull = false), valueContainsNull = false)
  override def prettyName: String = "graft_file_stats"

  override def createAggregationBuffer(): mutable.LongMap[Array[Long]] =
    mutable.LongMap.empty

  override def update(buf: mutable.LongMap[Array[Long]], input: InternalRow): mutable.LongMap[Array[Long]] = {
    // Standard SQL aggregate null semantics: a null key row is ignored
    // (unguarded unboxing would silently count it toward key 0 — the
    // internal write-path inputs are non-null, but the registry exposes
    // graft_file_stats to arbitrary SQL), and a null live flag counts as
    // not-live.
    val kRaw = key.eval(input)
    if (kRaw != null) {
      val a = buf.getOrElseUpdate(kRaw.asInstanceOf[Long], Array(0L, 0L))
      a(0) += 1L
      val l = live.eval(input)
      if (l != null && l.asInstanceOf[Boolean]) a(1) += 1L
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Array[Long]], other: mutable.LongMap[Array[Long]]): mutable.LongMap[Array[Long]] = {
    other.foreach { case (k, v) =>
      val a = buf.getOrElseUpdate(k, Array(0L, 0L))
      a(0) += v(0)
      a(1) += v(1)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Array[Long]]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, v) =>
      keys(i) = k
      vals(i) = new GenericArrayData(Array(v(0), v(1)))
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.LongMap[Array[Long]]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      out.writeLong(k)
      out.writeLong(v(0))
      out.writeLong(v(1))
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Array[Long]]
    var i = 0
    while (i < n) {
      buf.update(in.readLong(), Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FileStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FileStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FileStatsAgg =
    copy(key = newChildren(0), live = newChildren(1))
}

object FileStatsAgg {
  val fnName = "graft_file_stats"

  /** Register in the session's function registry once, then build columns
    * with `call_function` — the public route to a custom aggregate column
    * (Column-from-Expression constructors are private[sql] in Spark 4).
    */
  def column(spark: SparkSession, key: Column, live: Column): Column = {
    val reg = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction(fnName,
        exprs => FileStatsAgg(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
    call_function(fnName, key, live)
  }
}
