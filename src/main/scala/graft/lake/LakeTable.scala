package graft.lake

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Model

/** One immutable data file of a snapshot. `bucket` is the hash-bucket of
  * `conv_id` the file belongs to (hidden partitioning); `schemaVer` is the
  * writer schema version recorded so old files can be conformed (cast /
  * null-filled) to the current table schema on read. `kind` distinguishes
  * copy-on-write `base` files (≤1 version per key per bucket across all
  * base files) from merge-on-read `delta` files (appended row versions the
  * read path resolves by max `_lsn` per key until compaction folds them).
  */
final case class FileEntry(path: String, bucket: Int, schemaVer: Int, rows: Long,
    live: Long = -1L, kind: String = FileEntry.Base, stats: Option[FileStats] = None)

object FileEntry {
  val Base = "base"
  val Delta = "delta"
}

/** Manifest-level column ranges of one data file — the engine's substitute
  * for the reference's secondary indexes (SURVEY §4; reference:
  * Scripts/database_schema.sql:165-169): point/range reads skip files whose
  * ranges cannot contain the probe, without opening a single footer.
  *
  *   - `minKey`/`maxKey`: first merge key (conv_id), compared in UTF8
  *     BINARY order on both the write side ([[graft.functions.FileRangeAgg]])
  *     and the probe side — the same unsigned-byte order parquet binary
  *     stats use. Null ⟺ unknown (a file with null keys, or a legacy
  *     footer without stats) — such a file is never skipped.
  *   - `min2`/`max2`: second merge key (turn_idx) when integral; the
  *     "unknown" sentinel is min2 > max2.
  *   - `minLsn`/`maxLsn`: `_lsn` range, same sentinel — lets maintenance
  *     and changelog consumers reason about a file's change window.
  *
  * Absent entirely (`stats = None`, manifests written before the field
  * existed) ⟹ no skipping: version-tolerant by construction.
  */
final case class FileStats(minKey: String, maxKey: String,
    min2: Long, max2: Long, minLsn: Long, maxLsn: Long) {
  def hasKeyRange: Boolean = minKey != null && maxKey != null
  def has2: Boolean = min2 <= max2
  def hasLsn: Boolean = minLsn <= maxLsn
}

/** A committed table snapshot. The table's commit protocol gives the
  * load-bearing subset of Iceberg semantics the north rule needs, built
  * from scratch (no lake-format jars exist in this sandbox):
  *
  *   - atomic snapshot commits (tmp-write + atomic rename of `_current`)
  *   - time-travelable snapshot ids (`snap-NNN.json` manifests kept)
  *   - schema-evolution metadata (`schemaVer` against a versioned registry)
  *   - exactly-once fencing (`epochId`; re-commit of an epoch is a no-op)
  *   - snapshot expiry + orphan-file GC
  *
  * Reference analog: content-hash `batch_id` + PK-enforced idempotent
  * loads (reference: Scripts/database_schema.sql:211,
  * Docs/etl_requirements_reviewed_by_sr.md:162-165).
  */
/** @param writerId identity of the stream that committed `epochId` —
  *                  epoch fencing is scoped PER WRITER, so a stream
  *                  restarted with a fresh checkpoint (epochIds restart at
  *                  0) re-applies instead of being silently fenced (the
  *                  merge is row-level idempotent under LWW, so re-apply is
  *                  safe; silent fencing would be data loss)
  * @param inputEvents / dedupedKeys / mergeMs — the committing batch's
  *                  stats, persisted IN the manifest so per-epoch metrics
  *                  can be re-derived idempotently after a crash between
  *                  commit and metrics write (exactly-once observability)
  * @param writerEpochs per-writer applied-epoch high-watermark. The single
  *                  (writerId, epochId) pair forgets writer A's watermark
  *                  the moment writer B commits; the map keeps every
  *                  writer's fence alive, so interleaved / hand-over
  *                  writers cannot replay each other's window. Epochs per
  *                  writer are monotonic (Structured Streaming retries an
  *                  epoch, never skips one), so a watermark IS the full
  *                  applied set.
  * @param batchHashes content hashes of recently applied batches, for
  *                  merge kernels that are NOT idempotent under re-apply
  *                  (ADD-merge stats, SCD2 close-out+insert): a fresh
  *                  checkpoint restarts epochs at 0 under a NEW writerId,
  *                  so the epoch fence alone would re-apply — the content
  *                  hash catches the re-delivered batch (reference analog:
  *                  content-hash `batch_id` idempotent loads,
  *                  Docs/etl_requirements_reviewed_by_sr.md:162-165).
  *                  FIFO-capped: the redelivery window after a checkpoint
  *                  swap is bounded, so only recent hashes matter.
  * @param touched  buckets this commit replaced or appended to — the
  *                  commit's WRITE SET, persisted so a concurrent committer
  *                  rebasing over this snapshot can detect write-set
  *                  overlap (serializable conflict check). None on
  *                  manifests written before the field existed: an unknown
  *                  write set conflicts with everything (fail loud, never
  *                  lose a commit).
  * @param groupRefs SHARDED manifest format (tables with more buckets than
  *                  [[LakeTable.shardBucketThreshold]]): the snapshot JSON
  *                  carries references to per-bucket-group manifest files
  *                  instead of the inline `files` array — Iceberg's
  *                  manifest-list shape. A commit rewrites only the groups
  *                  its buckets fall in and REUSES the parent's refs for
  *                  the rest, so both the snapshot JSON and the per-commit
  *                  metadata write volume are O(buckets touched), not
  *                  O(table). `files` is always the fully resolved list in
  *                  memory (loaded from the refs at read time); empty
  *                  `groupRefs` means the inline format.
  */
final case class Snapshot(
    id: Long,
    parent: Long,
    epochId: Long,
    schemaVer: Int,
    numBuckets: Int,
    rows: Long,
    maxLsn: Long,
    files: Seq[FileEntry],
    writerId: String = "",
    inputEvents: Long = -1L,
    dedupedKeys: Long = -1L,
    mergeMs: Long = -1L,
    writerEpochs: Map[String, Long] = Map.empty,
    batchHashes: Seq[Long] = Nil,
    touched: Option[Seq[Int]] = None,
    groupRefs: Seq[GroupRef] = Nil,
    // true ⟺ a maintenance commit (compaction, expiry plumbing): its
    // epochId/writerId/batch stats are CARRIED FORWARD from the last epoch
    // commit, not its own — readers re-deriving an epoch's stats (the
    // crash-window metrics replay) must walk past maint snapshots to the
    // epoch commit itself, or they attribute the wrong snapshot id/rows.
    maint: Boolean = false)

/** Reference to one bucket-group manifest file (sharded format): `g` is
  * the group index (`bucket / groupSize`), `path` the manifest's file name
  * under `_meta` (relative, so a table survives being moved), `n` its file
  * count (for cheap accounting without opening it).
  */
final case class GroupRef(g: Int, path: String, n: Int)

/** Result of a commit attempt: either applied (new snapshot) or fenced
  * (this epoch was already committed — idempotent replay no-op).
  */
final case class CommitResult(snapshot: Snapshot, applied: Boolean)

/** Thrown when a commit cannot be applied without losing a concurrent
  * committer's rows (write-set overlap with a missed commit), or when the
  * snapshot-claim race cannot be resolved within the retry/wait budget.
  * Loud failure is the contract: the caller re-reads current state and
  * re-derives its files; nothing is ever silently dropped.
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** A minimal snapshot-committed Parquet table ("lake table"), the target
  * of the CDC merge-apply engine.
  *
  * Layout (all under `root`):
  * {{{
  *   _meta/_current          // name of the current snapshot manifest
  *   _meta/snap-<id>.json    // immutable manifest per snapshot
  *   data/c<id>-<salt>/_bucket=<n>/part-*.parquet
  * }}}
  *
  * Scale notes (designed for a 1000-executor cluster / 100 TB table,
  * tested at local[32]):
  *   - Data is hidden-partitioned by `bucket = pmod(xxhash64(conv_id), B)`
  *     so a micro-batch's copy-on-write rewrites only touched buckets,
  *     bounding write amplification on hot conversations; B is sized at
  *     table creation (tests use 16-64, a 100 TB table would use 4096+)
  *     and evolved later with [[rebucket]] when the table outgrows it.
  *   - Tables up to [[LakeTable.shardBucketThreshold]] buckets keep file
  *     entries inline in one JSON per snapshot; larger tables use the
  *     SHARDED format (Iceberg manifest-list shape): per-bucket-group
  *     manifest files referenced from the snapshot, rewritten only for
  *     the groups a commit touches — snapshot JSON and per-commit
  *     metadata writes stay O(buckets touched) regardless of table size.
  *   - Commits are metadata-only renames — O(1) regardless of data size.
  *   - All paths go through Hadoop `FileSystem`, so `root` may be file://,
  *     hdfs://, etc. `_current` swap uses `FileContext.rename(OVERWRITE)`,
  *     which is atomic on HDFS and POSIX; object stores would swap in a
  *     real catalog (documented limitation, matching Iceberg's own
  *     HadoopCatalog caveat).
  *
  * Multi-writer safety: commits are optimistic-concurrency. A committer
  * CLAIMS its snapshot id by create-exclusive manifest write — two
  * committers racing for `snap-N` cannot both win; the loser waits for
  * `_current` to advance, re-validates its write set (bucket overlap
  * against the commits it missed, tracked via each snapshot's persisted
  * `touched` set) and retries on the new parent, or fails LOUDLY with
  * [[CommitConflictException]] when the write sets overlap — never a
  * silently lost snapshot. This covers the real deployment shape the
  * single-writer design left open: a CDC stream plus an out-of-band
  * maintenance job (compaction) committing from a second driver.
  * Append-only commits (merge-on-read deltas, `replacedBuckets` empty)
  * rebase unconditionally, like Iceberg appends. Within one JVM, commits
  * on the same instance additionally serialize on the instance lock.
  */
/** @param registry versioned schema registry of the table's PUBLIC schema
  *                  (defaults to the transcript registry — the engine's
  *                  primary table; stats/history tables pass their own)
  * @param keyCols   merge key; `keyCols.head` drives hash-bucketing, the
  *                  full key drives within-file sort order
  * @param renames   RENAME evolution steps of the registry: `renames(N)`
  *                  maps `oldName -> newName` for columns renamed going
  *                  from version N-1 to N. Read-side conformance resolves
  *                  a target column back through the chain to the name it
  *                  had at each file's writer version, so files written
  *                  before the rename read under the new name with their
  *                  data intact — no rewrite (reference analog: the
  *                  metadata-regenerated MERGE absorbing column DDL,
  *                  Scripts/ETL_Framework_Implementation.sql:336-399).
  *                  DROPPED columns need no entry: a version that omits a
  *                  column projects it away on read automatically. Merge
  *                  keys must never be renamed (bucketing/sort identity).
  */
final class LakeTable(
    val spark: SparkSession,
    val root: String,
    val registry: Map[Int, StructType] = Model.schemaRegistry,
    val keyCols: Seq[String] = Model.keyCols,
    val renames: Map[Int, Map[String, String]] = Map.empty) {
  import LakeTable._

  require(!renames.valuesIterator.flatten.exists { case (o, n) =>
    keyCols.contains(o) || keyCols.contains(n) },
    s"merge key columns cannot be renamed: $renames vs key $keyCols")

  private val rootPath = new Path(root)
  /** One Hadoop conf per table: `newHadoopConf()` deep-copies the whole
    * SparkConf + Hadoop default resources on EVERY call (~100 ms) — built
    * fresh it was the dominant cost of the per-commit file listing. The
    * conf is only read here (filesystem resolution), never mutated.
    */
  private lazy val hadoopConf = spark.sessionState.newHadoopConf()
  private def fs: FileSystem = rootPath.getFileSystem(hadoopConf)
  private def metaDir = new Path(rootPath, "_meta")
  private def currentPtr = new Path(metaDir, "_current")
  private def snapPath(id: Long) = new Path(metaDir, f"snap-$id%010d.json")

  /** Internal columns persisted alongside the public schema. `_lsn` is the
    * LSN of the winning write for the row (cross-batch last-writer-wins
    * needs it when events arrive out of order across micro-batches);
    * `_deleted` marks a tombstone (needed so a late lower-LSN update
    * cannot resurrect a deleted key).
    */
  def internalCols: Seq[StructField] = LakeTable.internalCols

  // ---- metadata ----

  def current: Snapshot = {
    val name = currentName()
    // Bounded retry on manifest not-found: the pointer exists, so a
    // missing target is the swap window (or a racing expiry) — transient
    // by construction. HDFS/POSIX renames are atomic, but Hadoop's
    // local-FS FileContext rename(OVERWRITE) deletes the destination
    // before renaming — a concurrent reader can land in that window.
    // swapCurrent uses NIO ATOMIC_MOVE on file:// so the window is closed
    // there; the retry covers any other FS with the same flaw.
    var lastErr: java.io.FileNotFoundException = null
    var i = 0
    while (i < 40) {
      val nm = if (i == 0) name else currentName()
      try return readManifest(fs, new Path(metaDir, nm))
      catch {
        case e: java.io.FileNotFoundException => lastErr = e; sleepInterruptibly(10)
      }
      i += 1
    }
    throw lastErr
  }

  /** Current snapshot id from the pointer alone — no manifest read, no
    * group resolution. The claim-race poll compares only ids, so polling
    * the FULL snapshot (up to 64 group-manifest round trips on a sharded
    * table, every 25 ms) would turn the wait into a metadata storm.
    */
  def currentId: Long =
    currentName().stripPrefix("snap-").stripSuffix(".json").toLong

  /** Read the `_current` pointer with a SHORT retry: a missing pointer is
    * either a table that does not exist (fail fast, clear message) or the
    * sub-10ms rename window of a flawed FS (retry a few times).
    */
  private def currentName(): String = {
    var i = 0
    var lastErr: java.io.FileNotFoundException = null
    while (i < 5) {
      try return readString(fs, currentPtr).trim
      catch {
        case e: java.io.FileNotFoundException => lastErr = e; sleepInterruptibly(10)
      }
      i += 1
    }
    throw new java.io.FileNotFoundException(
      s"no lake table at $root (missing ${currentPtr}): ${lastErr.getMessage}")
  }

  def snapshotIds: Seq[Long] = {
    val st = fs.listStatus(metaDir)
    st.map(_.getPath.getName).filter(_.startsWith("snap-"))
      .map(n => n.stripPrefix("snap-").stripSuffix(".json").toLong).sorted.toSeq
  }

  def snapshot(id: Long): Snapshot = readManifest(fs, snapPath(id))

  /** Physical parquet schema of files written at `ver` (public + internal). */
  def physicalSchema(ver: Int): StructType =
    StructType(registry(ver).fields ++ internalCols)

  /** Snapshot history as a DataFrame — the operational metadata surface
    * (Iceberg's `.history`/`.snapshots` shape): one row per RETAINED
    * snapshot with commit lineage, writer identity, schema/bucket layout,
    * row accounting and the commit instant (manifest mtime — the claim
    * instant, same clock [[expireSnapshots]]' age-based retention uses).
    * Driver-side metadata only, bounded by retention: expireSnapshots
    * caps how many manifests exist, so this never scans data.
    */
  def history: DataFrame = {
    import spark.implicits._
    snapshotIds.map { id =>
      val mtime = fs.getFileStatus(snapPath(id)).getModificationTime
      val s = snapshot(id)
      (s.id, s.parent, s.epochId, s.writerId, s.schemaVer, s.numBuckets,
        s.rows, s.maxLsn, s.maint, s.files.size.toLong, new java.sql.Timestamp(mtime))
    }.toDF("snapshot_id", "parent_id", "epoch_id", "writer_id", "schema_ver",
      "num_buckets", "rows", "max_lsn", "is_maintenance", "num_files", "committed_at")
  }

  // ---- read path ----

  /** Public read: current schema, live rows only, internal cols dropped.
    * Delta-carrying buckets (merge-on-read) are LWW-resolved per key; pure
    * base buckets pass through with no shuffle.
    */
  def read(): DataFrame = readPublic(current)

  /** Time-travel read: the table AS OF `snapshotId` — same public shape
    * as [[read]] (live rows only, internal columns dropped, that
    * snapshot's schema version). Any kept snapshot id works (commits,
    * maintenance, pre-compaction states); bounded by retention —
    * [[expireSnapshots]] must still keep the snapshot and its files, the
    * same contract [[readChangesSince]]'s `from` side carries.
    */
  def readAt(snapshotId: Long): DataFrame = readPublic(snapshot(snapshotId))

  private def readPublic(snap: Snapshot): DataFrame =
    readResolved(snap, None)
      .filter(!col("_deleted"))
      .select(registry(snap.schemaVer).fieldNames.map(col).toSeq: _*)

  /** Internal read (merge path): ALL stored row versions incl. tombstones +
    * `_lsn`/`_deleted`, restricted to `buckets` when given (copy-on-write
    * reads only touched buckets). Old-schema files are conformed: missing
    * columns null-filled, widened types cast up — the explicit read-side
    * evolution the registry promises (int32→int64 `turn_idx`, added
    * `tool`). NOTE: a bucket with merge-on-read delta files yields multiple
    * versions per key here; consumers either resolve themselves (the merge
    * kernel's max_by subsumes it) or call [[readResolved]].
    */
  def readConformed(snap: Snapshot, buckets: Option[Set[Int]]): DataFrame = {
    val wanted = buckets match {
      case Some(bs) => snap.files.filter(f => bs.contains(f.bucket))
      case None => snap.files
    }
    readFiles(wanted, snap.schemaVer)
  }

  /** One LWW-resolved row per key (tombstone winners kept): the
    * merge-on-read read path. Only buckets that actually carry delta files
    * pay the resolve shuffle — base-only buckets are unioned through
    * untouched, so a fully-compacted (or pure copy-on-write) table reads
    * with zero extra exchanges.
    */
  def readResolved(snap: Snapshot, buckets: Option[Set[Int]]): DataFrame = {
    val wanted = buckets match {
      case Some(bs) => snap.files.filter(f => bs.contains(f.bucket))
      case None => snap.files
    }
    resolveWanted(wanted, snap.schemaVer, None)
  }

  /** LWW-resolve an explicit file set, optionally pre-filtered by a
    * KEY-ONLY predicate. The predicate is applied BELOW the resolve
    * groupBy — legal exactly because it references only merge-key columns
    * (every stored version of a key passes or fails together, so the
    * per-key max-LSN winner is unchanged), and load-bearing for point
    * reads: the filter reaches the parquet scan, so row-group stats prune
    * within the files manifest-level skipping kept.
    */
  private def resolveWanted(wanted: Seq[FileEntry], schemaVer: Int,
      keyPred: Option[org.apache.spark.sql.Column]): DataFrame = {
    def scan(fes: Seq[FileEntry]): DataFrame = {
      val df = readFiles(fes, schemaVer)
      keyPred.map(df.filter).getOrElse(df)
    }
    val deltaBuckets = wanted.filter(_.kind == FileEntry.Delta).map(_.bucket).toSet
    if (deltaBuckets.isEmpty) return scan(wanted)
    val (multi, pure) = wanted.partition(f => deltaBuckets.contains(f.bucket))
    val cols = physicalSchema(schemaVer).fieldNames.toSeq
    val resolved = scan(multi)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), col("_lsn")).as("r"))
      .select(col("r.*"))
    if (pure.isEmpty) resolved
    else resolved.unionByName(scan(pure))
  }

  // ---- stats-pruned point / range reads ----

  /** Files of the CURRENT snapshot that can contain `keyCols.head = key`:
    * bucket pruning (the key's hash bucket) + manifest min/max skipping.
    * Exposed so tests (and operators) can assert how many files a point
    * read opens without driving a Spark job.
    */
  def filesForKey(key: String): Seq[FileEntry] = filesForKey(current, key)

  def filesForKey(snap: Snapshot, key: String): Seq[FileEntry] = {
    // String-key guard, same as readKeyRange: bucketOfKey hashes the
    // STRING form, but the write side bucketed on the native column — on
    // a long-keyed table (e.g. the materialized pair table) the two
    // hashes disagree and a point read would prune to the wrong bucket
    // and silently return empty. Fail loudly instead.
    require(registry(snap.schemaVer)(keyCols.head).dataType == StringType,
      s"readKey/filesForKey hash the string form of the key; " +
        s"key column ${keyCols.head} is not a string")
    val b = bucketOfKey(key, snap.numBuckets)
    val k = org.apache.spark.unsafe.types.UTF8String.fromString(key)
    snap.files.filter(f => f.bucket == b && mayContainKey(f, k))
  }

  /** Point lookup: all live turns of one conversation, public shape. Scale
    * shape at 100 TB: one bucket of ~B⁻¹ of the table, then manifest
    * min/max skipping to the files whose key range covers `key` — no
    * footer opens, no shuffle on a compacted table, and the equality
    * predicate reaches the parquet scan for row-group pruning within the
    * kept files.
    */
  def readKey(key: String): DataFrame = {
    val snap = current
    val wanted = filesForKey(snap, key)
    resolveWanted(wanted, snap.schemaVer, Some(col(keyCols.head) === lit(key)))
      .filter(!col("_deleted"))
      .select(registry(snap.schemaVer).fieldNames.map(col).toSeq: _*)
  }

  /** Range read over the FIRST merge key (inclusive bounds, binary string
    * order — the key must be a string column): every bucket can hold keys
    * of the range under hash bucketing, so pruning is purely manifest
    * min/max overlap per file. Files without stats are read (never
    * skipped), so legacy manifests stay correct, just unpruned.
    */
  def readKeyRange(lower: String, upper: String): DataFrame = {
    val snap = current
    require(registry(snap.schemaVer)(keyCols.head).dataType == StringType,
      s"readKeyRange prunes in string order; key column ${keyCols.head} is not a string")
    val lo = org.apache.spark.unsafe.types.UTF8String.fromString(lower)
    val hi = org.apache.spark.unsafe.types.UTF8String.fromString(upper)
    val wanted = snap.files.filter(f => mayOverlapKeyRange(f, lo, hi))
    resolveWanted(wanted, snap.schemaVer,
      Some(col(keyCols.head) >= lit(lower) && col(keyCols.head) <= lit(upper)))
      .filter(!col("_deleted"))
      .select(registry(snap.schemaVer).fieldNames.map(col).toSeq: _*)
  }

  /** Buckets whose FILE SETS differ between two snapshots — the pruning
    * unit for [[readChangesSince]]: identical file sets imply identical
    * rows, so an untouched bucket never enters the diff. Compaction makes
    * a bucket eligible without changing its rows; the diff's anti-join
    * drops those rows, so eligibility over-approximation costs read I/O,
    * never correctness.
    */
  def changedBuckets(from: Snapshot, to: Snapshot): Set[Int] = {
    val f = from.files.groupBy(_.bucket).map { case (b, fs) => b -> fs.map(_.path).toSet }
    val t = to.files.groupBy(_.bucket).map { case (b, fs) => b -> fs.map(_.path).toSet }
    (f.keySet ++ t.keySet)
      .filter(b => f.getOrElse(b, Set.empty) != t.getOrElse(b, Set.empty))
  }

  /** Net row-level changes in `(from, to]` — the CDC-OUT face of the table
    * (Iceberg-style incremental changelog read): one row per key whose LWW
    * winner DIFFERS between the two snapshots, carrying the winner's
    * payload at `to` plus `change_type` — `DELETE` for a tombstone winner
    * (null payload, matching the merge kernel's tombstone normalization)
    * or `UPSERT`. A downstream consumer that applies these rows to its
    * copy of snapshot `from` reaches snapshot `to` exactly; consuming
    * every commit's window replays the table as a change stream.
    *
    * Exactness: the diff compares `to`-winners against `from`-winners by
    * winning `_lsn` per key — NOT an LSN high-watermark filter. A watermark misses
    * the late-arrival case the generator's bounded inversions produce: an
    * event with an OLD LSN that still wins its key (the key had nothing
    * newer) changes the table while staying under `from.maxLsn`. Keys
    * present in `from` but ABSENT from `to` (possible only when compaction
    * dropped their tombstone inside the window) are emitted as `DELETE`
    * with null payload, so the consumer still sees the kill; the proper
    * retention contract remains `dropTombstonesBelowLsn` ≤ the oldest LSN
    * any incremental consumer still needs (Iceberg's own rule that delete
    * files outlive incremental readers).
    *
    * Scale shape: reads only [[changedBuckets]] at BOTH snapshots, ONCE
    * each; the `from` side carries only (key, `_lsn`, `_deleted`) into one
    * full-outer join, so the diff costs one scan per side plus one
    * co-keyed shuffle — per-epoch
    * windows on a bucketed 100 TB table touch a few buckets, not the
    * table. Retention: `from`'s manifest and data files must still exist
    * (run [[expireSnapshots]] with `keepLast` covering the oldest
    * consumer).
    */
  def readChangesSince(fromSnapshotId: Long, toSnapshotId: Long = -1L): DataFrame = {
    val to = if (toSnapshotId < 0) current else snapshot(toSnapshotId)
    val from = snapshot(fromSnapshotId)
    require(from.numBuckets == to.numBuckets,
      s"bucket count changed between snapshots: ${from.numBuckets} -> ${to.numBuckets}")
    require(from.id <= to.id,
      s"changes window is forward-only: from snapshot ${from.id} > to ${to.id} " +
        "(an undo diff would invert the vanished-key DELETE semantics silently)")
    val bs = changedBuckets(from, to)
    // ONE full-outer join on the key carries all three cases in a single
    // pass over each side (one scan each, one co-keyed shuffle — a
    // separate reverse anti-join for the vanished case would scan both
    // sides twice): the `from` side contributes only (key, _lsn, _deleted)
    //   - to-winner with a different (or no) from-lsn  → UPSERT / DELETE
    //   - same (key, lsn) on both sides               → unchanged, dropped
    //   - from-key with NO to-row (tombstone GC'd mid-window) → DELETE
    //     with null payload, but only if LIVE at `from` — a key already
    //     dead there was already dead to the consumer
    val fromSide = readResolved(from, Some(bs))
      .select(keyCols.map(col) :+ col("_lsn").as("_from_lsn") :+
        col("_deleted").as("_from_deleted"): _*)
    val publicCols = registry(to.schemaVer).fieldNames.toSeq
    readResolved(to, Some(bs))
      .join(fromSide, keyCols, "full_outer")
      .filter(
        (col("_lsn").isNotNull &&
          (col("_from_lsn").isNull || col("_from_lsn") =!= col("_lsn"))) ||
        (col("_lsn").isNull && !col("_from_deleted")))
      .withColumn("change_type",
        when(col("_lsn").isNull || col("_deleted"), lit("DELETE"))
          .otherwise(lit("UPSERT")))
      .select(publicCols.map(col) :+ col("change_type"): _*)
  }

  private def readFiles(wanted: Seq[FileEntry], targetVer: Int): DataFrame = {
    val target = physicalSchema(targetVer)
    val groups = wanted.groupBy(_.schemaVer)
    val parts = groups.toSeq.sortBy(_._1).map { case (ver, fes) =>
      val physical = physicalSchema(ver)
      val df = spark.read.schema(physical).parquet(fes.map(_.path): _*)
      conformVersioned(df, ver, targetVer)
    }
    if (parts.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    else parts.reduce(_ unionByName _)
  }

  // ---- rename-aware version conformance ----

  /** The name a column (known as `name` at `toVer`) carried at `fromVer`:
    * the rename steps walked backward. A column added after `fromVer`
    * resolves to a name absent from the old schema — the caller
    * null-fills, same as the add-column case.
    */
  private def nameAt(name: String, fromVer: Int, toVer: Int): String = {
    var n = name
    var v = toVer
    while (v > fromVer) {
      renames.get(v).foreach(_.find(_._2 == n).foreach { case (old, _) => n = old })
      v -= 1
    }
    n
  }

  /** All names a column (known as `name` at `ver`) has ever carried,
    * newest first — the alias set the merge path probes when an OLD
    * producer still emits a pre-rename wire column.
    */
  private[graft] def historicalNames(name: String, ver: Int): Seq[String] = {
    val buf = mutable.ArrayBuffer(name)
    var n = name
    var v = ver
    while (v > 1) {
      renames.get(v).foreach(_.find(_._2 == n).foreach { case (old, _) =>
        n = old
        buf += old
      })
      v -= 1
    }
    buf.toSeq
  }

  /** Cast/null-fill/RENAME-map `df` (physical schema of `fromVer`) up to
    * `toVer`'s physical schema: the version-aware form of
    * [[LakeTable.conform]]. Renamed columns read their old-name data;
    * added columns null-fill; dropped columns are projected away (not
    * selected); widened types cast up.
    */
  private[graft] def conformVersioned(df: DataFrame, fromVer: Int, toVer: Int): DataFrame = {
    val have = physicalSchema(fromVer).fieldNames.toSet
    df.select(physicalSchema(toVer).fields.toSeq.map { f =>
      val src = nameAt(f.name, fromVer, toVer)
      if (have.contains(src)) col(src).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  // ---- commit protocol ----

  /** Atomically commit a new snapshot that replaces all files of
    * `replacedBuckets` with `newFiles` and (possibly) advances the schema
    * version. If `epochId >= 0` and the current snapshot has already
    * committed this epoch or a later one, the commit is fenced: nothing is
    * written and the existing snapshot is returned (`applied = false`) —
    * this is the exactly-once guarantee under foreachBatch replay.
    *
    * Concurrency: the snapshot id is CLAIMED by create-exclusive manifest
    * write, so two committers (separate drivers — e.g. the CDC stream plus
    * an out-of-band compaction) cannot both win `snap-N`. The loser waits
    * for `_current` to advance and retries on the new parent — but only
    * after validating that none of the commits it missed touched its own
    * write set. `baseSnapshotId` is the snapshot the CALLER derived
    * `newFiles` from (its read set); when commits landed since, and any of
    * them replaced one of our buckets, retrying would silently drop those
    * rows — so the commit throws [[CommitConflictException]] instead (the
    * caller re-reads and re-derives). Append-only commits
    * (`replacedBuckets` empty) rebase unconditionally, like Iceberg
    * appends, WHEN their files derive only from batch input, never from
    * table state; an append whose CONTENT was derived from a read of the
    * table (a merge-mode gate probing live keys under merge-on-read)
    * passes those read buckets as `derivedBuckets` so the same
    * serializable check covers its read set.
    */
  def commit(
      newFiles: Seq[FileEntry],
      replacedBuckets: Set[Int],
      epochId: Long,
      schemaVer: Int,
      rowDelta: Long,
      maxLsnSeen: Long,
      writerId: String = "",
      inputEvents: Long = -1L,
      dedupedKeys: Long = -1L,
      mergeMs: Long = -1L,
      batchHash: Option[Long] = None,
      baseSnapshotId: Long = -1L,
      derivedBuckets: Set[Int] = Set.empty,
      // Set ONLY by [[rebucket]]: the commit re-routes every row, so
      // `newFiles` carry NEW-layout bucket ids and the snapshot records
      // the new count (replacedBuckets still names OLD-layout buckets).
      newNumBuckets: Option[Int] = None): CommitResult = synchronized {
    var attempt = 0
    while (attempt <= maxCommitRetries) {
      val cur = current
      if (fenced(cur, epochId, writerId)) return CommitResult(cur, applied = false)
      // The content-hash fence exists for exactly ONE window: a stream
      // restarted with a fresh checkpoint (new writerId, epochs back at 0)
      // re-delivering batches the previous writer already applied. For an
      // ESTABLISHED writer the per-writer epoch fence already covers
      // redelivery, so consulting the hash there can only produce false
      // positives — two genuinely distinct batches with identical content
      // (plausible for the ADD-merge stats kernel, where two observation
      // batches can yield identical per-group deltas) would be silently
      // dropped. Scope the check to writers with no watermark yet, and log
      // when it fires so a hash-fenced commit is observable, never silent.
      if (batchHash.exists(cur.batchHashes.contains) && !establishedWriter(cur, writerId)) {
        System.err.println(s"[lake] content-hash fence: writer '$writerId' epoch $epochId " +
          s"re-delivered an already-applied batch (hash ${batchHash.get}) — commit skipped")
        return CommitResult(cur, applied = false)
      }
      // The hash window is FIFO-capped: a checkpoint-swap redelivery
      // backlog longer than maxBatchHashes would re-apply its evicted
      // prefix undetected (double-applied ADD-merge stats, no error). The
      // cap is an assumption, not an enforcement — so when an
      // unestablished writer commits a hash-fenced batch while the window
      // is saturated, say so loudly: the operator must size the cap to
      // the source's retained backlog.
      if (batchHash.isDefined && !establishedWriter(cur, writerId) &&
        cur.batchHashes.size >= maxBatchHashes)
        System.err.println(s"[lake] content-hash window SATURATED ($maxBatchHashes) while " +
          s"unestablished writer '$writerId' commits epoch $epochId: a redelivery older " +
          "than the window would double-apply undetected — ensure maxBatchHashes covers " +
          "the source's retained backlog")
      // Layout check FIRST, and for EVERY commit that moved — including
      // append-only (merge-on-read) commits, which otherwise rebase
      // unconditionally: `newFiles` bucket ids were computed with the BASE
      // snapshot's bucket transform, so if a rebucket landed in between,
      // registering them would plant old-layout ids in a new-layout
      // snapshot and bucket-pruned reads would silently miss those rows.
      // An unreadable (expired) base conflicts too: a commit derived from
      // a snapshot that retention already dropped cannot prove its layout.
      if (baseSnapshotId >= 0 && cur.id != baseSnapshotId) {
        val baseNb =
          try LakeTable.parseManifest(readString(fs, snapPath(baseSnapshotId))).numBuckets
          catch { case scala.util.control.NonFatal(_) => -1 }
        if (baseNb != cur.numBuckets)
          throw new CommitConflictException(
            s"commit by writer '$writerId' at $root derived its files from snapshot " +
              s"$baseSnapshotId (numBuckets=$baseNb) but the table is now at " +
              s"numBuckets=${cur.numBuckets} — bucket layout changed (or the base " +
              "expired); re-read and re-derive")
      }
      // Serializable check for commits whose content depends on table
      // state: if the table moved past the snapshot we derived from, every
      // missed commit must be write-set-disjoint from our write set (blind
      // file replacement would drop its rows) AND from our read set (a
      // merge-mode gate probed liveness there — e.g. InsertOnly admitted a
      // key another writer has since made live).
      val dependsOn = replacedBuckets ++ derivedBuckets
      if (dependsOn.nonEmpty && baseSnapshotId >= 0 && cur.id != baseSnapshotId)
        validateDisjointSince(baseSnapshotId, cur, dependsOn, writerId)
      val kept = cur.files.filterNot(f => replacedBuckets.contains(f.bucket))
      val allFiles = kept ++ newFiles
      // Live-row count is exact from manifest stats while the one-version-
      // per-key invariant holds (no unresolved delta files). With deltas
      // pending it is UNKNOWN (-1) until compaction folds them — a delta row
      // may shadow a base row, so summing would double-count; Iceberg's MoR
      // record_count has the same caveat.
      val rows =
        if (allFiles.exists(_.kind == FileEntry.Delta)) -1L
        else if (allFiles.forall(_.live >= 0L)) allFiles.map(_.live).sum
        else cur.rows + rowDelta
      val nb = newNumBuckets.getOrElse(cur.numBuckets)
      val snap = Snapshot(
        id = cur.id + 1,
        parent = cur.id,
        epochId = if (epochId >= 0) epochId else cur.epochId,
        schemaVer = math.max(schemaVer, cur.schemaVer),
        numBuckets = nb,
        rows = rows,
        maxLsn = math.max(maxLsnSeen, cur.maxLsn),
        files = allFiles,
        writerId = if (epochId >= 0) writerId else cur.writerId,
        // Maintenance commits (epochId < 0: compaction, view refresh
        // plumbing) carry the last EPOCH commit's batch stats forward,
        // same as epochId/writerId above — overwriting them with the
        // maintenance defaults (-1) would break the crash-window
        // metrics replay, which re-derives a lost epoch's rows from
        // exactly these fields (CdcStream observability path).
        inputEvents = if (epochId >= 0) inputEvents else cur.inputEvents,
        dedupedKeys = if (epochId >= 0) dedupedKeys else cur.dedupedKeys,
        mergeMs = if (epochId >= 0) mergeMs else cur.mergeMs,
        writerEpochs =
          if (epochId >= 0)
            cur.writerEpochs.updated(writerId,
              math.max(epochId, cur.writerEpochs.getOrElse(writerId, -1L)))
          else cur.writerEpochs,
        batchHashes = (cur.batchHashes ++ batchHash).takeRight(maxBatchHashes),
        maint = epochId < 0,
        touched = Some((replacedBuckets ++ newFiles.map(_.bucket)).toSeq.distinct.sorted),
        groupRefs =
          if (!sharded(nb)) Nil
          else shardGroupRefs(cur, allFiles, replacedBuckets, newFiles, nb))
      if (writeStringExclusive(fs, snapPath(snap.id), manifestJson(snap))) {
        swapCurrent(snap.id)
        return CommitResult(snap, applied = true)
      }
      // Claim lost: another committer owns snap-(cur.id+1). Wait for its
      // `_current` swap to land, then loop (re-fence, re-validate, re-id).
      // Jittered exponential backoff breaks claim lockstep: without it two
      // steady committers re-synchronize on every swap and re-race for
      // each next id, and one can lose every round.
      attempt += 1
      awaitCurrentAdvance(cur.id, writerId)
      sleepInterruptibly(1 + java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(4L << math.min(attempt, 7)))
    }
    throw new CommitConflictException(
      s"commit by writer '$writerId' lost the snapshot-claim race $maxCommitRetries times at $root")
  }

  /** Sharded-format manifest diff: write ONE new group manifest per group
    * a touched bucket falls in (carrying that group's full post-commit file
    * list) and reuse the parent's refs for every other group — the
    * metadata written per commit is O(buckets touched), never O(table).
    * Orphan group manifests from lost claim races are GC'd by
    * [[expireSnapshots]].
    */
  private def shardGroupRefs(cur: Snapshot, allFiles: Seq[FileEntry],
      replacedBuckets: Set[Int], newFiles: Seq[FileEntry],
      numBuckets: Int): Seq[GroupRef] = {
    val gsz = groupSize(numBuckets)
    val touched = (replacedBuckets.iterator ++ newFiles.iterator.map(_.bucket))
      .map(_ / gsz).toSet
    // Inline→sharded migration: a parent written in the inline format (or
    // pre-sharding) has no groupRefs to carry forward — on the FIRST
    // sharded commit every group holding files must be materialized, else
    // the untouched groups' files silently vanish from the persisted
    // snapshot (and the next expiry would GC their data as orphans). A
    // BUCKET-COUNT change (rebucket) re-materializes everything too: the
    // parent's refs are grouped by the OLD group size, so none can carry
    // forward (the rebucket replaced every file anyway).
    val changed =
      if (cur.groupRefs.isEmpty || numBuckets != cur.numBuckets)
        touched ++ allFiles.iterator.map(_.bucket / gsz).toSet
      else touched
    // On a bucket-count change NO parent ref may survive — its group id is
    // in the OLD layout's numbering; an id that happens to miss `changed`
    // (a new-layout group holding no files) would resurrect old-layout
    // files into the rebucketed snapshot.
    val kept =
      if (numBuckets != cur.numBuckets) Nil
      else cur.groupRefs.filterNot(r => changed.contains(r.g))
    val byGroup = allFiles.groupBy(_.bucket / gsz)
    val fresh = changed.toSeq.sorted.flatMap { g =>
      byGroup.get(g).map { fes =>
        val name = f"m-g$g%04d-${java.util.UUID.randomUUID.toString.take(12)}.json"
        writeString(fs, new Path(metaDir, name), groupManifestJson(g, fes))
        GroupRef(g, name, fes.size)
      }
    }
    (kept ++ fresh).sortBy(_.g)
  }

  /** Assert that every snapshot in (base, cur] has a write set disjoint
    * from `ours`. A missed commit with an unknown write set (pre-`touched`
    * manifest, or already expired) conflicts by definition: failing loud
    * beats silently dropping its rows.
    */
  private def validateDisjointSince(base: Long, cur: Snapshot, ours: Set[Int],
      writerId: String): Unit = {
    var id = cur.id
    var s = cur
    while (id > base) {
      val overlap = s.touched match {
        case Some(t) => t.filter(ours.contains)
        case None => Seq(-1) // unknown write set — conflict
      }
      if (overlap.nonEmpty)
        throw new CommitConflictException(
          s"concurrent commit conflict at $root: snapshot $id (writer '${s.writerId}') " +
            s"touched buckets ${overlap.mkString(",")} that writer '$writerId' derived its " +
            s"files from (base snapshot $base) — re-read and retry")
      id = s.parent
      // Header-only parse: the walk reads `touched`/`parent`/`writerId`,
      // never file lists — resolving a sharded snapshot's group manifests
      // here would cost up to 64 extra metadata reads per missed commit on
      // the commit critical path.
      if (id > base) s =
        try LakeTable.parseManifest(readString(fs, snapPath(id)))
        catch {
          case e: Exception => throw new CommitConflictException(
            s"concurrent commit conflict at $root: snapshot $id expired before writer " +
              s"'$writerId' (base $base) could validate against it (${e.getMessage})")
        }
    }
  }

  /** Bounded wait for a racing committer's `_current` swap. A claimer that
    * crashed between manifest write and swap leaves its id orphaned — after
    * the wait budget the commit throws (operator intervention: delete the
    * orphaned `snap-N.json`), which is loud, bounded, and loses nothing.
    */
  private def awaitCurrentAdvance(beyondId: Long, writerId: String): Unit = {
    val deadline = System.nanoTime() + claimWaitMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (currentId > beyondId) return
      sleepInterruptibly(25)
    }
    throw new CommitConflictException(
      s"commit by writer '$writerId' at $root: snapshot ${beyondId + 1} is claimed but " +
        s"_current did not advance within ${claimWaitMs} ms — a racing committer may have " +
        "crashed between claim and swap (delete its orphaned manifest to recover)")
  }

  /** Epoch fence, scoped per writer identity: a commit is a replay no-op
    * only when the SAME writer already committed this epoch or a later one.
    * A different writer (fresh checkpoint — its epochIds restart at 0)
    * legitimately re-applies; the LWW merge makes that row-level idempotent
    * (non-idempotent kernels additionally pass a content `batchHash` to
    * [[commit]]). The per-writer watermark map keeps EVERY writer's fence
    * alive across hand-overs (the last-writer-only pair would forget it).
    */
  def fenced(cur: Snapshot, epochId: Long, writerId: String): Boolean =
    epochId >= 0 && (cur.writerEpochs.get(writerId).exists(_ >= epochId) ||
      (cur.writerId == writerId && cur.epochId >= epochId))

  /** A writer is ESTABLISHED once it holds an epoch watermark in the
    * current snapshot — from then on the epoch fence alone covers its
    * redelivery window, and the content-hash fence (which exists for the
    * checkpoint-swap window, where a NEW writer re-delivers old content)
    * must not be consulted for it: a genuinely new batch that happens to
    * hash like an old one would be silently dropped.
    */
  def establishedWriter(cur: Snapshot, writerId: String): Boolean =
    cur.writerEpochs.contains(writerId) ||
      (cur.writerId == writerId && cur.epochId >= 0)

  /** Sleep that propagates interrupts WITH the flag restored — a stream
    * stop() landing mid-claim-wait must surface as an interrupt the caller
    * can see (same hygiene as [[graft.cdc.Retry]]'s backoff sleep).
    */
  private def sleepInterruptibly(ms: Long): Unit =
    try Thread.sleep(ms)
    catch {
      case ie: InterruptedException =>
        Thread.currentThread().interrupt()
        throw ie
    }

  private def swapCurrent(id: Long): Unit = {
    val scheme = Option(rootPath.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // True atomic replace on POSIX via NIO — Hadoop's local FileContext
      // rename(OVERWRITE) is delete-then-rename, which exposes a missing
      // `_current` to concurrent readers. Written outside the checksum
      // layer; the stale `.crc` shadow (from the initial Hadoop-written
      // pointer) goes first so no reader ever pairs new content with an
      // old checksum.
      val crc = new Path(metaDir, s".${currentPtr.getName}.crc")
      if (fs.exists(crc)) fs.delete(crc, false)
      val tmpNio = java.nio.file.Paths.get(
        new Path(metaDir, s"._current.tmp-$id").toUri.getPath)
      java.nio.file.Files.write(tmpNio,
        snapPath(id).getName.getBytes(StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmpNio,
        java.nio.file.Paths.get(currentPtr.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(metaDir, s"._current.tmp-$id")
      writeString(fs, tmp, snapPath(id).getName)
      val fc = FileContext.getFileContext(rootPath.toUri, hadoopConf)
      fc.rename(tmp, currentPtr, Options.Rename.OVERWRITE)
    }
  }

  // ---- data file write helper ----

  /** Write `df` (public-schema cols + `_lsn` + `_deleted` + `_bucket`) as
    * new data files, returning the manifest entries. Files are split by
    * `_bucket` via dynamic partitioning; within a task rows are written
    * sorted by (conv_id, turn_idx) so turn-ordered reads stay fast and
    * parquet min/max stats stay tight (north rule: sort-order maintenance).
    *
    * Per-file row/live-row counts ride THE WRITE PASS ITSELF: a
    * [[graft.functions.FileStatsAgg]] metric keyed by
    * `(write partition id, bucket)` — which maps 1:1 onto output files
    * (dynamic partitioning writes one `part-<pid>` file per bucket a task
    * holds) — is hung on the write plan via `Dataset.observe`, so the
    * manifest entries exist the moment the write job finishes, with ZERO
    * post-write I/O. The previous design read each file's parquet footer
    * (row count + `_live` null count) after the write: O(files) SERIAL
    * driver time (~0.7 s/epoch at 64 buckets on local disk, a driver
    * round-trip per file on an object store) on every commit's critical
    * path — fixed cost that directly capped N→4N scaling efficiency. The
    * footer pass remains the verified FALLBACK: speculative execution may
    * double-count observe metrics (two successful attempts of one task),
    * so the hint is skipped under `spark.speculation`; and any
    * file↔stats-entry mismatch (multi-file tasks under maxRecordsPerFile,
    * foreign writers) discards the hint for that commit. The write-only
    * nullable `_live` marker column (null ⟺ tombstone) keeps the footer
    * fallback possible on every file; reads pass an explicit schema, so
    * `_live` is pruned at scan time and costs ~1 bit/row RLE on disk.
    */
  def writeDataFiles(df: DataFrame, schemaVer: Int,
      kind: String = FileEntry.Base): Seq[FileEntry] = {
    val dir = new Path(new Path(rootPath, "data"),
      s"c${System.currentTimeMillis()}-${java.util.UUID.randomUUID.toString.take(8)}")
    val withLive = df.withColumn("_live",
      when(col("_deleted"), lit(null).cast(BooleanType)).otherwise(lit(true)))
    // `spark.graft.writeStats=footer` is the runtime A/B + test switch
    // (spark.speculation is a static conf, so tests cannot toggle it).
    val useWriteStats =
      !spark.conf.get("spark.speculation", "false").toBoolean &&
        spark.conf.get("spark.graft.writeStats", "observe") != "footer"
    val (toWrite, obs) =
      if (!useWriteStats) (withLive, None)
      else {
        val o = org.apache.spark.sql.Observation(
          s"graft-filestats-${java.util.UUID.randomUUID.toString.take(8)}")
        // The key project is NONDETERMINISTIC (spark_partition_id), so the
        // optimizer cannot push it below the exchange the caller's
        // repartition planted — pids seen here are the write task's.
        val keyed = withLive.withColumn("_fskey",
          spark_partition_id().cast(LongType) * lit(FileKeySpan) +
            col("_bucket").cast(LongType))
        // Manifest min/max ranges ride the SAME observation: first merge
        // key in string space, second key when integral (turn_idx), and
        // `_lsn` — the inputs the file-skip predicates compare against.
        val k2 = keyCols.drop(1).headOption
          .filter(c => withLive.schema(c).dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          })
          .map(c => col(c).cast(LongType))
          .getOrElse(lit(null).cast(LongType))
        // Register the aggregates in the OBSERVED DataFrame's session:
        // under foreachBatch the batch df belongs to a CLONED session with
        // its own function registry, and a merge-on-read plan derives
        // purely from the batch side — registering in the table's outer
        // session would leave the clone's analyzer unable to resolve the
        // function (copy-on-write masks this by deriving from the outer
        // session's table read).
        val obsSession = keyed.sparkSession
        (keyed.observe(o,
          graft.functions.FileStatsAgg.column(obsSession, col("_fskey"),
            not(coalesce(col("_deleted"), lit(false)))).as("fs"),
          graft.functions.FileRangeAgg.column(obsSession, col("_fskey"),
            col(keyCols.head).cast(StringType), k2, col("_lsn")).as("fr"))
          .drop("_fskey"), Some(o))
      }
    graft.cdc.MergeApply.timed("merge-write-files")(
      toWrite.sortWithinPartitions("_bucket", keyCols: _*)
        .write.partitionBy("_bucket").mode("overwrite").parquet(dir.toString))
    graft.cdc.MergeApply.timed("file-stats")(
      obs.flatMap(statsFromWrite(dir, schemaVer, kind, _))
        .getOrElse(footerStats(dir, schemaVer, kind)))
  }

  /** `part-NNNNN-` write-task prefix of every Spark output file name. */
  private val partFileRe = "^part-(\\d+)-".r.unanchored

  /** Stats-key stride: key = pid * span + bucket. Buckets are Int, so a
    * 2^32 span can never collide across pids.
    */
  private val FileKeySpan = 1L << 32

  /** Manifest entries from the write-pass [[graft.functions.FileStatsAgg]]
    * observation: map each listed file back to its `(pid, bucket)` stats
    * key via the `part-NNNNN` task index in its name. None (→ footer
    * fallback) unless files↔entries is a verified bijection — every file
    * resolves a distinct key and the counts match exactly.
    */
  private def statsFromWrite(dir: Path, schemaVer: Int, kind: String,
      obs: org.apache.spark.sql.Observation): Option[Seq[FileEntry]] = {
    val row = graft.cdc.MergeApply.timed("file-stats-obs-get")(obs.get)
    val stats: collection.Map[Long, (Long, Long)] = row.get("fs") match {
      case Some(m: collection.Map[_, _]) =>
        m.map { case (k, v) =>
          val a = v.asInstanceOf[collection.Seq[Long]]
          k.asInstanceOf[Long] -> ((a(0), a(1)))
        }
      case _ => return None
    }
    // Min/max ranges from the companion FileRangeAgg observation. A
    // missing/undecodable range entry degrades THAT file to stats=None
    // (no skipping), never the whole commit — ranges are an optimization,
    // the row/live counts above are the accounting.
    val ranges: collection.Map[Long, FileStats] = row.get("fr") match {
      case Some(m: collection.Map[_, _]) =>
        m.flatMap { case (k, v) =>
          v match {
            case r: org.apache.spark.sql.Row if r.length == 6 =>
              Some(k.asInstanceOf[Long] -> FileStats(
                if (r.isNullAt(0)) null else r.getString(0),
                if (r.isNullAt(1)) null else r.getString(1),
                r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
            case _ => None
          }
        }
      case _ => collection.Map.empty[Long, FileStats]
    }
    val found = graft.cdc.MergeApply.timed("file-stats-list")(listDataFiles(dir))
    if (found.size != stats.size) {
      System.err.println(s"[lake] write-stats mismatch (${found.size} files vs " +
        s"${stats.size} stat entries) — falling back to footer stats for $dir")
      return None
    }
    val entries = found.map { case (p, bucket) =>
      val pid = partFileRe.findFirstMatchIn(p.getName).map(_.group(1).toLong)
        .getOrElse(return None)
      val key = pid * FileKeySpan + bucket
      stats.get(key) match {
        case Some((rows, live)) =>
          FileEntry(p.toString, bucket, schemaVer, rows, live, kind, ranges.get(key))
        case None => return None
      }
    }
    Some(entries)
  }

  /** Manifest entries for every parquet file under a commit directory,
    * derived purely from footer metadata (row counts + `_live` null
    * counts). Files whose footers lack a null count (foreign writers —
    * Spark's parquet writer always records it) fall back to one bounded
    * Spark job over just those files.
    */
  /** All parquet data files under a commit directory as (file, bucket).
    *
    * On the LOCAL filesystem this walks with `java.io.File`: Hadoop's
    * `RawLocalFileSystem` located-status listing forks a process per entry
    * to load permissions (measured ~20 ms/file — 0.7 s per 64-bucket
    * commit, serial driver time on the epoch critical path) where the
    * plain walk is ~1 ms total. Permissions/block locations are never used
    * here, so the fast path loses nothing; non-local schemes (hdfs://,
    * s3a://) take the Hadoop listing, whose remote cost is one LIST round
    * trip, not a fork per file.
    */
  private def listDataFiles(dir: Path): Seq[(Path, Int)] = {
    val scheme = dir.toUri.getScheme
    val found = mutable.ArrayBuffer[(Path, Int)]() // (file, bucket)
    if (scheme == null || scheme == "file") {
      // makeQualified: manifest paths are compared AS STRINGS by orphan GC
      // and snapshot diffing — the fast walk must emit the exact
      // "file:/..." form the Hadoop listing branch produces, or every live
      // file looks like an orphan.
      val fsys = dir.getFileSystem(hadoopConf)
      val root = new java.io.File(dir.toUri.getPath)
      val buckets = root.listFiles()
      if (buckets == null) return Nil
      buckets.foreach { bd =>
        if (bd.isDirectory && bd.getName.startsWith("_bucket=")) {
          val b = bd.getName.stripPrefix("_bucket=").toInt
          val files = bd.listFiles()
          if (files != null) files.foreach { f =>
            if (f.getName.endsWith(".parquet"))
              found += ((fsys.makeQualified(new Path(f.getAbsolutePath)), b))
          }
        }
      }
    } else {
      val fsys = dir.getFileSystem(hadoopConf)
      if (!fsys.exists(dir)) return Nil
      val it = fsys.listFiles(dir, true)
      while (it.hasNext) {
        val p = it.next().getPath
        val parent = p.getParent.getName
        if (p.getName.endsWith(".parquet") && parent.startsWith("_bucket="))
          found += ((p, parent.stripPrefix("_bucket=").toInt))
      }
    }
    found.toSeq
  }

  private def footerStats(dir: Path, schemaVer: Int, kind: String): Seq[FileEntry] = {
    import scala.jdk.CollectionConverters._
    val conf = hadoopConf
    val found = listDataFiles(dir)
    if (found.isEmpty) return Nil
    val physical = physicalSchema(schemaVer)
    val keyIsString = physical(keyCols.head).dataType == StringType
    val k2Name = keyCols.drop(1).headOption.filter(c => physical(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    // The footer pass is SERIAL driver time on every epoch's critical
    // path; each footer open is ~10 ms of filesystem round trips, so the
    // pool is sized to overlap as many as the commit has files (capped).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(48, found.size))
    try {
      val futures = found.toSeq.map { case (p, bucket) =>
        pool.submit(new java.util.concurrent.Callable[(Path, Int, Long, Long, Option[FileStats])] {
          def call(): (Path, Int, Long, Long, Option[FileStats]) =
            // A transiently unreadable footer must NOT abort the commit
            // (the data files are already written) — degrade that file to
            // "unknown" and let the bounded Spark rescue job below read it;
            // only a file Spark itself cannot read then fails the epoch.
            try {
              val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
              val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try {
                val blocks = reader.getFooter.getBlocks.asScala
                val rows = blocks.map(_.getRowCount).sum
                // dead = Σ null counts of `_live`; -1 when any chunk lacks them
                var dead = 0L
                var known = true
                // Min/max ranges from the same footers (parquet binary
                // stats are unsigned-byte order — the probe order). Any
                // block without usable stats degrades that field to
                // unknown; parquet-mr's truncated binary stats stay valid
                // bounds (min truncated down, max padded up).
                var minKey: String = null; var maxKey: String = null; var keyOk = keyIsString
                var min2 = Long.MaxValue; var max2 = Long.MinValue; var k2Ok = k2Name.isDefined
                var minLsn = Long.MaxValue; var maxLsn = Long.MinValue; var lsnOk = true
                def chunk(b: org.apache.parquet.hadoop.metadata.BlockMetaData, name: String) =
                  b.getColumns.asScala.find(_.getPath.toDotString == name)
                    .map(_.getStatistics).filter(s => s != null && s.hasNonNullValue)
                blocks.foreach { b =>
                  chunk(b, "_live") match {
                    case Some(s) if s.isNumNullsSet => dead += s.getNumNulls
                    case _ => known = false
                  }
                  if (keyOk) chunk(b, keyCols.head) match {
                    case Some(s) =>
                      // Combine per-block extremes in UTF8 BINARY order —
                      // the probe order — not Java's UTF-16 String order
                      // (they diverge for non-ASCII keys).
                      import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
                      val mn = new String(s.getMinBytes, StandardCharsets.UTF_8)
                      val mx = new String(s.getMaxBytes, StandardCharsets.UTF_8)
                      if (minKey == null || u(mn).binaryCompare(u(minKey)) < 0) minKey = mn
                      if (maxKey == null || u(mx).binaryCompare(u(maxKey)) > 0) maxKey = mx
                    case None => keyOk = false
                  }
                  k2Name.foreach { n => if (k2Ok) chunk(b, n) match {
                    case Some(s) =>
                      val mn = s.genericGetMin.asInstanceOf[Number].longValue()
                      val mx = s.genericGetMax.asInstanceOf[Number].longValue()
                      if (mn < min2) min2 = mn
                      if (mx > max2) max2 = mx
                    case None => k2Ok = false
                  }}
                  if (lsnOk) chunk(b, "_lsn") match {
                    case Some(s) =>
                      val mn = s.genericGetMin.asInstanceOf[Number].longValue()
                      val mx = s.genericGetMax.asInstanceOf[Number].longValue()
                      if (mn < minLsn) minLsn = mn
                      if (mx > maxLsn) maxLsn = mx
                    case None => lsnOk = false
                  }
                }
                val fstats =
                  if (!lsnOk) None
                  else Some(FileStats(
                    if (keyOk) minKey else null, if (keyOk) maxKey else null,
                    if (k2Ok) min2 else Long.MaxValue, if (k2Ok) max2 else Long.MinValue,
                    minLsn, maxLsn))
                (p, bucket, rows, if (known) rows - dead else -1L, fstats)
              } finally reader.close()
            } catch {
              case e: Exception =>
                System.err.println(s"[lake] footer read failed for $p (${e.getClass.getSimpleName}: " +
                  s"${e.getMessage}) — routing through the Spark rescue pass")
                (p, bucket, -1L, -1L, None)
            }
        })
      }
      val stats = futures.map(_.get())
      val (ok, unknown) = stats.partition(_._4 >= 0L)
      val rescued: Seq[(Path, Int, Long, Long, Option[FileStats])] =
        if (unknown.isEmpty) Nil
        else {
          // The rescue job computes the same ranges Spark-side (string
          // min/max is UTF8 binary order there too).
          val keyStr = col(keyCols.head).cast(StringType)
          val k2Col = k2Name.map(c => col(c).cast(LongType)).getOrElse(lit(null).cast(LongType))
          val byPath = spark.read.schema(physical)
            .parquet(unknown.map(_._1.toString): _*)
            .select(input_file_name().as("f"), col("_deleted"), col("_lsn"),
              keyStr.as("_k"), k2Col.as("_k2"))
            .groupBy(col("f"))
            .agg(count(lit(1)).as("rows"),
              sum(when(col("_deleted"), 0L).otherwise(1L)).as("live"),
              min("_k").as("mn"), max("_k").as("mx"),
              min("_k2").as("mn2"), max("_k2").as("mx2"),
              min("_lsn").as("mnl"), max("_lsn").as("mxl"))
            .collect()
            .map { r =>
              val fstats = FileStats(
                if (r.isNullAt(3)) null else r.getString(3),
                if (r.isNullAt(4)) null else r.getString(4),
                if (r.isNullAt(5)) Long.MaxValue else r.getLong(5),
                if (r.isNullAt(6)) Long.MinValue else r.getLong(6),
                r.getLong(7), r.getLong(8))
              new Path(new java.net.URI(r.getString(0))).toString ->
                ((r.getLong(1), r.getLong(2), fstats))
            }
            .toMap
          unknown.map { case (p, b, rows0, _, _) =>
            val (rows, live, fstats) = byPath.getOrElse(p.toString, (0L, 0L, null))
            (p, b, if (rows0 >= 0) rows0 else rows, live, Option(fstats))
          }
        }
      (ok ++ rescued).map { case (p, bucket, rows, live, fstats) =>
        FileEntry(p.toString, bucket, schemaVer, rows, live, kind, fstats)
      }
    } finally pool.shutdown()
  }

  // ---- maintenance ----

  /** Bin-pack compaction: rewrite every bucket that has more than
    * `maxFilesPerBucket` files — or, with `foldDeltas`, any unresolved
    * merge-on-read delta file — into one LWW-resolved sorted base file
    * (per salt-split task), committed as a metadata-neutral maintenance
    * snapshot (epoch map unchanged). Bounds the read amplification that
    * copy-on-write salting and merge-on-read deltas accumulate on hot
    * buckets; also drops tombstones older than `dropTombstonesBelowLsn`
    * (safe once the out-of-order window for those LSNs has certainly
    * passed). Folding all deltas restores the exact manifest live-row
    * count ([[commit]] row accounting).
    */
  def compact(maxFilesPerBucket: Int = 4, dropTombstonesBelowLsn: Long = -1L,
      foldDeltas: Boolean = false): CommitResult = {
    val cur = current
    val byBucket = cur.files.groupBy(_.bucket)
    val fat = byBucket.filter { case (_, fs) =>
      fs.size > maxFilesPerBucket ||
        (foldDeltas && fs.exists(_.kind == FileEntry.Delta))
    }.keySet
    if (fat.isEmpty) return CommitResult(cur, applied = false)
    // Bucket routing MUST be the merge path's definition — a drifted copy
    // here would compact rows into different buckets than merges write.
    var df = readResolved(cur, Some(fat))
      .withColumn("_bucket",
        graft.cdc.MergeApply.bucketOf(col(keyCols.head), cur.numBuckets))
    if (dropTombstonesBelowLsn >= 0)
      df = df.filter(!col("_deleted") || col("_lsn") >= dropTombstonesBelowLsn)
    val files = writeDataFiles(df.repartition(math.max(1, fat.size), col("_bucket")), cur.schemaVer)
    commit(files, fat, epochId = -1, schemaVer = cur.schemaVer, rowDelta = 0L,
      maxLsnSeen = cur.maxLsn, baseSnapshotId = cur.id)
  }

  /** Change the table's bucket count — the scale-lifecycle operation a
    * fixed-at-creation B would otherwise cap (a table that starts at 64
    * buckets and grows toward 100 TB needs 4096: per-bucket CoW rewrite
    * volume, file counts, and merge parallelism all key off B). One full
    * resolved rewrite (every row re-routes through the bucket transform —
    * there is no cheaper correct path: the bucket function changes for
    * every key), committed as ONE maintenance snapshot: readers see the
    * old layout until the commit lands, a crash leaves the old snapshot
    * intact, and a concurrent committer conflicts LOUDLY (the rebucket's
    * write set is every bucket). Unresolved merge-on-read deltas fold in
    * (the rewrite is LWW-resolved); tombstones are preserved. Crossing
    * [[LakeTable.shardBucketThreshold]] in either direction migrates the
    * manifest format automatically. Incremental consumers must
    * re-baseline: [[readChangesSince]] windows cannot span a bucket-count
    * change (it rejects them), matching Iceberg's own partition-spec
    * evolution caveat for changelog reads.
    */
  def rebucket(newNumBuckets: Int): CommitResult = {
    require(newNumBuckets > 0, s"bucket count must be positive: $newNumBuckets")
    val cur = current
    if (newNumBuckets == cur.numBuckets) return CommitResult(cur, applied = false)
    val df = readResolved(cur, None)
      .withColumn("_bucket",
        graft.cdc.MergeApply.bucketOf(col(keyCols.head), newNumBuckets))
    val parts = math.min(newNumBuckets,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val files = writeDataFiles(
      df.repartition(math.max(1, parts), col("_bucket")), cur.schemaVer)
    commit(files, (0 until cur.numBuckets).toSet, epochId = -1,
      schemaVer = cur.schemaVer, rowDelta = 0L, maxLsnSeen = cur.maxLsn,
      baseSnapshotId = cur.id, newNumBuckets = Some(newNumBuckets))
  }

  /** Expire all but the last `keepLast` snapshots and GC data files no kept
    * snapshot references (reference analog: staging purge / retention,
    * Scripts/ETL_Framework_Implementation.sql:445-485).
    */
  /** @param orphanGraceMs age floor for ORPHAN deletion (group manifests /
    *                      data files referenced by no kept snapshot). A
    *                      concurrent committer writes its data files and
    *                      group manifests BEFORE it claims `snap-N`, so an
    *                      expiry running in that window sees them as
    *                      orphans — deleting them would corrupt the commit
    *                      the moment it lands. Files younger than the
    *                      grace are skipped (a claimed-but-unswapped
    *                      snapshot needs no grace: its manifest is listed,
    *                      so its refs and files are already live here).
    *                      Single-writer maintenance (tests, in-replay GC)
    *                      passes 0 for immediate reclamation.
    * @param olderThanMs   TIME-BASED retention (Iceberg's
    *                      `expireSnapshots(olderThan)` shape; reference
    *                      analog: DATEADD-cutoff purge,
    *                      Scripts/ETL_Framework_Implementation.sql:445-485):
    *                      a snapshot younger than this age is KEPT even
    *                      beyond `keepLast`, so the retention contract for
    *                      incremental consumers ([[readChangesSince]],
    *                      [[readAt]]) is expressible in time units — "any
    *                      baseline taken in the last 7 days stays
    *                      readable" — which is how changelog consumers
    *                      reason, not in snapshot counts. Age is the
    *                      manifest file's mtime (the commit's claim
    *                      instant). Negative (default) = count-based
    *                      retention only, the pre-existing behavior.
    */
  def expireSnapshots(keepLast: Int = 2,
      orphanGraceMs: Long = defaultOrphanGraceMs,
      olderThanMs: Long = -1L): ExpiryReport = {
    val ids = snapshotIds
    val curId = current.id
    val youngEnough: Set[Long] =
      if (olderThanMs < 0L) Set.empty
      else {
        val ageCutoff = System.currentTimeMillis() - olderThanMs
        fs.listStatus(metaDir)
          .filter(st => st.getPath.getName.startsWith("snap-") &&
            st.getModificationTime >= ageCutoff)
          .map(st => st.getPath.getName.stripPrefix("snap-")
            .stripSuffix(".json").toLong)
          .toSet
      }
    val keep = ids.filter(_ >= curId - keepLast + 1).toSet ++ youngEnough + curId
    val keptSnaps = keep.toSeq.map(snapshot)
    val live: Set[String] = keptSnaps.flatMap(_.files.map(_.path)).toSet
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    // delete dead snapshot manifests (id-based: never younger than kept)
    val deadSnaps = ids.filterNot(keep)
    deadSnaps.foreach(id => fs.delete(snapPath(id), false))
    // delete group manifests no kept snapshot references (expired
    // snapshots' groups + orphans from lost commit-claim races), unless
    // young enough to be an in-flight commit's pre-claim write
    val liveRefs: Set[String] = keptSnaps.flatMap(_.groupRefs.map(_.path)).toSet
    val deadRefs = fs.listStatus(metaDir)
      .filter(st => st.getPath.getName.startsWith("m-") &&
        st.getPath.getName.endsWith(".json") &&
        !liveRefs.contains(st.getPath.getName) &&
        st.getModificationTime < cutoff)
    deadRefs.foreach(st => fs.delete(st.getPath, false))
    // delete orphan data files, same grace
    var dirsReclaimed = 0
    var filesDeleted = 0
    val dataDir = new Path(rootPath, "data")
    if (fs.exists(dataDir)) {
      val it = fs.listFiles(dataDir, true)
      val dead = mutable.ArrayBuffer[Path]()
      val liveCommitDirs = mutable.Set[String]()
      // The commit dir is the path segment directly under data/ — walk up
      // to it rather than a fixed number of levels, because an IN-FLIGHT
      // write's files sit deeper (c<ts>/_temporary/.../part-*.parquet) and
      // must still protect their commit dir from the sweep below.
      def commitDirOf(p: Path): String = {
        var d = p.getParent
        var name: String = null
        while (d != null && d.getName != "data") { name = d.getName; d = d.getParent }
        name
      }
      while (it.hasNext) {
        val st = it.next()
        val p = st.getPath
        if (p.getName.endsWith(".parquet")) {
          if (!live.contains(p.toString) && st.getModificationTime < cutoff) dead += p
          else {
            val cd = commitDirOf(p) // live, or a young possibly-in-flight orphan
            if (cd != null) liveCommitDirs += cd
          }
        }
      }
      dead.foreach(p => fs.delete(p, false))
      filesDeleted = dead.size
      // Reclaim EMPTIED commit directories: every writeDataFiles call
      // creates one c<ts>-<uuid> dir, so without this the data/ tree
      // grows by one dir per epoch forever and each expiry's recursive
      // listing walks an unbounded graveyard (an object store pays a
      // LIST per prefix). A dir is deletable once it holds no live and no
      // young (possibly in-flight) file and it predates the grace cutoff;
      // a dir whose files were deleted JUST NOW has a refreshed mtime on
      // POSIX and is reclaimed by the next expiry instead — one cycle
      // late, never wrongly. A `_temporary` child marks an IN-FLIGHT
      // write that has produced no part files yet — mtime alone cannot
      // protect it (orphanGraceMs=0 maintenance, object stores with
      // synthetic dir mtimes), so its presence vetoes deletion outright.
      def inFlight(d: Path): Boolean =
        try fs.listStatus(d).exists(_.getPath.getName == "_temporary")
        catch { case _: java.io.FileNotFoundException => false }
      fs.listStatus(dataDir).foreach { st =>
        if (st.isDirectory && !liveCommitDirs.contains(st.getPath.getName) &&
          st.getModificationTime < cutoff && !inFlight(st.getPath)) {
          fs.delete(st.getPath, true)
          dirsReclaimed += 1
        }
      }
    }
    ExpiryReport(deadSnaps.size, deadRefs.length, filesDeleted, dirsReclaimed)
  }
}

/** What one [[LakeTable.expireSnapshots]] pass reclaimed — returned so a
  * maintenance scheduler or monitoring channel can record retention
  * activity without re-listing the tree it just swept.
  */
final case class ExpiryReport(
    snapshotsDeleted: Int,
    groupManifestsDeleted: Int,
    dataFilesDeleted: Int,
    commitDirsReclaimed: Int)

object LakeTable {

  val internalCols: Seq[StructField] = Seq(
    StructField("_lsn", LongType, nullable = false),
    StructField("_deleted", BooleanType, nullable = false))

  /** Order-independent content hash of a batch: per-row xxhash64 summed in
    * decimal(38,0) space (a plain long sum overflows under ANSI mode; 38
    * digits absorb ~1e19 rows) and folded back to a long. Non-idempotent
    * merge kernels pass this to [[LakeTable.commit]] as the re-delivery
    * fence (reference analog: content-hash `batch_id`,
    * Docs/etl_requirements_reviewed_by_sr.md:162-165).
    */
  def batchContentHash(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    pmod(sum(xxhash64(cols: _*).cast(DecimalType(38, 0))),
      lit(new java.math.BigDecimal(Long.MaxValue))).cast(LongType)

  /** Fold PRE-AGGREGATED per-row-hash sums (decimal(38,0) partial sums of
    * xxhash64 over raw rows, e.g. the `_hsum` column
    * [[graft.analytics.IncrementalStats.deltas]] carries) into the same
    * hash space as [[batchContentHash]] — lets a batch be content-hashed
    * over its RAW rows even when only an aggregate of the batch is in hand.
    */
  def batchContentHashFromSums(hsum: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(sum(hsum), lit(new java.math.BigDecimal(Long.MaxValue))).cast(LongType)

  /** FIFO cap on remembered batch content hashes: the re-delivery window
    * after a checkpoint swap is bounded (a restarted stream re-reads at
    * most its source's retained backlog), so only recent batches can
    * legitimately reappear. 4096 hashes ≈ 32 KB of manifest.
    */
  val maxBatchHashes = 4096

  /** How many times a commit re-runs the claim loop after losing the
    * snapshot-id race (each loss means another committer landed — the
    * retry rebases onto its snapshot after the write-set check). Sized so
    * that exhausting it means a genuinely pathological committer storm,
    * not two steady writers in momentary lockstep.
    */
  val maxCommitRetries = 16

  /** Wait budget (ms) for a racing claimer's `_current` swap to land
    * before declaring it crashed. sys-prop override for tests.
    */
  def claimWaitMs: Long =
    sys.props.get("graft.lake.claimWaitMs").map(_.toLong).getOrElse(5000L)

  /** Default orphan-deletion age floor for [[LakeTable.expireSnapshots]]:
    * long enough that any concurrent commit whose data files / group
    * manifests predate its `snap-N` claim has claimed (or died) before its
    * artifacts become eligible — the Iceberg remove-orphans pattern.
    */
  val defaultOrphanGraceMs: Long = 30L * 60 * 1000

  /** Tables with more buckets than this use the SHARDED manifest format:
    * file entries live in per-bucket-group manifest files and the snapshot
    * JSON carries only group references. 64 groups bounds the snapshot
    * JSON and the manifest-list diff per commit regardless of bucket count
    * (a 4096-bucket table has 64-bucket groups), while commits rewrite
    * only the groups their touched buckets fall in.
    */
  val shardBucketThreshold = 64

  def sharded(numBuckets: Int): Boolean = numBuckets > shardBucketThreshold

  /** Buckets per group manifest — sized so there are ≤ 64 groups. */
  def groupSize(numBuckets: Int): Int =
    math.max(1, (numBuckets + shardBucketThreshold - 1) / shardBucketThreshold)

  /** Create an empty table at `root` with an initial schema version. */
  def create(
      spark: SparkSession, root: String, schemaVer: Int, numBuckets: Int,
      registry: Map[Int, StructType] = Model.schemaRegistry,
      keyCols: Seq[String] = Model.keyCols,
      renames: Map[Int, Map[String, String]] = Map.empty): LakeTable = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(rootPath, "_meta")
    // Re-creating over an existing table must start METADATA-fresh:
    // resetting `_current` to snap-0 while a stale snap-1.json survives
    // from the previous incarnation would deadlock the next commit — its
    // create-exclusive claim of id 1 always loses to the stale file and
    // `_current` never advances (observed when a bench child was killed
    // and its table path reused). Old DATA files are left in place:
    // snap-0 references none of them, so they are merely orphans.
    if (fs.exists(metaDir) && !fs.delete(metaDir, true))
      throw new IllegalStateException(
        s"create: failed to delete stale table metadata at $metaDir — " +
          "refusing to proceed (surviving snap-N manifests would deadlock " +
          "the re-created table's first commit)")
    fs.mkdirs(metaDir)
    val snap = Snapshot(0L, -1L, -1L, schemaVer, numBuckets, 0L, -1L, Nil)
    val t = new LakeTable(spark, root, registry, keyCols, renames)
    writeManifest(fs, new Path(metaDir, f"snap-${0L}%010d.json"), snap)
    writeString(fs, new Path(metaDir, "_current"), f"snap-${0L}%010d.json")
    t
  }

  def load(
      spark: SparkSession, root: String,
      registry: Map[Int, StructType] = Model.schemaRegistry,
      keyCols: Seq[String] = Model.keyCols,
      renames: Map[Int, Map[String, String]] = Map.empty): LakeTable =
    new LakeTable(spark, root, registry, keyCols, renames)

  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root, "_meta/_current")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Driver-side twin of [[graft.cdc.MergeApply.bucketOf]]: the same
    * xxhash64 (Spark's default seed 42) + pmod, evaluated without a Spark
    * job, so a point read prunes to its bucket before planning anything.
    * Seed/algorithm lockstep with the Column form is pinned by test.
    */
  private[graft] def bucketOfKey(key: String, numBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(key), StringType, 42L)
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }

  /** File-skip predicates, in UTF8 BINARY order on both sides (the write
    * pass and parquet footer stats min/max in the same order). Absent or
    * unknown stats never skip — legacy manifests read correct, unpruned.
    */
  private[graft] def mayContainKey(f: FileEntry,
      k: org.apache.spark.unsafe.types.UTF8String): Boolean = f.stats match {
    case Some(s) if s.hasKeyRange =>
      import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
      k.binaryCompare(u(s.minKey)) >= 0 && k.binaryCompare(u(s.maxKey)) <= 0
    case _ => true
  }

  private[graft] def mayOverlapKeyRange(f: FileEntry,
      lo: org.apache.spark.unsafe.types.UTF8String,
      hi: org.apache.spark.unsafe.types.UTF8String): Boolean = f.stats match {
    case Some(s) if s.hasKeyRange =>
      import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
      hi.binaryCompare(u(s.minKey)) >= 0 && lo.binaryCompare(u(s.maxKey)) <= 0
    case _ => true
  }

  /** Cast/null-fill `df` (physical schema `from`) up to `to`. Only widening
    * casts are legal here; the registry guarantees versions only add
    * nullable columns or widen types.
    */
  private[graft] def conform(df: DataFrame, from: StructType, to: StructType): DataFrame = {
    val have = from.fieldNames.toSet
    df.select(to.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  // ---- tiny JSON codec for manifests (no external deps beyond Spark's
  // jackson; hand-rolled to keep the format explicit and stable) ----

  private def esc(x: String) = x.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private[graft] def filesJson(fes: Seq[FileEntry]): String =
    fes.map { f =>
      // Stats tail is OPTIONAL per entry (version-tolerant both ways:
      // old readers ignore the extra fields, old entries parse to None).
      // `mnl` is the presence marker — LSN ranges are tracked whenever
      // stats are collected at all; key min/max may still be absent
      // (null keys in the file).
      val st = f.stats.map { s =>
        val kk =
          if (s.hasKeyRange) s""""mn":"${esc(s.minKey)}","mx":"${esc(s.maxKey)}","""
          else ""
        s""",$kk"mn2":${s.min2},"mx2":${s.max2},"mnl":${s.minLsn},"mxl":${s.maxLsn}"""
      }.getOrElse("")
      s"""{"path":"${esc(f.path)}","bucket":${f.bucket},"schemaVer":${f.schemaVer},""" +
        s""""rows":${f.rows},"live":${f.live},"kind":"${esc(f.kind)}"$st}"""
    }.mkString("[", ",", "]")

  /** One bucket-group manifest (sharded format). */
  private[lake] def groupManifestJson(g: Int, fes: Seq[FileEntry]): String =
    s"""{"g":$g,"files":${filesJson(fes)}}"""

  private[lake] def parseGroupManifest(json: String): Seq[FileEntry] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    parseFileArray(m.readTree(json).get("files"))
  }

  private def parseFileArray(arr: com.fasterxml.jackson.databind.JsonNode): Seq[FileEntry] =
    (0 until arr.size()).map { i =>
      val f = arr.get(i)
      val stats =
        if (!f.has("mnl")) None
        else Some(FileStats(
          if (f.has("mn")) f.get("mn").asText() else null,
          if (f.has("mx")) f.get("mx").asText() else null,
          if (f.has("mn2")) f.get("mn2").asLong() else Long.MaxValue,
          if (f.has("mx2")) f.get("mx2").asLong() else Long.MinValue,
          f.get("mnl").asLong(), f.get("mxl").asLong()))
      FileEntry(f.get("path").asText(), f.get("bucket").asInt(),
        f.get("schemaVer").asInt(), f.get("rows").asLong(),
        if (f.has("live")) f.get("live").asLong() else -1L,
        if (f.has("kind")) f.get("kind").asText() else FileEntry.Base,
        stats)
    }

  private[graft] def manifestJson(s: Snapshot): String = {
    // Sharded tables reference group manifests; inline tables embed files.
    val tail =
      if (sharded(s.numBuckets)) {
        val gs = s.groupRefs
          .map(r => s"""{"g":${r.g},"path":"${esc(r.path)}","n":${r.n}}""")
          .mkString("[", ",", "]")
        s""""groups":$gs"""
      } else s""""files":${filesJson(s.files)}"""
    val we = s.writerEpochs.toSeq.sortBy(_._1)
      .map { case (w, e) => s"""{"w":"${esc(w)}","e":$e}""" }.mkString("[", ",", "]")
    val bh = s.batchHashes.mkString("[", ",", "]")
    val tb = s.touched.map(_.mkString(""""touched":[""", ",", "],")).getOrElse("")
    s"""{"id":${s.id},"parent":${s.parent},"epochId":${s.epochId},"schemaVer":${s.schemaVer},""" +
      s""""numBuckets":${s.numBuckets},"rows":${s.rows},"maxLsn":${s.maxLsn},""" +
      s""""writer":"${esc(s.writerId)}","inputEvents":${s.inputEvents},""" +
      s""""dedupedKeys":${s.dedupedKeys},"mergeMs":${s.mergeMs},"maint":${s.maint},""" +
      s"""$tb"writerEpochs":$we,"batchHashes":$bh,$tail}"""
  }

  private[graft] def parseManifest(json: String): Snapshot = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val m = new ObjectMapper()
    val n = m.readTree(json)
    val files = if (n.has("files")) parseFileArray(n.get("files")) else Nil
    val groupRefs: Seq[GroupRef] =
      if (!n.has("groups")) Nil
      else (0 until n.get("groups").size()).map { i =>
        val g = n.get("groups").get(i)
        GroupRef(g.get("g").asInt(), g.get("path").asText(), g.get("n").asInt())
      }
    def optLong(k: String): Long = if (n.has(k)) n.get(k).asLong() else -1L
    val writerEpochs: Map[String, Long] =
      if (!n.has("writerEpochs")) Map.empty
      else (0 until n.get("writerEpochs").size()).map { i =>
        val e = n.get("writerEpochs").get(i)
        e.get("w").asText() -> e.get("e").asLong()
      }.toMap
    val batchHashes: Seq[Long] =
      if (!n.has("batchHashes")) Nil
      else (0 until n.get("batchHashes").size()).map(i => n.get("batchHashes").get(i).asLong())
    val touched: Option[Seq[Int]] =
      if (!n.has("touched")) None
      else Some((0 until n.get("touched").size()).map(i => n.get("touched").get(i).asInt()))
    Snapshot(n.get("id").asLong(), n.get("parent").asLong(), n.get("epochId").asLong(),
      n.get("schemaVer").asInt(), n.get("numBuckets").asInt(), n.get("rows").asLong(),
      n.get("maxLsn").asLong(), files,
      writerId = if (n.has("writer")) n.get("writer").asText() else "",
      inputEvents = optLong("inputEvents"), dedupedKeys = optLong("dedupedKeys"),
      mergeMs = optLong("mergeMs"),
      writerEpochs = writerEpochs, batchHashes = batchHashes, touched = touched,
      groupRefs = groupRefs,
      // pre-field manifests: false (every commit then was written by a
      // build where the replay guard tolerated the ambiguity)
      maint = n.has("maint") && n.get("maint").asBoolean())
  }

  private def writeManifest(fs: FileSystem, p: Path, s: Snapshot): Unit =
    writeString(fs, p, manifestJson(s))

  /** Read a snapshot manifest, resolving sharded group refs into the full
    * in-memory file list (≤ 64 small sequential reads — driver metadata,
    * not a data-path cost).
    */
  private def readManifest(fs: FileSystem, p: Path): Snapshot = {
    val s = parseManifest(readString(fs, p))
    if (s.groupRefs.isEmpty) s
    else s.copy(files = s.groupRefs.flatMap(r =>
      parseGroupManifest(readString(fs, new Path(p.getParent, r.path)))))
  }

  private[lake] def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Create-exclusive write — the snapshot-id CLAIM primitive. Returns
    * false when another committer already owns `p`. On the file scheme
    * this MUST be NIO `CREATE_NEW` (O_CREAT|O_EXCL, atomic in the kernel):
    * Hadoop's local create(overwrite=false) is a non-atomic exists check
    * followed by an O_TRUNC open, so two racing claimers could both pass
    * the check and the second would truncate the winner's manifest — a
    * corrupted snapshot, not just a lost race. HDFS create(false) is
    * atomic at the namenode, so the Hadoop path is safe there.
    */
  private[graft] def writeStringExclusive(fs: FileSystem, p: Path, s: String): Boolean =
    if (fs.getScheme == "file")
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          s.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    else
      try {
        val out = fs.create(p, false)
        try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if fs.exists(p) => false
      }

  private[graft] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }
}
