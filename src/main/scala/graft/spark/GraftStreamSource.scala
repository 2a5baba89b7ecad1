package graft.spark

import graft.table.GraftTable
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

/** Graft tables as a Structured Streaming SOURCE — the dual of the
  * streaming sink (GraftTable.appendStreamBatch): a query tails the
  * table's snapshot log, each micro-batch reading exactly the files the
  * new snapshots appended.
  *
  *   spark.readStream.format("graft").load(tableDir)
  *
  * This is the table-format streaming-read capability of the reference's
  * engine (Iceberg's `spark.readStream.format("iceberg")`), built on the
  * V1 Source API so each batch re-enters the DataFrame parquet read path
  * (vectorized reader, schema-evolution projection) instead of a custom
  * row reader.
  *
  * Offset model: a LongOffset holding the COUNT of snapshots consumed
  * from the table's snapshot list (commit order). getBatch((a, b]) plans
  * the manifest-diff of each snapshot in the range against its
  * predecessor — pure metadata, no data scan. Restart-safe: offsets
  * round-trip through the checkpoint as JSON longs, and the snapshot
  * list is append-only (expire_snapshots prunes old entries — a
  * checkpoint older than the retained history fails loudly on the range
  * check rather than silently skipping data).
  *
  * Append-only semantics: non-append snapshots (CoW delete/update/merge,
  * compaction, overwrite) rewrite existing rows into new files; emitting
  * their diff would duplicate old rows downstream. Default = fail the
  * stream (Iceberg errors identically); `.option("skip-rewrites", true)`
  * treats them as producing no stream rows.
  *
  * Scale: getOffset is one metadata-file read; each batch reads only the
  * newly-appended files (no re-scan of table history), so steady-state
  * cost tracks the append rate, not table size. */
class GraftStreamSource(
    sqlContext: SQLContext,
    tableDir: HPath,
    skipRewrites: Boolean,
    maxSnapshotsPerTrigger: Option[Int] = None)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private val table = new GraftTable(tableDir)

  override val schema: StructType = {
    val m = table.meta
    m.sparkSchema(m.currentSchemaId)
  }

  private def toOrdinal(o: OffsetV2): Int = o match {
    case LongOffset(v)       => v.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => throw new IllegalArgumentException(s"not a graft offset: $other")
  }

  // Trigger.AvailableNow pins its target when the run starts: every
  // trigger advances toward THIS prefix (rate-limited per batch), and
  // the run ends there even if appends keep landing — the bounded-drain
  // contract. None outside AvailableNow runs.
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.meta.publishedPrefix)

  // Admission control (Kafka's maxOffsetsPerTrigger analog): each
  // micro-batch advances at most K snapshots past its start, so a
  // backlog catch-up is a sequence of append-rate-sized batches, never
  // one giant batch over the accumulated history. Declared as a
  // maxFiles read limit — the closest standard currency (a snapshot is
  // a file group); the math below uses our own K either way.
  override def getDefaultReadLimit: ReadLimit =
    maxSnapshotsPerTrigger.map(ReadLimit.maxFiles(_)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // publishedPrefix, not snapshots.size: a branch-staged (WAP) snapshot
    // must not leak into the stream until its publish — the tail stalls
    // at it and resumes, in order, once main fast-forwards
    val n = availableNowTarget.getOrElse(table.meta.publishedPrefix)
    val start = Option(startOffset).map(toOrdinal).getOrElse(0)
    val capped = maxSnapshotsPerTrigger.fold(n)(k => math.min(n, start + k))
    if (capped == 0) null else LongOffset(capped.toLong)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val n = table.meta.publishedPrefix
    if (n == 0) null else LongOffset(n.toLong)
  }

  /** Legacy path (non-admission-control engines); the admission-control
    * latestOffset above is what MicroBatchExecution actually drives. */
  override def getOffset: Option[Offset] = {
    val n = table.meta.publishedPrefix
    if (n == 0) None else Some(LongOffset(n.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(toOrdinal).getOrElse(0)
    org.apache.spark.sql.GraftSqlBridge.asStreamingFrame(
      table.readSnapshotRange(sqlContext.sparkSession, from, toOrdinal(end), skipRewrites))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$tableDir]"
}

object GraftStreamSource {
  /** Shared by GraftDataSource's StreamSourceProvider hooks. */
  def pathOf(parameters: Map[String, String]): HPath =
    new HPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "readStream.format(\"graft\") requires .load(<table dir>)")))

  def schemaOf(parameters: Map[String, String]): StructType = {
    val t = new GraftTable(pathOf(parameters))
    val m = t.meta
    m.sparkSchema(m.currentSchemaId)
  }
}
