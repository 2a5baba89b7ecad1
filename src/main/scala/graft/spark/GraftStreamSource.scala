package graft.spark

import java.nio.file.{Path, Paths}

import graft.table.GraftTable
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
    tableDir: Path,
    skipRewrites: Boolean)
  extends Source {

  private val table = new GraftTable(tableDir)

  override val schema: StructType = {
    val m = table.meta
    m.sparkSchema(m.currentSchemaId)
  }

  private def toOrdinal(o: Offset): Int = o match {
    case LongOffset(v)       => v.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => throw new IllegalArgumentException(s"not a graft offset: $other")
  }

  override def getOffset: Option[Offset] = {
    // publishedPrefix, not snapshots.size: a branch-staged (WAP) snapshot
    // must not leak into the stream until its publish — the tail stalls
    // at it and resumes, in order, once main fast-forwards
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
  def pathOf(parameters: Map[String, String]): Path =
    Paths.get(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "readStream.format(\"graft\") requires .load(<table dir>)")))

  def schemaOf(parameters: Map[String, String]): StructType = {
    val t = new GraftTable(pathOf(parameters))
    val m = t.meta
    m.sparkSchema(m.currentSchemaId)
  }
}
