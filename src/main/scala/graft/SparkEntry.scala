package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the judged operator inventory (SURVEY.md §2): each entry is
  * a self-contained `(SparkSession, sfDir) => DataFrame`. `oracleSql` maps
  * the same key to DuckDB-runnable ANSI SQL over the same parquet tables;
  * entries without an oracle get a rows-only check (non-SQL-expressible
  * semantics such as sketches/time-travel internals).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way broadcast star join (SURVEY.md §2 I4/I6). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Joins.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Events.queries ++
      graft.queries.Vectors.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.TableQueries.queries ++
      graft.queries.Graphs.queries ++
      graft.multimodal.Media.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Joins.oracle ++
      graft.queries.Windows.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Vectors.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.TableQueries.oracle ++
      graft.queries.Graphs.oracle ++
      graft.multimodal.Media.oracle
}
