package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query implementations live in `graft.queries.*` registries (each a
  * `Seq[(name, QueryDef)]`); this object is just the merge point the
  * driver's Verify/Bench mains read.
  */
object SparkEntry {

  private val registry: Seq[(String, QueryDef)] =
    RelationalQueries.defs ++ BasketQueries.defs ++
      JoinQueries.defs ++ WindowQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MediaQueries.defs ++ SqlQueries.defs ++ TpchQueries.defs ++
      PipelineQueries.defs ++ BpeQueries.defs ++ GraphQueries.defs ++
      CdcQueries.defs ++ ProfileQueries.defs ++ TpchDeepQueries.defs ++
      StreamQueries.defs

  // a name collision between registry files would silently drop a query
  // (and its oracle) from the driver surface via toMap — fail loudly
  require(registry.map(_._1).distinct.size == registry.size,
    "duplicate query names: " + registry.map(_._1).groupBy(identity)
      .collect { case (n, os) if os.size > 1 => n }.mkString(", "))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, d) => n -> d.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}
