package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation (the Deequ/dbt-test class of lakehouse
  * primitive): declarative constraints evaluated as aggregates, one row
  * per check — `(check, violations BIGINT, passed BOOLEAN)` — so a
  * pipeline gates a 100 TB table load on `passed` without ever
  * collecting the data.
  *
  * Scale shapes, by check class:
  *  - [[columnChecks]]: ANY number of null/range/predicate constraints
  *    over one table fold into ONE scan + ONE map-side-combinable agg —
  *    adding a check is free once the scan is paid.
  *  - [[uniquenessCheck]]: one keyed agg (dup keys) + one global fold.
  *  - [[referentialCheck]]: left-anti join against the (distinct)
  *    parent keys — broadcast when the parent is a dim, shuffle-keyed
  *    otherwise; AQE decides.
  * All metrics are exact BIGINT counts — the report is hash-verified
  * (q_data_checks).
  */
object Checks {

  private def report(name: String, violations: Column): Seq[Column] = Seq(
    lit(name).as("check"), violations.as("violations"),
    (violations === 0L).as("passed"))

  /** Count violations of each named predicate in ONE pass over `df`.
    * A predicate marks the BAD rows (e.g. `col("x").isNull`).
    *
    * Three-valued semantics: a predicate that evaluates to NULL (e.g.
    * `col("x") > 5` on a NULL x) counts as NOT violating — SQL's
    * `CASE WHEN` rule, and what the DuckDB oracle replays. A range
    * check that must also reject NULLs says so explicitly:
    * `col("x").isNull || col("x") > 5` (spec-pinned). */
  def columnChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "columnChecks needs at least one check")
    // duplicate names would make the per-check column reference below
    // ambiguous — fail loudly, not with an AMBIGUOUS_REFERENCE later
    require(checks.map(_._1).distinct.size == checks.size,
      "columnChecks names must be unique: " + checks.map(_._1).mkString(", "))
    val aggs = checks.map { case (name, bad) =>
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(checks.map { case (name, _) =>
      struct(lit(name).as("check"), col(name).as("violations"))
    }: _*)
    one.select(explode(rows).as("c"))
      .select(col("c.check").as("check"), col("c.violations").as("violations"),
        (col("c.violations") === 0L).as("passed"))
  }

  /** Violations = surplus rows beyond the first per duplicated key
    * (0 ⇔ `keyCols` is a unique key). NULL keys group together like
    * GROUP BY does — two NULL-keyed rows count as a duplicate, the
    * strict reading a uniqueness gate wants. */
  def uniquenessCheck(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "uniquenessCheck needs at least one key column")
    val dups = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1L)
      .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("_v"))
    dups.select(report(name, col("_v")): _*)
  }

  /** Violations = child rows whose key has no match in the parent
    * (0 ⇔ referential integrity holds). Null child keys are orphans. */
  def referentialCheck(child: DataFrame, parent: DataFrame, name: String,
                       childKey: String, parentKey: String): DataFrame = {
    val orphans = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("_v"))
    orphans.select(report(name, col("_v")): _*)
  }

  /** Union of check reports — one frame, one row per constraint. */
  def suite(reports: DataFrame*): DataFrame =
    reports.reduceLeft(_ unionByName _)
}
