package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the "keep a 100 TB table current
  * from an update stream" operators every training-data refresh needs:
  * SCD1 merge (latest change per key wins: upsert or delete) and SCD2
  * history (every change becomes a validity interval).
  *
  * Scale shape: compacting the change stream to one row per key is a
  * single keyed `max_by` aggregation — partial+final, map-side
  * combinable, ONE shuffle on the key (a row_number window would sort
  * whole partitions and combine nothing). The merge itself is one full
  * outer join on the same key, so with the base table bucketed/
  * pre-partitioned on the key the whole MERGE is one co-located pass;
  * change batches are typically ≪ base, so AQE can also flip the
  * compacted side to a broadcast.
  */
object Cdc {

  /** Compact a change stream to the LATEST change per key.
    *
    * `orderCols` must be a TOTAL order within a key (e.g. ts + a unique
    * change id) or "latest" is not well defined; `max_by` over the
    * packed struct makes the pick associative, so it is exact under any
    * partitioning.
    *
    * @return one row per key: (keyCol, every column in `payload`)
    */
  def latestPerKey(changes: DataFrame, keyCol: String,
                   orderCols: Seq[String], payload: Seq[String]): DataFrame = {
    val packed = struct(payload.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    changes.groupBy(col(keyCol))
      .agg(max_by(packed, ord).as("_last"))
      .select(col(keyCol) +: payload.map(p => col(s"_last.$p").as(p)): _*)
  }

  /** SCD1 MERGE: apply the latest change per key to `base`.
    *
    * Semantics (one full-outer join, standard MERGE truth table):
    *   - key only in base                     → row kept unchanged
    *   - latest change has opCol = 'D'        → row deleted (or the
    *     insert suppressed, if the key was absent)
    *   - key in both, op != 'D'               → UPDATE: columns named in
    *     `set` take the change's value, the rest keep base values
    *   - key only in changes, op != 'D'       → INSERT: `set` columns
    *     from the change, remaining base columns null
    *
    * `set` maps base-column name → expression over the change columns
    * (qualified via the `chg` Dataset alias). Column set of the result
    * == column set of `base`.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   orderCols: Seq[String], opCol: String,
                   set: Map[String, Column]): DataFrame = {
    val payload = changes.columns.filter(_ != keyCol).toSeq
    val last = latestPerKey(changes, keyCol, orderCols, payload).alias("chg")
    val b = base.alias("base")
    val joined = b.join(last, col(s"base.$keyCol") === col(s"chg.$keyCol"), "full_outer")
    val hasChange = col(s"chg.$keyCol").isNotNull
    // NULL-safe: a NULL op is NOT a delete (SQL MERGE semantics — `WHEN
    // MATCHED AND op = 'D'` is simply false for NULL). Without the
    // coalesce, `=== "D"` yields NULL, `filter(!isDelete)` drops the
    // row, and a malformed change with a missing op SILENTLY DELETES
    // its key (r12 review finding; CdcSpec pins the upsert behavior).
    val isDelete = hasChange && coalesce(col(s"chg.$opCol") === "D", lit(false))
    val outCols = base.columns.toSeq.map { c =>
      val baseVal = col(s"base.$c")
      if (c == keyCol) coalesce(col(s"base.$keyCol"), col(s"chg.$keyCol")).as(c)
      else set.get(c) match {
        case Some(chgVal) => when(hasChange, chgVal).otherwise(baseVal).as(c)
        case None         => baseVal.as(c)
      }
    }
    joined.filter(!isDelete).select(outCols: _*)
  }

  /** SCD2 history: every change row becomes a validity interval
    * [valid_from, valid_to) per key — valid_from = the change's own
    * order key, valid_to = the NEXT change's (null while current).
    * `lead` over (key, orderCols) is the one genuinely windowed step:
    * one shuffle on the key, per-key sort only (no cross-key skew
    * beyond a genuinely hot key, which SCD dimensions don't have).
    *
    * @return changes + (valid_to column per orderCol, is_current flag)
    */
  def scd2(changes: DataFrame, keyCol: String, orderCols: Seq[String],
           validToSuffix: String = "_to"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val withTo = orderCols.foldLeft(changes) { (df, oc) =>
      df.withColumn(oc + validToSuffix, lead(col(oc), 1).over(w))
    }
    withTo.withColumn("is_current",
      col(orderCols.head + validToSuffix).isNull.cast("long"))
  }
}
