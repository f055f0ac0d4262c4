package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Blocked fuzzy join: edit-distance semantics, canonical pair emission,
  * blocking recall bounds, and the hot-block cap. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def names = Seq(
    (1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
    (4L, "kitty"), (5L, "mouse")).toDF("id", "name")

  test("pairs within maxDist, each emitted once, dist exact") {
    // block = everything (single block) isolates the distance semantics
    val got = FuzzyJoin.selfJoin(names, "id", "name", lit(1), maxDist = 2)
      .select("s1", "s2", "dist").as[(String, String, Long)].collect().toSet
    // levenshtein: kitten-sitten 1, sitten-sittin 1, kitten-sittin 2,
    // kitten-kitty 2; everything with mouse > 2; kitty-sitten/sittin > 2
    assert(got == Set(
      ("kitten", "sitten", 1L), ("sitten", "sittin", 1L),
      ("kitten", "sittin", 2L), ("kitten", "kitty", 2L)))
  }

  test("blocking bounds candidates: cross-block near-pairs are not emitted") {
    val blocked = FuzzyJoin.selfJoin(names, "id", "name",
      expr("substring(name, 1, 1)"), maxDist = 2)
      .select("s1", "s2").as[(String, String)].collect().toSet
    // only same-first-letter pairs survive the blocking
    assert(blocked == Set(("kitten", "kitty"), ("sitten", "sittin")))
  }

  test("maxBlockSize drops degenerate blocks entirely") {
    val df = (1 to 50).map(i => (i.toLong, s"x$i")).toDF("id", "name")
    val capped = FuzzyJoin.selfJoin(df, "id", "name", lit(1), maxDist = 99,
      maxBlockSize = Some(10))
    assert(capped.count() == 0L)
  }

  test("cap path plans as keyed count + semi join, never a window (AssocRules rule)") {
    // the cap guards against a hot block — a window would buffer that
    // block whole in one task's sort before the filter could drop it
    val df = (1 to 50).map(i => (i.toLong, s"x$i")).toDF("id", "name")
    val p = FuzzyJoin.selfJoin(df, "id", "name", lit(1), maxDist = 99,
      maxBlockSize = Some(10)).queryExecution.executedPlan.toString
    assert(!p.contains("Window "), s"hot block key planned as a window:\n$p")
    assert(p.contains("LeftSemi"), s"keep-set semi join missing from the cap path:\n$p")
  }

  test("mixed blocks: capped block vanishes, small blocks keep their pairs") {
    val hot = (1 to 20).map(i => (100L + i, s"h$i", "H"))
    val cool = Seq((1L, "kitten", "C"), (2L, "sitten", "C"))
    val df = (hot ++ cool).toDF("id", "name", "blk")
    val got = FuzzyJoin.selfJoin(df, "id", "name", col("blk"), maxDist = 2,
      maxBlockSize = Some(10)).select("s1", "s2").as[(String, String)].collect().toSet
    assert(got == Set(("kitten", "sitten")))
  }
}
