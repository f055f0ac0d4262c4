package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: steady-state timing (2nd run) or --plan to dump executedPlan. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (flags, names0) = args.partition(_.startsWith("--"))
    val plan = flags.contains("--plan") || flags.contains("--plan-exec")
    val exec = flags.contains("--plan-exec") // materialize first: AQE final plan incl. stage reuse
    // --formatted=<dir>/<suffix>: write each query's explain("formatted")
    // to <dir>/<name>_<suffix>.txt — the committed plan evidence the
    // optimization-round deliverable requires (plans/r19/…_before/_after)
    val fmtOut = flags.collectFirst { case f if f.startsWith("--formatted=") =>
      f.stripPrefix("--formatted=") }
    val names = if (names0.nonEmpty) names0.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      if (fmtOut.isDefined) {
        val sep = fmtOut.get.lastIndexOf('/')
        val (dir, suffix) = (fmtOut.get.substring(0, sep), fmtOut.get.substring(sep + 1))
        val df = fn(spark, sfDir)
        val out = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"${n}_$suffix.txt"), out)
        println(s"WROTE $dir/${n}_$suffix.txt")
        Caching.release()
      } else if (plan) {
        val df = fn(spark, sfDir)
        if (exec) df.count()
        println(s"===== $n ====="); println(df.queryExecution.executedPlan.toString.take(8000))
      } else {
        fn(spark, sfDir).count(); Caching.release()
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        println(f"STEADY $n%-22s ${(System.nanoTime()-t0)/1e9}%8.3f s")
        Caching.release()
      }
    }
    spark.stop()
  }
}
