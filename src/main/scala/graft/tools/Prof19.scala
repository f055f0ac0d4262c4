package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-19 optimization profiler (dev tool, guide §1): times SUB-pipelines
  * of the top steady-profile families in isolation so optimization effort
  * lands where the time actually is. Each component is timed with the noop
  * sink (computes every column, no sink cost — guide §1.4), min of `reps`
  * runs, with upstream frames materialized through persist so a stage's
  * number is its own work, not its inputs'. Never run while Bench is
  * recording (CLAUDE.md r16 discipline).
  */
object Prof19 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(name: String, reps: Int = 3)(build: => DataFrame): Unit = {
    val spark = SparkSession.active
    val ts = (1 to reps).map { _ =>
      graft.Caching.release()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"prof19: $name")
      noop(build)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF $name%-34s min ${ts.min}%7.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val which = if (args.isEmpty) Set("graph", "cc", "bpe") else args.toSet

    if (which("graph")) {
      // ---- graph family: edge build vs iterative rounds ----
      def rawEdges = graft.operators.Graph.coOccurrenceEdges(
        Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L)
      time("graph.edge_build")(rawEdges)
      // materialized edge frame so round timings exclude the build
      val eMat = rawEdges.localCheckpoint(true)
      val nodes = graft.operators.Graph.edgeNodes(eMat, "item").localCheckpoint(true)
      time("graph.pagerank5.rounds_only") {
        graft.operators.Graph.pageRank(eMat, nodes, "item", iterations = 5)
      }
      time("graph.label_prop4.rounds_only") {
        graft.operators.Graph.labelPropagation(eMat, nodes, "item", iterations = 4)
      }
      time("graph.bfs4.rounds_only") {
        graft.operators.Graph.bfsHops(eMat,
          nodes.filter(col("item") % 97 === 0), "item", maxHops = 4)
      }
      time("graph.triangles.rounds_only") {
        graft.operators.Graph.triangleCounts(eMat, nodes, "item")
      }
    }

    if (which("edge")) {
      // ---- edge build sub-steps ----
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      time("edge.scan_only")(li)
      def sets = li.select(col("l_orderkey").as("bid"), col("l_partkey").as("item"))
        .filter(col("bid").isNotNull)
        .groupBy(col("bid")).agg(collect_set(col("item")).as("items"))
      time("edge.sets_build")(sets)
      time("edge.sets_build_fanout") {
        graft.Tables.fanOut(li.select(col("l_orderkey").as("bid"), col("l_partkey").as("item")))
          .filter(col("bid").isNotNull)
          .groupBy(col("bid")).agg(collect_set(col("item")).as("items"))
      }
      val setsMat = sets.localCheckpoint(true)
      time("edge.pairs_count_from_sets") {
        import graft.functions.PairsGenerator.pairs
        setsMat.select(pairs(col("items")).as(Seq("src", "dst")))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))
          .filter(col("weight") >= 2L)
      }
    }

    if (which("ngram")) {
      // ---- ngram-pairs kernel sub-steps ----
      val docs = Tables.documents(spark, sfDir)
      def sh = {
        val m = classOf[graft.operators.Dedup.type] // anchor
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, minJaccard = 0.5)
      }
      val toks = docs.select(col("doc_id").as("id"),
        graft.functions.TextFns.tokens(col("text")).as("toks"))
      time("ngram.tokens_only")(toks)
      time("ngram.full_pairs")(sh)
    }

    // q:<name> — min-of-5 steady for one registered query (count() like
    // Bench, released between runs)
    which.filter(_.startsWith("q:")).map(_.stripPrefix("q:")).foreach { qn =>
      val fn = graft.SparkEntry.queries(qn)
      val ts = (1 to 5).map { _ =>
        graft.Caching.release()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF q:$qn%-32s min ${ts.min}%7.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
      graft.Caching.release()
    }

    if (which("par")) {
      val docs = Tables.documents(spark, sfDir)
      def shOf(d: DataFrame) = d.select(col("doc_id").as("id"),
          graft.functions.TextFns.tokens(col("text")).as("_toks"))
        .select(col("id"), explode(graft.functions.TextFns.wordShingles(col("_toks"), 3)).as("_shs"))
        .select(col("id"), xxhash64(col("_shs")).as("shingle"))
      time("par.shingles_asis")(shOf(docs))
      time("par.shingles_repart32")(shOf(docs.repartition(32)))
      val li = Tables.lineitem(spark, sfDir)
      time("par.tpchq6_asis") {
        li.filter(col("l_shipdate").between("1994-01-01", "1994-12-31") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice") * col("l_discount")))
      }
      time("par.tpchq6_repart") {
        li.repartition(32)
          .filter(col("l_shipdate").between("1994-01-01", "1994-12-31") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice") * col("l_discount")))
      }
    }

    if (which("ngram2")) {
      val docs = Tables.documents(spark, sfDir)
      val sh = docs.select(col("doc_id").as("id"),
          graft.functions.TextFns.tokens(col("text")).as("_toks"))
        .select(col("id"), explode(graft.functions.TextFns.wordShingles(col("_toks"), 3)).as("_shs"))
        .select(col("id"), xxhash64(col("_shs")).as("shingle"))
      time("ngram2.shingles_nodistinct")(sh)
      time("ngram2.shingles_distinct")(sh.distinct())
      val filt = sh.distinct().localCheckpoint(true)
      println(s"NGRAM rows distinct=${filt.count()}")
      val pairsJ = filt.select(col("id").as("id1"), col("shingle"))
        .join(filt.select(col("id").as("id2"), col("shingle")), Seq("shingle"))
        .filter(col("id1") < col("id2"))
      time("ngram2.selfjoin_paircount_from_mat") {
        pairsJ.groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("common"))
      }
      println(s"NGRAM copair rows=${pairsJ.count()}")
    }

    if (which("cc")) {
      // ---- CC/cluster family: pair generation vs closure ----
      val docs = Tables.documents(spark, sfDir)
      def pairs = graft.operators.Dedup
        .ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3, minJaccard = 0.5)
        .select(col("id1"), col("id2"))
      time("cc.ngram_pairs_0.5")(pairs)
      val pMat = pairs.localCheckpoint(true)
      val nMat = docs.select(col("doc_id")).localCheckpoint(true)
      time("cc.min_label_cc.closure_only") {
        graft.operators.Dedup.connectedComponents(pMat, nMat, "doc_id")
      }
      time("cc.star_cc.closure_only") {
        graft.operators.Dedup.connectedComponentsStar(pMat, nMat, "doc_id")
      }
      val inBatch = (c: org.apache.spark.sql.Column) => c % 13 === 0
      time("cc.incremental.maintenance_only") {
        val standing = graft.operators.Dedup.connectedComponents(
          pMat.filter(!inBatch(col("id1")) && !inBatch(col("id2"))),
          nMat.filter(!inBatch(col("doc_id"))), "doc_id")
        graft.operators.Dedup.incrementalComponents(
          standing,
          pMat.filter(inBatch(col("id1")) || inBatch(col("id2"))),
          nMat.filter(inBatch(col("doc_id"))), "doc_id")
      }
    }

    if (which("bpe")) {
      // ---- BPE: corpus pass vs the 96 serial rounds ----
      val docs = Tables.documents(spark, sfDir)
      time("bpe.word_dict_build") {
        docs.select(explode(graft.functions.TextFns.bpeTokens(lower(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
      }
      time("bpe.train96.full", reps = 2) {
        graft.operators.Bpe.train(docs, numMerges = 96)
      }
    }

    spark.stop()
  }
}
