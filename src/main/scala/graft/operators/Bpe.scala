package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeMerges, TextFns}

/** Real BPE tokenization with the frozen [[BpeMerges]] table — the
  * "apply" half of train-once/serve-many (the train half is
  * `tools/FreezeBpeMerges`).
  *
  * Every symbol is one char (merged symbols live in the private-use
  * area), so applying merge rank `i` is one codegen'd 2-char → 1-char
  * `replace` and the full tokenizer is a 96-deep replace chain — a
  * single narrow projection, no UDF, no shuffle.
  *
  * Scale design: the chain is only ever evaluated on the DISTINCT
  * pre-token dictionary, never on the exploded corpus — tokenizing
  * 100 TB of text costs one distinct() over pre-tokens (bounded by
  * vocabulary, not corpus size) plus a keyed join back, which AQE
  * broadcasts while the dictionary stays small. Per-word results are
  * integer stats, so the join payload is narrow.
  */
object Bpe {

  /** All merged-symbol chars as one string, for translate()-based
    * "count the merged symbols" arithmetic. */
  val puaChars: String = BpeMerges.merges.map(_._3.toChar).mkString

  /** The frozen merge chain applied to a (lowercased pre-token) column:
    * one `replace` per merge, in rank order. */
  def encode(c: Column): Column =
    BpeMerges.merges.foldLeft(c) { case (e, (a, b, m, _)) =>
      replace(e, lit(s"${a.toChar}${b.toChar}"), lit(m.toChar.toString))
    }

  /** doc-id + exploded lowercased BPE pre-tokens. */
  private def preTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(TextFns.bpeTokens(lower(col(textCol)))).as("w"))

  /** Per-word token stats over an already-distinct word column:
    * (w, w_tokens = symbols after merging, w_merged = multi-char
    * symbols among them). */
  private def dict(words: DataFrame): DataFrame =
    words
      .withColumn("_enc", encode(col("w")))
      .select(col("w"),
        length(col("_enc")).cast("long").as("w_tokens"),
        (length(col("_enc")) - length(translate(col("_enc"), puaChars, "")))
          .cast("long").as("w_merged"),
        col("_enc"))

  /** Per-document tokenizer stats on the frozen merges: pre-token
    * count, BPE token count, merged-token count. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val pre = preTokens(docs, idCol, textCol)
    pre.join(dict(pre.select("w").distinct()).drop("_enc"), Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("w_tokens")).as("n_tokens"),
        sum(col("w_merged")).as("n_merged"))
  }

  /** Per-document tokenizer-quality metrics on the frozen merges — the
    * standard tokenizer-eval pair: fertility (BPE tokens emitted per
    * pre-token; 1.0 = every word is one token, higher = the vocabulary
    * fits the corpus worse) and whole-word rate (fraction of pre-tokens
    * the merge table covers with a single symbol — the complement of
    * the OOV-ish tail that fragments). Both are ONE IEEE division from
    * exact BIGINT counts, so the floats hash-verify (q_bpe_fertility).
    * Same scale shape as [[tokenStats]]: the merge chain runs on the
    * distinct dictionary only. */
  def fertility(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val pre = preTokens(docs, idCol, textCol)
    pre.join(dict(pre.select("w").distinct()).drop("_enc"), Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("w_tokens")).as("n_tokens"),
        sum(when(col("w_tokens") === 1, 1L).otherwise(0L)).as("n_whole"))
      .select(col(idCol), col("n_words"), col("n_tokens"), col("n_whole"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_whole").cast("double") / col("n_words").cast("double"))
          .as("whole_rate"))
  }

  /** Corpus-wide BPE token frequencies (decoded token text), top `k`
    * by (freq desc, token asc). Frequencies are computed on the
    * dictionary weighted by word counts — the explode-to-symbols step
    * runs over distinct words only. */
  def vocabFreq(docs: DataFrame, k: Int, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val pre = preTokens(docs, idCol, textCol)
    val wc = pre.groupBy("w").agg(count(lit(1)).as("_n"))
    val spark = docs.sparkSession
    import spark.implicits._
    val decodeTable = BpeMerges.vocab.toDF("sym", "token")
    wc.join(dict(wc.select("w")), Seq("w"))
      .select(col("_n"), explode(split(col("_enc"), "")).as("sym"))
      .join(broadcast(decodeTable), Seq("sym"))
      .groupBy(col("token"))
      .agg(sum(col("_n")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
      .select(col("token"), col("freq"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("token"))).cast("long").as("rank"))
  }

  /** DISTRIBUTED BPE merge training — the train half of
    * train-once/serve-many, in-engine (closing the one frozen artifact
    * whose training loop lived only in the offline
    * [[graft.tools.FreezeBpeMerges]] tool; IvfCentroids already has
    * lloydIterate). Classic frequency-weighted pair merging (Sennrich
    * et al. 2016) over the DISTINCT pre-token dictionary:
    *
    *  - round state is the weighted word dictionary (w, n) — bounded by
    *    vocabulary, not corpus size, so 100 TB of text trains over the
    *    same few-MB frame a laptop would (the [[tokenStats]] scale
    *    argument, applied to training);
    *  - each round is ONE fused pair-count+argmax aggregation
    *    ([[graft.functions.SketchAggs.PairArgmaxAgg]]: a single
    *    TypedImperativeAggregate buffer counts adjacent pairs AND keeps
    *    the running argmax — 2 stages, partial maps over the dictionary
    *    partitions then a single-partition merge) plus a 1-row collect
    *    of the winner; the tie-break is a packed (l_code, r_code) key —
    *    count desc, then left/right codepoint asc, the FreezeBpeMerges
    *    tie-break (single-char BMP strings compare in codepoint order
    *    on both engines);
    *  - the winning pair applies as one codegen'd 2-char → 1-char
    *    `replace` (merged symbol = U+E000+round), and the dictionary is
    *    re-checkpointed (lazy) so the next round's action materializes
    *    exactly one increment — the CC/PageRank one-action-per-round
    *    discipline, with plan depth O(1) per round.
    *
    * Runs a FIXED `numMerges` rounds (stopping only if no adjacent
    * pairs remain) — unlike FreezeBpeMerges it does NOT stop at
    * count < 2, so the two agree wherever the corpus supports
    * `numMerges` productive merges (true on the frozen table's training
    * corpus, where round 96's best pair still counts 871; BpeSpec pins
    * sequential ≡ distributed on a synthetic corpus, and q_bpe_train's
    * DuckDB oracle replays every round).
    *
    * WHY THE ROUNDS STAY SERIAL (the r11 verdict's batched-BPE
    * question, decided r12): batching the top-b symbol-disjoint pairs
    * per round does NOT preserve the serial merge sequence. Merging the
    * round's argmax (a,b) (i) creates NEW pairs containing the merged
    * symbol `ab` with counts up to cnt(a,b), and (ii) decrements every
    * pair sharing a or b — so the true round-2 argmax is often a pair a
    * disjoint-restricted pick can never select (e.g. cnt(a,b)=100,
    * cnt(b,c)=99, best disjoint pair 50: serial merges (b,c)-after-
    * decrement at 98; batched would merge the 50). A batch admission
    * rule strong enough to PROVE serial equivalence has to dominate
    * both effects (disjointness + count ≥ every pair sharing a symbol
    * with any earlier pick + tie-safe vs all new `ab`-pairs), which on
    * real corpora admits ~1 pair per round — serial again, with extra
    * machinery. Batched-BPE is therefore a DIFFERENT training
    * definition (a separate operator with its own frozen artifact and
    * oracle, if ever needed), not an optimization of this one; and the
    * serial cost is dictionary-bounded, not corpus-bounded — since r19
    * the whole serial phase runs inside ONE single-partition task (see
    * the inline note), so its floor is the loop itself, not 96 × Spark
    * job latency.
    *
    * @return (rank, left_code, right_code, merged_code, cnt) — one row
    *         per learned merge, ranks 0-based, codes as BIGINT
    *         codepoints, merged_code = 0xE000 + rank
    */
  def train(docs: DataFrame, numMerges: Int,
            textCol: String = "text", dictPartitions: Int = 1): DataFrame = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges must be in [1, 4096], got $numMerges")
    require(dictPartitions >= 1,
      s"dictPartitions must be >= 1, got $dictPartitions")
    val spark = docs.sparkSession
    import spark.implicits._
    // The corpus-proportional work (pre-token explode + count) happens
    // ONCE here at full parallelism; every ROUND then runs over the
    // distinct dictionary, which is vocabulary-bounded (≲ millions of
    // rows for trillion-token corpora — Heaps' law), so the rounds are
    // re-partitioned down to `dictPartitions` small partitions: at 96
    // rounds × 4 stages each, per-task scheduling overhead on a
    // 32-partition frame dominates the actual aggregation by 10×+
    // (measured 17.7 s → 5.6 s on the frozen table's corpus).
    val words = graft.Tables.fanOut(docs.select(col(textCol)))
      .select(explode(TextFns.bpeTokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .coalesce(dictPartitions)
      .localCheckpoint(false)
    // The BMP-only precondition must be LOUD, not silently divergent:
    // PairArgmaxAgg counts UTF-16 code units (the FreezeBpeMerges char
    // loop) while the DuckDB oracle counts codepoints — a supplementary
    // char (emoji → surrogate pair) would diverge the pair counts, and
    // a pre-existing PUA char would collide with merged symbols. TWO
    // regex classes, because Java regex matches by CODE POINT: a valid
    // surrogate PAIR is a single supplementary code point (≥ U+10000)
    // that never lands in [\uD800-] — that class only catches
    // LONE surrogate halves and the PUA. One tiny job over the
    // dictionary, amortized across all rounds.
    require(words.filter(col("w").rlike("[\\uD800-\\uF8FF]")
        || col("w").rlike("[\\x{10000}-\\x{10FFFF}]")).isEmpty,
      "BPE training corpus contains supplementary-plane, lone-surrogate " +
        "or private-use-area chars — the single-char symbol encoding " +
        "cannot represent them")
    // ALL rounds run inside ONE single-partition task (r19 optimization):
    // the per-round work over a vocabulary-bounded dictionary is sub-ms,
    // so the old one-Spark-job-per-round loop (fused PairArgmaxAgg +
    // 1-row collect + checkpointed replace per round) paid 96 × job
    // scheduling/planning latency for microseconds of aggregation —
    // measured ~42 ms/round, ~4.1 s of the steady bench, against ~25 ms
    // for the whole serial loop in-task. The corpus-proportional pass
    // (explode + count above) keeps full parallelism; the serial merge
    // phase moves to where the dictionary rows are (one task, one job —
    // never a driver collect of the dictionary), exactly the
    // decision-pass/payload-pass split of guide §8. Round semantics are
    // bit-identical to the old PairArgmaxAgg loop: overlapping UTF-16
    // code-unit pair counts weighted by n, argmax by (cnt desc, packed
    // (l,r) asc), Java String.replace (= Spark replace = DuckDB
    // replace: leftmost-first, non-overlapping) — BpeSpec pins this
    // against its independent sequential reference trainer and the
    // frozen BpeMerges table, and q_bpe_train's DuckDB oracle replays
    // all 96 rounds.
    val nm = numMerges
    words.select(col("w"), col("n")).as[(String, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val ws = scala.collection.mutable.ArrayBuffer[String]()
        val ns = scala.collection.mutable.ArrayBuffer[Long]()
        it.foreach { case (w, n) => ws += w; ns += n }
        val cur = ws.toArray
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
        var i = 0
        var done = false
        while (i < nm && !done) {
          val counts = scala.collection.mutable.LongMap.empty[Long]
          var k = 0
          while (k < cur.length) {
            val s = cur(k); val n = ns(k)
            var j = 0
            while (j < s.length - 1) {
              val key = (s.charAt(j).toLong << 32) | s.charAt(j + 1).toLong
              counts.update(key, counts.getOrElse(key, 0L) + n)
              j += 1
            }
            k += 1
          }
          if (counts.isEmpty) done = true
          else {
            var bestKey = 0L; var bestCnt = -1L
            counts.foreachEntry { (kk, v) =>
              if (v > bestCnt || (v == bestCnt && kk < bestKey)) { bestKey = kk; bestCnt = v }
            }
            val lc = bestKey >>> 32
            val rc = bestKey & 0xFFFFFFFFL
            out += ((i.toLong, lc, rc, (0xE000 + i).toLong, bestCnt))
            val pat = s"${lc.toInt.toChar}${rc.toInt.toChar}"
            val rep = (0xE000 + i).toChar.toString
            k = 0
            while (k < cur.length) { cur(k) = cur(k).replace(pat, rep); k += 1 }
            i += 1
          }
        }
        out.iterator
      }
      .toDF("rank", "left_code", "right_code", "merged_code", "cnt")
  }

  // ---- DuckDB oracle SQL generators ------------------------------------

  /** The full training loop as unrolled DuckDB CTE rounds (the
    * q_pagerank pattern at 96 rounds): per round, a pair-count CTE over
    * the current dictionary, a 1-row argmax (ORDER BY cnt DESC, l, r
    * LIMIT 1 — binary string order ≡ codepoint order for 1-char BMP
    * symbols), and the applied `replace`. Dictionary and argmax CTEs
    * are MATERIALIZED — each is referenced twice, and DuckDB's default
    * inlining would expand the round chain exponentially. Verified to
    * reproduce [[graft.functions.BpeMerges]] bit-for-bit on its
    * training corpus (96 rounds, 2.6 s). */
  def duckTrainSql(numMerges: Int): String = {
    val rounds = (0 until numMerges).map { i =>
      s"""p$i AS (SELECT substr(w, j, 1) AS l, substr(w, j + 1, 1) AS r, n FROM (
         |  SELECT w, n, unnest([{'j': jj} for jj in generate_series(1, length(w) - 1)],
         |                      recursive := true) FROM w$i)),
         |b$i AS MATERIALIZED (SELECT l, r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM p$i GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 1),
         |w${i + 1} AS MATERIALIZED (SELECT replace(w$i.w, b$i.l || b$i.r, chr(${0xE000 + i})) AS w, n
         |  FROM w$i, b$i)""".stripMargin
    }.mkString(",\n")
    val union = (0 until numMerges)
      .map(i => s"SELECT $i AS rank, l, r, cnt FROM b$i")
      .mkString("\nUNION ALL ")
    s"""WITH pre AS (SELECT unnest(regexp_extract_all(lower(text), '${TextFns.BpePattern}')) AS w
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n FROM pre GROUP BY w),
       |$rounds,
       |merges AS ($union)
       |SELECT CAST(rank AS BIGINT) AS rank, CAST(unicode(l) AS BIGINT) AS left_code,
       |       CAST(unicode(r) AS BIGINT) AS right_code,
       |       CAST(${0xE000} + rank AS BIGINT) AS merged_code, cnt
       |FROM merges""".stripMargin
  }


  /** `replace`-chain CTE stages over `srcCte(srcCol)`, ≤32 merges per
    * stage so DuckDB's 128-deep expression binder never trips. Emits
    * `stages` CTE text; the final stage is named `bpe_enc` with
    * columns (passCols..., s). Search/replacement chars are spelled
    * `chr(n)` so quoting never matters. */
  def duckEncodeCtes(srcCte: String, srcCol: String, passCols: Seq[String]): String = {
    val stages = BpeMerges.merges.grouped(32).toSeq
    val keep = passCols.mkString(", ")
    stages.zipWithIndex.map { case (ms, i) =>
      val in = if (i == 0) srcCol else "s"
      val from = if (i == 0) srcCte else s"bpe_e${i - 1}"
      val chain = ms.foldLeft(in) { case (e, (a, b, m, _)) =>
        s"replace($e, chr($a)||chr($b), chr($m))"
      }
      val name = if (i == stages.size - 1) "bpe_enc" else s"bpe_e$i"
      s"$name AS (SELECT $keep, $chain AS s FROM $from)"
    }.mkString(",\n")
  }

  /** The decode table as an inline DuckDB relation (sym, token). */
  def duckVocabValues: String =
    BpeMerges.vocab.map { case (sym, tok) =>
      val symSql = s"chr(${sym.codePointAt(0)})"
      s"($symSql, '${tok.replace("'", "''")}')"
    }.mkString("(VALUES ", ", ", ") AS v(sym, token)")
}
