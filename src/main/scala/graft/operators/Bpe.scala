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

  // ---- DuckDB oracle SQL generators ------------------------------------

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
