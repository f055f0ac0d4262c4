package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.BpeMerges
import graft.operators.Bpe

/** Pins for the frozen-merge BPE tokenizer.
  *
  * The load-bearing claim (FreezeBpeMerges scaladoc): applying merges
  * in rank order, one global left-to-right `replace` pass each, equals
  * the canonical BPE loop "repeatedly apply the lowest-rank pair
  * present anywhere in the word". That holds because a merge's
  * constituent symbols are products of strictly earlier merges, so a
  * later merge can never re-enable an earlier one. The property test
  * checks it against an independently written canonical implementation
  * on random words (including adversarial aaa…/ababab… shapes).
  */
class BpeSpec extends SparkSpec {

  /** Rank-order application — the serving algorithm (same
    * String.replace the Spark/DuckDB chains compile to). */
  private def rankOrder(w: String): String =
    BpeMerges.merges.foldLeft(w) { case (s, (a, b, m, _)) =>
      s.replace(s"${a.toChar}${b.toChar}", m.toChar.toString)
    }

  /** Canonical BPE: loop { find the lowest-rank merge whose pair is
    * adjacent anywhere; apply it everywhere (left-to-right); repeat }. */
  private def canonical(w: String): String = {
    val rank = BpeMerges.merges.zipWithIndex
      .map { case ((a, b, m, _), i) => (s"${a.toChar}${b.toChar}", (i, m.toChar)) }.toMap
    var s = w
    var cont = true
    while (cont) {
      val applicable = s.sliding(2).toSeq.distinct.flatMap(p => rank.get(p).map(p -> _))
      if (applicable.isEmpty) cont = false
      else {
        val (pair, (_, merged)) = applicable.minBy(_._2._1)
        s = s.replace(pair, merged.toString)
      }
    }
    s
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("rank-order replace chain equals canonical lowest-rank-first BPE") {
    val wordGen = for {
      n <- Gen.choose(1, 24)
      leading <- Gen.oneOf("", " ")
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, // general words
        4 -> Gen.oneOf('a', 'e', 'r', 't', 's'), // dense repeat alphabet
        1 -> Gen.oneOf('0', '9', '.')))
    } yield leading + cs.mkString
    samples(wordGen, 300).foreach { w =>
      assert(rankOrder(w) == canonical(w), s"diverged on ${w.toList}")
    }
    // adversarial overlap shapes for any (x,x) / (x,y) merges
    Seq("aaaa", "aaaaa", "ssss", "erer", " ssss", "ererer", "tttt").foreach { w =>
      assert(rankOrder(w) == canonical(w), s"diverged on $w")
    }
  }

  test("merge constituents always predate the merge (rank-order precondition)") {
    val born = BpeMerges.merges.zipWithIndex
      .map { case ((_, _, m, _), i) => m -> i }.toMap
    BpeMerges.merges.zipWithIndex.foreach { case ((a, b, _, _), i) =>
      assert(born.get(a.toChar.toInt).forall(_ < i))
      assert(born.get(b.toChar.toInt).forall(_ < i))
    }
    // decoded token = decode(left) + decode(right), and vocab covers every symbol
    val decode = BpeMerges.vocab.toMap
    BpeMerges.merges.foreach { case (a, b, m, tok) =>
      assert(decode(m.toChar.toString) == tok)
      assert(decode(a.toChar.toString) + decode(b.toChar.toString) == tok)
    }
  }

  test("Spark encode chain matches the JVM reference on the corpus dictionary") {
    val docs = Tables.documents(spark, sf001)
    val words = docs
      .select(explode(graft.functions.TextFns.bpeTokens(lower(col("text")))).as("w"))
      .distinct()
    val got = words.withColumn("enc", Bpe.encode(col("w")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.nonEmpty)
    got.foreach { case (w, enc) =>
      assert(enc == rankOrder(w), s"spark chain diverged on '$w'")
      assert(enc == canonical(w))
    }
    // merges actually fire on real corpus words
    assert(got.exists { case (w, enc) => enc.length < w.length })
  }

  test("tokenStats: conservation and compression on the corpus") {
    val stats = Bpe.tokenStats(Tables.documents(spark, sf001)).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (nw, nt, nm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt >= nw) // every pre-token still emits ≥1 symbol
      assert(nm <= nt)
    }
    // the trained table compresses this corpus: merged tokens dominate somewhere
    assert(stats.exists(r => r.getLong(3) > 0))
  }

  test("fertility: bounds hold and the frozen table covers some words whole") {
    val rows = Bpe.fertility(Tables.documents(spark, sf001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt, nwh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (fert, rate) = (r.getDouble(4), r.getDouble(5))
      assert(nwh <= nw && nt >= nw)
      assert(fert >= 1.0 && rate >= 0.0 && rate <= 1.0)
      assert(math.abs(fert - nt.toDouble / nw) == 0.0) // the one division
    }
    // single-char pre-tokens ("a", digits) are whole by construction
    assert(rows.exists(_.getLong(3) > 0))
  }

  /** Sequential reference trainer — Bpe.train's semantics (fixed
    * rounds, stop only when no adjacent pairs remain; no count<2 stop)
    * in the FreezeBpeMerges single-threaded shape. */
  private def trainSequential(wordCounts: Seq[(String, Long)],
                              numMerges: Int): Seq[(Long, Long, Long, Long, Long)] = {
    var words = wordCounts
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(Char, Char), Long]().withDefaultValue(0L)
      for ((w, n) <- words; j <- 0 until w.length - 1)
        counts((w(j), w(j + 1))) += n
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x.toInt, y.toInt) }
        val m = (0xE000 + i).toChar
        words = words.map { case (w, n) => (w.replace(s"$a$b", m.toString), n) }
        out += ((i.toLong, a.toLong, b.toLong, (0xE000 + i).toLong, cnt))
        i += 1
      }
    }
    out.result()
  }

  test("train: distributed merge loop equals the sequential trainer, incl. exhaustion stop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low"),
      (2L, "newer newest new news"),
      (3L, "low new lower"),
      (4L, "wider widest wide")).toDF("doc_id", "text")
    val wc = docs
      .select(explode(graft.functions.TextFns.bpeTokens(lower(col("text")))).as("w"))
      .groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Bpe.train(docs, numMerges = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == trainSequential(wc, 12))
    // exhaustion: ask for more merges than the corpus can produce — both
    // trainers stop when every word is a single symbol (no pairs left)
    val tiny = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val tinyWc = Seq((" ab", 1L), ("ab", 1L), (" ba", 1L))
    val gotTiny = Bpe.train(tiny, numMerges = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val seqTiny = trainSequential(tinyWc, 50)
    assert(gotTiny.toSeq == seqTiny)
    assert(gotTiny.length < 50, "exhaustion must stop the loop early")
  }

  test("train rejects supplementary-plane and PUA corpora loudly") {
    import spark.implicits._
    // U+1F600 is a surrogate PAIR in UTF-16 but ONE code point to Java
    // regex — the old surrogate/PUA range class silently admitted it
    // (a compiled [surrogate-range] pattern does not match the emoji);
    // PairArgmaxAgg would then count code units against a codepoint
    // oracle. The supplementary-plane class must make it loud.
    val emoji = Seq((1L, "ab ab 😀 cd")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](Bpe.train(emoji, numMerges = 4))
    assert(e1.getMessage.contains("supplementary"))
    // pre-existing private-use char would collide with merged symbols
    val pua = Seq((1L, "ab  cd")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException](Bpe.train(pua, numMerges = 4))
    assert(e2.getMessage.contains("private-use"))
  }

  test("train reproduces the frozen BpeMerges table on its training corpus") {
    // the done-criterion made a repo pin: 96 distributed rounds on the
    // sf0.01 documents corpus — the exact corpus FreezeBpeMerges froze —
    // must yield the checked-in constants code for code, rank for rank
    val got = Bpe.train(Tables.documents(spark, "/root/testdata/sf0.01"), numMerges = 96)
      .collect().map(r => (r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt))
    assert(got.length == 96)
    assert(got.toSeq == BpeMerges.merges.map { case (a, b, m, _) => (a, b, m) })
  }

  test("vocabFreq: decoded multi-char tokens rank in the top 100") {
    val top = Bpe.vocabFreq(Tables.documents(spark, sf001), k = 100).collect()
    assert(top.length <= 100 && top.nonEmpty)
    // ranks are 1..n in freq-desc order
    assert(top.map(_.getLong(2)).toSeq == (1L to top.length).toSeq)
    val freqs = top.map(_.getLong(1)).toSeq
    assert(freqs == freqs.sorted.reverse)
    assert(top.exists(_.getString(0).length > 1), "no merged token in top 100")
  }
}
