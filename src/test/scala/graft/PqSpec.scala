package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, PqCodebooks, Similarity}

/** Pins for product quantization: encode invariants, ADC contract, and
  * the measured quality curve (floors are a fresh local sf0.001 run
  * minus slack — the honest-floor discipline, not aspiration).
  */
class PqSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf001)
  lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  lazy val bruteTop: Map[Long, Set[Long]] =
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
    val got = res.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val rs = bruteTop.toSeq.map { case (q, exact) =>
      got.getOrElse(q, Set.empty).count(exact).toDouble / exact.size
    }
    rs.sum / rs.size
  }

  test("encode: codes in range, pq_code packs them, recon_norm positive, one row per vector") {
    val enc = Pq.encode(emb, "vec_id", "embedding")
    assert(enc.count() == emb.count())
    val bad = enc.filter(
      (0 until PqCodebooks.numSub).map(m =>
        col(s"code_$m") < 0 || col(s"code_$m") >= PqCodebooks.codesPerSub)
        .reduce(_ || _) ||
      col("pq_code") =!= (((col("code_0") * 16 + col("code_1")) * 16
        + col("code_2")) * 16 + col("code_3")) ||
      col("recon_norm") <= 0.0)
    assert(bad.isEmpty, "encode invariant violated")
  }

  test("encode is deterministic (frozen codebooks, no runtime training)") {
    val a = Pq.encode(emb, "vec_id", "embedding").collect().map(_.toString).sorted
    val b = Pq.encode(emb, "vec_id", "embedding").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("adcTopK returns k ranked neighbors per query, self excluded") {
    val res = Pq.adcTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "rank").collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == queries.count())
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10)
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to 10L))
      assert(!rs.map(_.getLong(1)).contains(q))
    }
  }

  test("quality curve: 2-byte codes give useful recall, exact rerank of the ADC shortlist dominates") {
    val adc = recallOf(Pq.adcTopK(emb, queries, "vec_id", "embedding", 10))
    val rr = recallOf(Pq.adcTopKRerank(emb, queries, "vec_id", "embedding", 10, shortlist = 100))
    val ivfpq = recallOf(Pq.ivfAdcTopK(emb, queries, "vec_id", "embedding", 10,
      nprobe = 8, shortlist = 100))
    info(f"recall@10 — pure ADC: $adc%.3f, shortlist-100 rerank: $rr%.3f, IVFADC(8,100): $ivfpq%.3f")
    // measured on this corpus: adc 0.140, rerank 0.580, ivfpq 0.540
    // (near-orthogonal random embeddings are PQ's worst case; real
    // corpora sit far higher). IVFADC gives up a sliver of the
    // full-rerank's recall for touching only nprobe/nlist of the code
    // table per query.
    assert(adc >= 0.10, s"pure-ADC recall@10 = $adc")
    assert(rr >= 0.50, s"rerank recall@10 = $rr")
    assert(rr >= adc, "exact rerank can only add recall")
    assert(ivfpq >= 0.45, s"IVFADC recall@10 = $ivfpq")
  }

  test("adcIngestTopK over the stored code table ≡ adcTopKRerank(corpus, batch)") {
    val corpus = emb.filter(col("vec_id") % 13 =!= 0)
    val batch = emb.filter(col("vec_id") % 13 === 0)
    val stored = Pq.encode(corpus, "vec_id", "embedding")
    val ingest = Pq.adcIngestTopK(stored, corpus, batch,
        "vec_id", "embedding", k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val direct = Pq.adcTopKRerank(corpus, batch,
        "vec_id", "embedding", k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(ingest == direct, "stored-index search must equal encode-inline search")
    // every neighbor comes from the corpus, every query from the batch
    assert(ingest.forall { case (q, n, _, _) => q % 13 == 0 && n % 13 != 0 })
  }
}
