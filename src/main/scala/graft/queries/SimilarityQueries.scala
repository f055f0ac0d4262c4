package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Similarity

/** ANN search over the `embeddings` table (64-dim float vectors).
  * Queries = every 50th vector; k = 10. The brute-force pass is
  * oracle-verified (both engines fold the dot product left-to-right in
  * double); the SRP-LSH pass is rows-only (bucketing uses fixed-seed
  * hyperplanes DuckDB can't reproduce) and its recall is pinned by
  * scalatest against the brute-force output.
  */
object SimilarityQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    "q_ann_brute" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
      },
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         list_dot_product(qv, cv) /
        |           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_sim
        |  FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10"""),

    "q_ann_ivf" -> QueryDef.unverified(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
      }),

    // Embedding-space near-dup pairs (LSH candidates + exact cosine
    // filter) — rows-only (bucketing is engine-seeded); recall vs the
    // exact pass is pinned in SimilaritySpec. Threshold 0.4 is the
    // operating point for THIS corpus (random embeddings top out at
    // cosine ~0.51); real near-dup corpora run 0.9+. The bucket cap is
    // the production posture against degenerate mass-duplicate inputs
    // (a no-op on this corpus — buckets are orders of magnitude
    // smaller — so rows are unchanged at any tested SF).
    "q_embed_neardup" -> QueryDef.unverified(
      (s, dir) => graft.operators.Dedup.embeddingNearDups(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64,
        threshold = 0.4, planes = 4, tables = 16,
        maxBucketSize = Some(100000))),

    "q_ann_lsh" -> QueryDef.unverified(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", dim = 64, k = 10, planes = 4)
      })
  )
}
