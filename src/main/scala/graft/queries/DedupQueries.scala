package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Dedup

/** Near-duplicate detection over `documents`. The exact n-gram Jaccard
  * pass is DuckDB-oracle-verified; MinHash/SimHash use engine-specific
  * hash functions (xxhash64 + fixed affine family) that DuckDB cannot
  * reproduce, so those queries carry the weaker rows-only check — their
  * *semantics* are pinned by scalatest instead (MinHashSpec: LSH
  * candidates ⊇ truly-similar pairs from the exact pass).
  */
object DedupQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Exact 3-gram Jaccard ≥ 0.5 pairs via the inverted-index join.
    "q_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text", shingleN = 3, minJaccard = 0.5),
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents
        |), sh0 AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 3
        |    THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
        |    ELSE [array_to_string(t, ' ')] END AS s
        |  FROM toks
        |), sh AS (SELECT DISTINCT doc_id AS id, unnest(s) AS shingle FROM sh0),
        |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, common, s1.sz AS sz1, s2.sz AS sz2,
        |       common / (s1.sz + s2.sz - common) AS jaccard
        |FROM co JOIN sizes s1 ON s1.id = co.id1 JOIN sizes s2 ON s2.id = co.id2
        |WHERE common / (s1.sz + s2.sz - common) >= 0.5"""),

    // The composite curation pipeline — what this engine exists for:
    //   exact dedup (min-id representative per text)
    //   → near-dup removal (drop the higher id of each ≥0.5-Jaccard pair)
    //   → quality gate (≥ 30 tokens)
    // Every stage is keyed/distributed; the near-dup stage here is the
    // exact inverted-index pass so the WHOLE pipeline is oracle-checked
    // (the LSH stage is the drop-in at 100 TB, same output contract).
    "q_curation_pipeline" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val losers = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, minJaccard = 0.5)
          .select(col("id2").as("doc_id")).distinct()
        docs.join(reps, Seq("doc_id"), "left_semi")
          .join(losers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= 30)
      },
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents
        |), sh0 AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 3
        |    THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
        |    ELSE [array_to_string(t, ' ')] END AS s
        |  FROM toks
        |), sh AS (SELECT DISTINCT doc_id AS id, unnest(s) AS shingle FROM sh0),
        |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (SELECT a.id AS id1, b.id AS id2, count(*) AS common
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2),
        |losers AS (
        |  SELECT DISTINCT co.id2 AS doc_id
        |  FROM co JOIN sizes s1 ON s1.id = co.id1 JOIN sizes s2 ON s2.id = co.id2
        |  WHERE common / (s1.sz + s2.sz - common) >= 0.5),
        |reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT d.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN toks t ON t.doc_id = d.doc_id
        |WHERE d.doc_id IN (SELECT doc_id FROM reps)
        |  AND d.doc_id NOT IN (SELECT doc_id FROM losers)
        |  AND len(t.t) >= 30"""),

    // MinHash signatures (64 hashes, 3-gram shingles). The registry
    // projection joins the array to one string: the driver canonicalizes
    // results via a pandas sort, which cannot hash array cells (round-1
    // crash) — the operator API (Dedup.minhashSignatures) keeps the
    // typed ARRAY<LONG> column.
    "q_minhash_sig" -> QueryDef.unverified(
      (s, dir) => Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"),
          array_join(transform(col("sig"), x => x.cast("string")), ",").as("sig"))),

    // Banded LSH candidates at the ~0.5 threshold (16 bands × 4 rows).
    "q_minhash_lsh" -> QueryDef.unverified(
      (s, dir) => Dedup.lshCandidates(
        Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id", bands = 16, rowsPerBand = 4)),

    // 64-bit SimHash per document.
    "q_simhash" -> QueryDef.unverified(
      (s, dir) => Dedup.simhash(Tables.documents(s, dir), "doc_id", "text"))
  )
}
