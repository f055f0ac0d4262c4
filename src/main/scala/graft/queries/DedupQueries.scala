package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Dedup

/** Near-duplicate detection over `documents`. Every query here is
  * DuckDB-oracle-verified: the sketch queries run with
  * `portable = true` (md5-derived 60-bit base hash — both engines agree
  * on md5, and the affine family's constants are interpolated below
  * into the oracle SQL), so signatures, LSH candidates, and SimHash
  * values hash-match bit for bit. The operator API's default stays
  * xxhash64 (~3× cheaper); scalatest pins that the two hash families
  * agree on semantics (DedupSpec recall tests).
  */
object DedupQueries {

  private val P = graft.functions.SketchAggs.MersenneP // 2^31 − 1

  /** Shared CTE prefix: tokens → 3-gram shingles → distinct (id, shingle)
    * — identical to the q_ngram_jaccard oracle so the two stay in sync. */
  private val ShingleCtes =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
      |  FROM documents
      |), sh0 AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 3
      |    THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks
      |), sh AS (SELECT DISTINCT doc_id AS id, unnest(s) AS shingle FROM sh0),
      |hm AS (SELECT id, CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS hm FROM sh)"""
      .stripMargin

  /** The 64 affine min-hashes as DuckDB aggregate expressions, constants
    * lifted from the exact family MinHashAgg uses. */
  private val SigList: String = {
    import graft.functions.SketchAggs.{famA, famB}
    (0 until 64).map(i => s"min((${famA(i)}*hm + ${famB(i)}) % $P)")
      .mkString("[", ", ", "]")
  }

  /** "some band's 4-row slice matches" — OR over the 16 band slices. */
  private val AnyBandEqual: String =
    (0 until 16).map { b =>
      val lo = b * 4 + 1; val hi = b * 4 + 4
      s"a.sig[$lo:$hi] = b.sig[$lo:$hi]"
    }.mkString("(", " OR ", ")")

  /** SimHash bit-packing: per bit, the sign of the ±1 vote sum; the
    * portable base hash has 60 bits, so bits 60–63 are always 0 votes
    * (vote −1 per token) and never set — packing 0..59 is exact. */
  private val SimhashPack: String =
    (0 until 60).map { b =>
      s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")

  /** Exact duplicated-span CTEs (Dedup.duplicateSpans replay: positional
    * 5-grams, occurrence cap 50, diagonal runs, min span 8) — shared by
    * q_dup_spans and q_span_coverage so the two stay in sync. */
  private val DupSpanCtes =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
      |  FROM documents
      |), g0 AS (
      |  SELECT doc_id, [{'pos': i, 'gram': array_to_string(t[i:i+4], ' ')}
      |                  for i in generate_series(1, len(t) - 4)] AS gs
      |  FROM toks WHERE len(t) >= 5
      |), g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
      |freq AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
      |gc AS (SELECT g.* FROM g JOIN freq USING (gram)),
      |m AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS p1, b.pos AS p2,
      |         a.pos - b.pos AS diag
      |  FROM gc a JOIN gc b ON a.gram = b.gram AND a.doc_id < b.doc_id),
      |r AS (
      |  SELECT doc_a, doc_b, diag, p1, p2,
      |         p1 - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY p1) AS runkey
      |  FROM m),
      |sp AS (
      |  SELECT doc_a, doc_b,
      |         CAST(min(p1) AS BIGINT) AS a_start, CAST(min(p2) AS BIGINT) AS b_start,
      |         CAST(count(*) + 4 AS BIGINT) AS span_tokens
      |  FROM r GROUP BY doc_a, doc_b, diag, runkey
      |  HAVING count(*) + 4 >= 8)""".stripMargin

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

    // Prefix-filtered exact Jaccard join at tau = 1/2: the oracle is
    // the UNFILTERED textbook all-pairs query (no prefix anywhere), so
    // the hash match PROVES the prefix filter lossless — the BloomJoin
    // proof pattern. Threshold applied as integer cross-multiplication
    // on both sides; the output jaccard is the one IEEE division.
    "q_prefix_jaccard" -> QueryDef(
      (s, dir) => Dedup.prefixJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, tauNum = 1, tauDen = 2),
      s"""WITH $ShingleCtes,
        |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, common, s1.sz AS sz1, s2.sz AS sz2,
        |       CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) AS jaccard
        |FROM co JOIN sizes s1 ON s1.id = co.id1 JOIN sizes s2 ON s2.id = co.id2
        |WHERE common * 3 >= s1.sz + s2.sz"""),

    // The CAPPED PPJoin path: maxShingleDf drops stop-shingles from the
    // universe FIRST, then the exact threshold join runs over what
    // remains. The oracle applies the SAME universe restriction to the
    // textbook all-pairs query, so the hash match proves the capped
    // semantics precisely ("exact Jaccard over the df ≤ cap shingle
    // space"), not just that some pairs come out. Cap 2 genuinely bites
    // on this corpus (different pair set AND different sizes than
    // uncapped — the boilerplate-df tail is 3..7 here); at 100 TB the
    // same knob bounds a stop-shingle posting-list square.
    "q_prefix_jaccard_capped" -> QueryDef(
      (s, dir) => Dedup.prefixJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, tauNum = 1, tauDen = 2, maxShingleDf = Some(2)),
      s"""WITH $ShingleCtes,
        |dfq AS (SELECT shingle, count(*) AS c FROM sh GROUP BY 1),
        |shc AS (SELECT s.id, s.shingle FROM sh s JOIN dfq ON s.shingle = dfq.shingle WHERE dfq.c <= 2),
        |sizes AS (SELECT id, count(*) AS sz FROM shc GROUP BY 1),
        |co AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, common, s1.sz AS sz1, s2.sz AS sz2,
        |       CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) AS jaccard
        |FROM co JOIN sizes s1 ON s1.id = co.id1 JOIN sizes s2 ON s2.id = co.id2
        |WHERE common * 3 >= s1.sz + s2.sz"""),

    // Sorted-neighborhood dedup (merge/purge): rank every doc by a
    // 12-char normalized text prefix, candidate-pair each doc with its
    // 7 rank-successors, verify with exact 3-gram Jaccard >= 1/2. The
    // third candidate-generation family beside inverted-index
    // (q_ngram/prefix_jaccard) and LSH (q_minhash_lsh): ordering-based,
    // candidates <= n*(w-1) NO MATTER the key skew. The oracle replays
    // the total order with row_number() and the rank columns are part
    // of the hash, so the match proves the distributed two-level-scan
    // rank == the sequential rank, pair for pair.
    "q_sorted_neighborhood" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // coalesce: Spark sorts NULLs FIRST, DuckDB's ORDER BY defaults
        // to NULLS LAST — a NULL text (possible in a future testdata
        // regeneration) would shift EVERY rank between the engines.
        // '' sorts first in both, so the key is divergence-proof.
        val keyed = docs.select(col("doc_id"),
          coalesce(substring(trim(lower(col("text"))), 1, 12), lit("")).as("_k"))
        val cand = Dedup.sortedNeighborhoodPairs(keyed, "doc_id", "_k", windowSize = 8)
        val shp = graft.Caching.persistTracked(
          Dedup.hashedShingles(docs, "doc_id", "text", shingleN = 3))
        val sizes = shp.groupBy(col("id")).agg(count(lit(1)).as("sz"))
        val common = cand
          .join(shp.select(col("id").as("id1"), col("shingle")), Seq("id1"))
          .join(shp.select(col("id").as("id2"), col("shingle")), Seq("id2", "shingle"))
          .groupBy(col("id1"), col("id2"), col("rank1"), col("rank2"))
          .agg(count(lit(1)).as("common"))
        common
          .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
          .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), Seq("id2"))
          .filter(col("common") * 3 >= col("sz1") + col("sz2"))
          .select(col("id1"), col("id2"), col("rank1"), col("rank2"),
            col("common"), col("sz1"), col("sz2"),
            (col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
              .as("jaccard"))
      },
      s"""WITH $ShingleCtes,
        |rk AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY coalesce(substr(trim(lower(text)), 1, 12), ''), doc_id) - 1 AS BIGINT) AS rank
        |  FROM documents),
        |cand AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.rank AS rank1, b.rank AS rank2
        |  FROM rk a JOIN rk b ON b.rank > a.rank AND b.rank - a.rank < 8),
        |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
        |co AS (
        |  SELECT c.id1, c.id2, c.rank1, c.rank2, CAST(count(*) AS BIGINT) AS common
        |  FROM cand c JOIN sh s1 ON s1.id = c.id1
        |              JOIN sh s2 ON s2.id = c.id2 AND s2.shingle = s1.shingle
        |  GROUP BY 1, 2, 3, 4)
        |SELECT co.id1, co.id2, co.rank1, co.rank2, co.common, s1.sz AS sz1, s2.sz AS sz2,
        |       CAST(co.common AS DOUBLE) / (s1.sz + s2.sz - co.common) AS jaccard
        |FROM co JOIN sizes s1 ON s1.id = co.id1 JOIN sizes s2 ON s2.id = co.id2
        |WHERE co.common * 3 >= s1.sz + s2.sz"""),

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

    // The SAME curation pipeline with the 100 TB near-dup stage swapped
    // in: banded MinHash LSH (portable hash family) instead of the
    // exact inverted-index pass — candidates come from bucket joins, so
    // no shingle posting list ever squares. With the portable family
    // the whole pipeline INCLUDING the LSH stage is oracle-verified:
    // the drop-in claim is hash-checked, not asserted.
    "q_curation_lsh" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", portable = true)
        val losers = Dedup.lshCandidates(sigs, "doc_id", bands = 16, rowsPerBand = 4)
          .filter(col("est_jaccard") >= 0.5)
          .select(col("id2").as("doc_id")).distinct()
        docs.join(reps, Seq("doc_id"), "left_semi")
          .join(losers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= 30)
      },
      s"""WITH $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id),
        |losers AS (
        |  SELECT DISTINCT b.id AS doc_id
        |  FROM sigs a JOIN sigs b ON a.id < b.id
        |  WHERE $AnyBandEqual
        |    AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                       for i in generate_series(1, 64)]) AS DOUBLE) / 64 >= 0.5
        |),
        |reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT d.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN toks t ON t.doc_id = d.doc_id
        |WHERE d.doc_id IN (SELECT doc_id FROM reps)
        |  AND d.doc_id NOT IN (SELECT doc_id FROM losers)
        |  AND len(t.t) >= 30"""),

    // MinHash signatures (64 hashes, 3-gram shingles), portable hash
    // family so the oracle reproduces the signature bit for bit. The
    // registry projection joins the array to one string: the driver
    // canonicalizes results via a pandas sort, which cannot hash array
    // cells (round-1 crash) — the operator API keeps ARRAY<LONG>.
    "q_minhash_sig" -> QueryDef(
      (s, dir) => Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
          portable = true)
        .select(col("doc_id"),
          array_join(transform(col("sig"), x => x.cast("string")), ",").as("sig")),
      s"""WITH $ShingleCtes
        |SELECT id AS doc_id, array_to_string($SigList, ',') AS sig
        |FROM hm GROUP BY id"""),

    // Banded LSH candidates at the ~0.5 threshold (16 bands × 4 rows).
    // The oracle re-derives candidates first-principles: any of the 16
    // four-row signature slices equal (all-pairs is fine at oracle
    // scale; the engine side stays the keyed bucket join).
    "q_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.lshCandidates(
        Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
          portable = true),
        "doc_id", bands = 16, rowsPerBand = 4),
      s"""WITH $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id)
        |SELECT a.id AS id1, b.id AS id2,
        |       CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                      for i in generate_series(1, 64)]) AS DOUBLE) / 64 AS est_jaccard
        |FROM sigs a JOIN sigs b ON a.id < b.id
        |WHERE $AnyBandEqual"""),

    // Incremental near-dup ingest on the SKETCH index: the new batch
    // (doc_id % 10 >= 8) band-joins against the corpus's precomputed
    // 64-long MinHash signatures — at 100 TB the exact inverted index
    // (q_incremental_dedup) carries the corpus's full posting set,
    // this one carries 512 B/doc and is reused by every batch. Same
    // portable-hash family, so the oracle replays signatures for both
    // sides and re-checks band agreement + the estimate threshold.
    "q_incremental_lsh" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def sigs(f: org.apache.spark.sql.DataFrame) =
          Dedup.minhashSignatures(f, "doc_id", "text", portable = true)
        Dedup.lshCandidatesAgainst(
            sigs(docs.filter(col("doc_id") % 10 < 8)),
            sigs(docs.filter(col("doc_id") % 10 >= 8)),
            "doc_id", bands = 16, rowsPerBand = 4)
          .filter(col("est_jaccard") >= 0.5)
      },
      s"""WITH $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id)
        |SELECT a.id AS corpus_id, b.id AS new_id,
        |       CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                      for i in generate_series(1, 64)]) AS DOUBLE) / 64 AS est_jaccard
        |FROM sigs a JOIN sigs b ON a.id % 10 < 8 AND b.id % 10 >= 8
        |WHERE $AnyBandEqual
        |  AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                     for i in generate_series(1, 64)]) AS DOUBLE) / 64 >= 0.5"""),

    // The 100 TB dedup scale path closed end to end, hash-verified:
    // portable MinHash signatures → banded LSH candidates (est_jaccard
    // >= 0.5) → connected components → cluster ids. q_dedup_clusters is
    // the exact-pairs formulation; THIS one is the plan that actually
    // runs at scale (candidate generation is bucket-keyed, never
    // all-pairs), and the same recursive-closure oracle still pins it.
    "q_lsh_clusters" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.lshCandidates(
            Dedup.minhashSignatures(docs, "doc_id", "text", portable = true),
            "doc_id", bands = 16, rowsPerBand = 4)
          .filter(col("est_jaccard") >= 0.5)
          .select(col("id1"), col("id2"))
        Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
      },
      s"""WITH RECURSIVE $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM sigs a JOIN sigs b ON a.id < b.id
        |  WHERE $AnyBandEqual
        |    AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                       for i in generate_series(1, 64)]) AS DOUBLE) / 64 >= 0.5),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS r FROM documents
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id"""),

    // Same LSH pair graph, clustered by alternating large-star /
    // small-star contraction instead of min-label propagation — the
    // O(log n)-round path for graphs deeper than a near-dup cluster
    // (see Dedup.connectedComponentsStar). Identical cluster ids, so
    // the same recursive-closure oracle pins both algorithms.
    "q_star_clusters" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.lshCandidates(
            Dedup.minhashSignatures(docs, "doc_id", "text", portable = true),
            "doc_id", bands = 16, rowsPerBand = 4)
          .filter(col("est_jaccard") >= 0.5)
          .select(col("id1"), col("id2"))
        Dedup.connectedComponentsStar(pairs, docs.select(col("doc_id")), "doc_id")
      },
      s"""WITH RECURSIVE $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM sigs a JOIN sigs b ON a.id < b.id
        |  WHERE $AnyBandEqual
        |    AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                       for i in generate_series(1, 64)]) AS DOUBLE) / 64 >= 0.5),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS r FROM documents
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id"""),

    // Standing-index DELETION (r13 verdict task 5): take down the
    // doc_id % 17 = 3 slice of the corpus and maintain the q_lsh_clusters
    // assignment DECREMENTALLY — Dedup.removeDocs re-clusters only the
    // components that lost a member (a removed bridge splits its
    // component; a removed minimum relabels it) and leaves every
    // untouched component unread. The oracle recomputes the FULL
    // recursive closure over the surviving edge set from scratch, so
    // the hash match is the scoped ≡ global recompute equivalence
    // proof, on the engine's own standing labels.
    "q_remove_docs" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.lshCandidates(
            Dedup.minhashSignatures(docs, "doc_id", "text", portable = true),
            "doc_id", bands = 16, rowsPerBand = 4)
          .filter(col("est_jaccard") >= 0.5)
          .select(col("id1"), col("id2"))
        // the standing state a real pipeline stores: labels + dup edges.
        // Persisted — removeDocs reads labels thrice and edges once, and
        // recomputing the LSH pipeline per read would double-charge the
        // deletion with ingest cost.
        val standingPairs = graft.Caching.persistTracked(pairs)
        val labels = graft.Caching.persistTracked(
          Dedup.connectedComponents(standingPairs, docs.select(col("doc_id")), "doc_id"))
        Dedup.removeDocs(labels, standingPairs,
          docs.filter(col("doc_id") % 17 === 3).select(col("doc_id")), "doc_id")
      },
      s"""WITH RECURSIVE $ShingleCtes,
        |sigs AS (SELECT id, $SigList AS sig FROM hm GROUP BY id),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM sigs a JOIN sigs b ON a.id < b.id
        |  WHERE $AnyBandEqual
        |    AND CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
        |                       for i in generate_series(1, 64)]) AS DOUBLE) / 64 >= 0.5),
        |surv AS (SELECT id1, id2 FROM pairs WHERE id1 % 17 <> 3 AND id2 % 17 <> 3),
        |edges AS (SELECT id1 AS a, id2 AS b FROM surv
        |          UNION ALL SELECT id2, id1 FROM surv),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS r FROM documents WHERE doc_id % 17 <> 3
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id"""),

    // 64-bit SimHash per document (portable hash family; the oracle
    // recomputes the per-bit vote sums and packs the sign bits).
    "q_simhash" -> QueryDef(
      (s, dir) => Dedup.simhash(Tables.documents(s, dir), "doc_id", "text",
        portable = true),
      s"""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS t
        |  FROM documents
        |), tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
        |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h FROM tok),
        |sig AS (SELECT doc_id, $SimhashPack AS simhash FROM h GROUP BY doc_id)
        |-- left join from DISTINCT ids: zero-token docs must not vanish
        |-- (engine contract, simhash 0 = "no votes cast") and the engine
        |-- emits ONE row per id even under repeated doc ids — a raw
        |-- documents source would emit one per input row and diverge
        |SELECT d.doc_id, CAST(coalesce(sig.simhash, 0) AS BIGINT) AS simhash
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN sig ON sig.doc_id = d.doc_id"""),

    // Exact substring containment (operators/Dedup.containmentPairs):
    // the duplicate class Jaccard under-scores — a short doc embedded
    // whole inside a longer one. Anchor = the contained doc's first 10
    // tokens; the index join is one shingle per anchor against the
    // corpus's sliding windows (posting-bounded, never all-pairs); the
    // exact contains() check runs only on surviving candidates. The
    // oracle replays anchor, sliding index, and contains end to end.
    "q_containment" -> QueryDef(
      (s, dir) => Dedup.containmentPairs(
        Tables.documents(s, dir), "doc_id", "text", anchorN = 10),
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents
        |), canon AS (
        |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n, array_to_string(t, ' ') AS c FROM toks
        |), anch AS (
        |  SELECT doc_id AS in_id, n AS in_n, array_to_string(t[1:10], ' ') AS shingle
        |  FROM canon WHERE n >= 10
        |), idx0 AS (
        |  SELECT doc_id AS out_id, n AS out_n,
        |         [array_to_string(t[i:i+9], ' ') for i in generate_series(1, n - 9)] AS shs
        |  FROM canon WHERE n >= 10
        |), idx AS (
        |  SELECT DISTINCT out_id, out_n, unnest(shs) AS shingle FROM idx0
        |), cand AS (
        |  SELECT DISTINCT in_id, out_id
        |  FROM anch JOIN idx USING (shingle)
        |  WHERE in_id <> out_id AND (out_n > in_n OR (out_n = in_n AND in_id < out_id))
        |)
        |SELECT in_id AS contained_id, out_id AS container_id,
        |       a.n AS n_contained, b.n AS n_container
        |FROM cand
        |JOIN canon a ON a.doc_id = in_id
        |JOIN canon b ON b.doc_id = out_id
        |WHERE contains(' ' || b.c || ' ', ' ' || a.c || ' ')"""),

    // Exact duplicated spans (substring-level dedup, Lee et al. ACL
    // 2022): maximal runs of consecutive positional 5-gram matches per
    // (doc pair, diagonal) — pure integer positions and counts, so the
    // whole span geometry is hash-verified. The oracle replays the
    // gapless-islands window (pos − row_number constant within a run).
    "q_dup_spans" -> QueryDef(
      (s, dir) => Dedup.duplicateSpans(
        Tables.documents(s, dir), "doc_id", "text",
        gramN = 5, minSpanTokens = 8, maxGramFreq = 50),
      s"""WITH $DupSpanCtes
        |SELECT doc_a, doc_b, a_start, b_start, span_tokens FROM sp"""),

    // Ingest-time duplicated spans: new batch (doc_id % 13 = 0) vs the
    // standing corpus only — no corpus×corpus pairs; the gram cap comes
    // from the corpus-side index. Same all-integer span geometry.
    "q_incremental_spans" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.duplicateSpansAgainst(
          docs.filter(col("doc_id") % 13 =!= 0),
          docs.filter(col("doc_id") % 13 === 0),
          "doc_id", "text", gramN = 5, minSpanTokens = 8, maxGramFreq = 50)
      },
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id, [{'pos': i, 'gram': array_to_string(t[i:i+4], ' ')}
        |                  for i in generate_series(1, len(t) - 4)] AS gs
        |  FROM toks WHERE len(t) >= 5
        |), g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
        |cg AS (SELECT * FROM g WHERE doc_id % 13 <> 0),
        |bg AS (SELECT * FROM g WHERE doc_id % 13 = 0),
        |freq AS (SELECT gram FROM cg GROUP BY gram HAVING count(*) <= 50),
        |m AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS p1, b.pos AS p2,
        |         a.pos - b.pos AS diag
        |  FROM cg a JOIN freq USING (gram) JOIN bg b ON a.gram = b.gram
        |  WHERE a.doc_id <> b.doc_id),
        |r AS (
        |  SELECT doc_a, doc_b, diag, p1, p2,
        |         p1 - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY p1) AS runkey
        |  FROM m)
        |SELECT doc_a, doc_b,
        |       CAST(min(p1) AS BIGINT) AS a_start, CAST(min(p2) AS BIGINT) AS b_start,
        |       CAST(count(*) + 4 AS BIGINT) AS span_tokens
        |FROM r GROUP BY doc_a, doc_b, diag, runkey
        |HAVING count(*) + 4 >= 8"""),

    // Intra-doc repetition profile: longest verbatim self-repeated
    // span per doc (positional 2-grams here — the synthetic docs are
    // 10–99 tokens, so bigram-level repeats are the live signal; real
    // corpora run the 5-gram default), per-doc gram-frequency cap
    // replayed, hyper-repetition reported exactly via max_gram_freq.
    "q_self_repetition" -> QueryDef(
      (s, dir) => Dedup.selfRepetitionProfile(
        Tables.documents(s, dir), "doc_id", "text",
        gramN = 2, minSpanTokens = 2, maxGramFreqInDoc = 20),
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS t
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id, [{'pos': i, 'gram': array_to_string(t[i:i+1], ' ')}
        |                  for i in generate_series(1, len(t) - 1)] AS gs
        |  FROM toks WHERE len(t) >= 2
        |), g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
        |pf AS (SELECT doc_id, gram, count(*) AS f FROM g GROUP BY 1, 2),
        |gm AS (SELECT doc_id, CAST(max(f) AS BIGINT) AS mgf FROM pf GROUP BY 1),
        |gc AS (SELECT g.doc_id, g.pos, g.gram FROM g JOIN pf USING (doc_id, gram) WHERE pf.f <= 20),
        |m AS (
        |  SELECT a.doc_id, a.pos AS p1, b.pos - a.pos AS diag
        |  FROM gc a JOIN gc b ON a.doc_id = b.doc_id AND a.gram = b.gram AND a.pos < b.pos),
        |r AS (
        |  SELECT doc_id, diag, p1,
        |         p1 - row_number() OVER (PARTITION BY doc_id, diag ORDER BY p1) AS runkey
        |  FROM m),
        |sp AS (
        |  SELECT doc_id, CAST(count(*) + 1 AS BIGINT) AS span_tokens
        |  FROM r GROUP BY doc_id, diag, runkey
        |  HAVING count(*) + 1 >= 2),
        |sa AS (SELECT doc_id, max(span_tokens) AS mrt,
        |              count(*) AS nrs FROM sp GROUP BY 1),
        |tl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
        |SELECT tl.doc_id, n_tokens,
        |       coalesce(mgf, 0) AS max_gram_freq,
        |       coalesce(mrt, 0) AS max_rep_tokens,
        |       coalesce(nrs, 0) AS n_rep_spans,
        |       CASE WHEN n_tokens > 0 THEN CAST(coalesce(mrt, 0) AS DOUBLE) / n_tokens
        |            ELSE 0.0 END AS rep_frac
        |FROM tl LEFT JOIN gm USING (doc_id) LEFT JOIN sa USING (doc_id)"""),

    // Per-doc duplicated-token coverage (the curation gate over
    // q_dup_spans): span intervals from both pair sides union per doc
    // via the islands window — integer geometry, one final division.
    "q_span_coverage" -> QueryDef(
      (s, dir) => Dedup.spanCoverage(
        Tables.documents(s, dir), "doc_id", "text",
        gramN = 5, minSpanTokens = 8, maxGramFreq = 50),
      s"""WITH $DupSpanCtes,
        |iv0 AS (
        |  SELECT doc_a AS doc_id, a_start AS s, a_start + span_tokens - 1 AS e FROM sp
        |  UNION ALL
        |  SELECT doc_b, b_start, b_start + span_tokens - 1 FROM sp),
        |iv AS (SELECT DISTINCT doc_id, s, e FROM iv0),
        |isl AS (
        |  SELECT doc_id, s, e,
        |         CAST(CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS BIGINT) AS new_isl
        |  FROM iv),
        |isl2 AS (
        |  SELECT doc_id, s, e,
        |         CAST(sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM isl),
        |cov AS (
        |  SELECT doc_id, CAST(sum(ilen) AS BIGINT) AS dup_tokens FROM (
        |    SELECT doc_id, island, max(e) - min(s) + 1 AS ilen
        |    FROM isl2 GROUP BY doc_id, island)
        |  GROUP BY doc_id)
        |SELECT c.doc_id, dup_tokens, CAST(len(t) AS BIGINT) AS n_tokens,
        |       CAST(dup_tokens AS DOUBLE) / CAST(len(t) AS DOUBLE) AS dup_frac
        |FROM cov c JOIN toks ON toks.doc_id = c.doc_id""")
  )
}
