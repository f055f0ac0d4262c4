package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Similarity

/** ANN search over the `embeddings` table (64-dim float vectors).
  * Queries = every 50th vector; k = 10.
  *
  * ALL of the cosine family is DuckDB-oracle-verified, including the
  * SRP-LSH paths: the fixed-seed hyperplanes are engine-side constants
  * (`Similarity.hyperplanes`, Random(42)), so the oracle interpolates
  * the SAME doubles as DuckDB list literals and replays each plane's
  * sign test with `list_dot_product` — already proven bit-identical to
  * the engine's sequential double fold by q_ann_brute (both engines
  * accumulate left-to-right in double). Same SigList/SimhashPack
  * technique that graduated MinHash/SimHash (DedupQueries).
  */
object SimilarityQueries {

  /** Render one SRP code array as DuckDB SQL over a DOUBLE[] column
    * `v`: element t = the `planes`-bit sign code of table t, exactly
    * [[graft.functions.SrpCode]]'s fold (ascending index, double
    * accumulate, `>= 0` sign test). Scala's Double.toString is
    * shortest-round-trip, so DuckDB parses back the identical bits. */
  private[queries] def srpCodesSql(dim: Int, planes: Int, tables: Int): String = {
    val hp = Similarity.hyperplanes(dim, planes, tables)
    (0 until tables).map { t =>
      (0 until planes).map { p =>
        val plane = hp(t)(p).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }.mkString("[", ", ", "]")
  }

  private val CosineSql =
    "list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))"

  /** IVF-search CTE chain, parameterized by nprobe — replays the frozen
    * [[graft.operators.IvfCentroids]] assignment (rank over cosine to
    * each centroid, cell tie-break) and the cell-keyed candidate join.
    * Every CTE name carries prefix `p` so two chains (or this plus the
    * brute chain) compose in ONE oracle without collisions
    * (q_ann_recall); the chain ends in `${p}topk` with
    * (query_id, neighbor_id, cos_sim, rank ≤ 10). */
  private def ivfTopkCtes(nprobe: Int, p: String): String =
    s"""${p}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |${p}cents AS (${graft.operators.IvfCentroids.duckdbValues}),
      |${p}casgn AS (
      |  SELECT vec_id AS neighbor_id, cell FROM (
      |    SELECT e.vec_id, cents.cell,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
      |             cents.cell) AS crank
      |    FROM ${p}e e CROSS JOIN ${p}cents cents)
      |  WHERE crank <= 1),
      |${p}qasgn AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT e.vec_id, cents.cell,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
      |             cents.cell) AS crank
      |    FROM ${p}e e CROSS JOIN ${p}cents cents WHERE e.vec_id % 50 = 0)
      |  WHERE crank <= $nprobe),
      |${p}cand AS (
      |  SELECT DISTINCT q.query_id, c.neighbor_id
      |  FROM ${p}qasgn q JOIN ${p}casgn c ON q.cell = c.cell
      |  WHERE q.query_id <> c.neighbor_id),
      |${p}scored AS (
      |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
      |  FROM ${p}cand cand JOIN ${p}e qe ON qe.vec_id = cand.query_id
      |            JOIN ${p}e ce ON ce.vec_id = cand.neighbor_id),
      |${p}topk AS (
      |  SELECT query_id, neighbor_id, cos_sim, rank FROM (
      |    SELECT query_id, neighbor_id, cos_sim,
      |           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      |    FROM ${p}scored)
      |  WHERE rank <= 10)"""

  private def ivfOracleSql(nprobe: Int): String =
    s"""WITH ${ivfTopkCtes(nprobe, "")}
      |SELECT query_id, neighbor_id, cos_sim, rank FROM topk"""

  /** Brute-force top-10 CTE chain (the q_ann_brute query body), prefix
    * `p` as in [[ivfTopkCtes]]; ends in `${p}topk`. */
  private def bruteTopkCtes(p: String): String =
    s"""${p}q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |${p}c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |${p}scored AS (
      |  SELECT query_id, neighbor_id,
      |         list_dot_product(qv, cv) /
      |           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_sim
      |  FROM ${p}q, ${p}c WHERE query_id <> neighbor_id),
      |${p}topk AS (
      |  SELECT query_id, neighbor_id, cos_sim, rank FROM (
      |    SELECT query_id, neighbor_id, cos_sim,
      |           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      |    FROM ${p}scored)
      |  WHERE rank <= 10)"""

  /** Shared PQ oracle CTEs: frozen-codebook assignment (score =
    * list_dot_product − half_cc, lowest-code tie-break) folded to one
    * row per vector with codes + reconstruction norm. The cc pivot
    * sums in FIXED subspace order — the same ((cc0+cc1)+cc2)+cc3 fold
    * [[graft.operators.Pq.encode]] runs. */
  private val PqCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (${graft.operators.PqCodebooks.duckdbValues}),
      |sub AS (SELECT e.vec_id, t.m, list_slice(e.v, t.m*16+1, t.m*16+16) AS sv
      |        FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) t(m)),
      |asgn AS (
      |  SELECT vec_id, m, code, cc FROM (
      |    SELECT s.vec_id, s.m, cb.code, cb.cc,
      |           row_number() OVER (PARTITION BY s.vec_id, s.m
      |             ORDER BY list_dot_product(s.sv, cb.c) - cb.half_cc DESC, cb.code) AS rk
      |    FROM sub s JOIN cb ON cb.m = s.m)
      |  WHERE rk = 1),
      |pqcodes AS (
      |  SELECT vec_id,
      |         CAST(max(CASE WHEN m = 0 THEN code END) AS BIGINT) AS code_0,
      |         CAST(max(CASE WHEN m = 1 THEN code END) AS BIGINT) AS code_1,
      |         CAST(max(CASE WHEN m = 2 THEN code END) AS BIGINT) AS code_2,
      |         CAST(max(CASE WHEN m = 3 THEN code END) AS BIGINT) AS code_3,
      |         sqrt(((max(CASE WHEN m = 0 THEN cc END) + max(CASE WHEN m = 1 THEN cc END))
      |               + max(CASE WHEN m = 2 THEN cc END)) + max(CASE WHEN m = 3 THEN cc END)) AS recon_norm
      |  FROM asgn GROUP BY vec_id)"""

  /** ADC scoring CTEs on top of [[PqCtes]]: per-query norm + the
    * 4-lookup fixed-order score — list_dot_product(q_sub, centroid)
    * replays the engine's per-query LUT entries exactly. */
  private val PqAdcCtes =
    s"""$PqCtes,
      |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qnorm
      |      FROM e WHERE vec_id % 50 = 0),
      |adc AS (
      |  SELECT q.query_id, x.vec_id AS neighbor_id,
      |         (((list_dot_product(list_slice(q.qv, 1, 16), b0.c)
      |            + list_dot_product(list_slice(q.qv, 17, 32), b1.c))
      |            + list_dot_product(list_slice(q.qv, 33, 48), b2.c))
      |            + list_dot_product(list_slice(q.qv, 49, 64), b3.c))
      |           / (q.qnorm * x.recon_norm) AS adc_sim
      |  FROM pqcodes x CROSS JOIN q
      |  JOIN cb b0 ON b0.m = 0 AND b0.code = x.code_0
      |  JOIN cb b1 ON b1.m = 1 AND b1.code = x.code_1
      |  JOIN cb b2 ON b2.m = 2 AND b2.code = x.code_2
      |  JOIN cb b3 ON b3.m = 3 AND b3.code = x.code_3
      |  WHERE x.vec_id <> q.query_id)"""

  /** [[PqAdcCtes]] for the INGEST posture: queries = the new batch
    * (vec_id % 13 = 0), ADC candidates restricted to the standing
    * corpus (vec_id % 13 ≠ 0) — no corpus×corpus and no batch×batch
    * pairs, mirroring Pq.adcIngestTopK's stored-index search. */
  private val PqIngestAdcCtes =
    s"""$PqCtes,
      |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qnorm
      |      FROM e WHERE vec_id % 13 = 0),
      |adc AS (
      |  SELECT q.query_id, x.vec_id AS neighbor_id,
      |         (((list_dot_product(list_slice(q.qv, 1, 16), b0.c)
      |            + list_dot_product(list_slice(q.qv, 17, 32), b1.c))
      |            + list_dot_product(list_slice(q.qv, 33, 48), b2.c))
      |            + list_dot_product(list_slice(q.qv, 49, 64), b3.c))
      |           / (q.qnorm * x.recon_norm) AS adc_sim
      |  FROM pqcodes x CROSS JOIN q
      |  JOIN cb b0 ON b0.m = 0 AND b0.code = x.code_0
      |  JOIN cb b1 ON b1.m = 1 AND b1.code = x.code_1
      |  JOIN cb b2 ON b2.m = 2 AND b2.code = x.code_2
      |  JOIN cb b3 ON b3.m = 3 AND b3.code = x.code_3
      |  WHERE x.vec_id % 13 <> 0)"""

  /** The frozen >FlatAssignCeiling operating point for q_semdedup_hier:
    * hash-derived deterministic quantizer (k = 4100 > 4096 forces the
    * two-level tier; the corpus is gate-SF-sized, so this is a CODE-PATH
    * gate, not a sizing claim — SCALE.md carries the sizing evidence).
    * Lazy: 262k driver-side md5 calls, computed once per JVM. */
  private[queries] lazy val HierCentroids =
    graft.operators.Similarity.hashCentroids(4100, 64)

  /** DuckDB replay of the FULL hierarchical semantic-dedup chain:
    * [[Similarity.hashCentroids]] (md5 + integer arithmetic — the
    * portable-hash family) → [[Similarity.coarsen]]'s driver Lloyd
    * (`rounds` unrolled MATERIALIZED CTE pairs, the q_bpe_train
    * pattern) → two-level coarse→fine assignment → intra-cell dup
    * edges → min-id survivor rule. Bit-exactness rests on two pillars:
    * every hashCentroids component is a dyadic rational, so Lloyd's
    * per-round means (always recomputed from the ORIGINALS) are
    * order-independent exact under plain `sum()`; and every cosine is
    * a sequential ascending-index fold on both engines
    * (list_dot_product ≡ the fused CosineSimilarity loop). Faithful
    * corners: coarsen's `dot/sqrt/sqrt` two-division form with the
    * −2.0 zero-norm guard vs CosineSimilarity's `dot/(sqrt·sqrt)`;
    * the returned grouping is the LAST round's assignment (computed
    * against round R−1 means) while the returned coarse centers are
    * the round-R means, float32-rounded. */
  /** Quantizer-rebuild CTE chain shared by the two hierarchical oracles
    * (q_semdedup_hier, q_ann_ivf_hier): hashCentroids reconstruction
    * from md5 + integer arithmetic (fcv/fc), [[Similarity.coarsen]]'s
    * driver Lloyd as `rounds` unrolled MATERIALIZED CTE pairs
    * (a1..aR / m1..mR), and the float32-rounded coarse centers (gc).
    * Needs an upstream `e(vec_id, v)` CTE; the LAST round's assignment
    * aR is the cell→group map (coarsen returns round-R means but the
    * round-R assignment computed against round R−1 means — replayed
    * faithfully). */
  private[queries] def hierQuantizerCtes(k: Int, dim: Int, rounds: Int, tag: String): String = {
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val roundCtes = (1 to rounds).map { r =>
      s"""a$r AS MATERIALIZED (
        |  SELECT c, j FROM (
        |    SELECT c, j, row_number() OVER (PARTITION BY c ORDER BY s DESC, j) AS rn
        |    FROM (SELECT fc.c, m.j,
        |            CASE WHEN list_dot_product(m.m, m.m) = 0 OR list_dot_product(fc.ctr, fc.ctr) = 0
        |                 THEN CAST('-2.0' AS DOUBLE)
        |                 ELSE list_dot_product(m.m, fc.ctr) / sqrt(list_dot_product(m.m, m.m)) / sqrt(list_dot_product(fc.ctr, fc.ctr)) END AS s
        |          FROM fc CROSS JOIN m${r - 1} m))
        |  WHERE rn = 1),
        |m$r AS MATERIALIZED (
        |  SELECT mp.j, coalesce(nm.m, mp.m) AS m
        |  FROM m${r - 1} mp LEFT JOIN (
        |    SELECT j, list(mx ORDER BY d) AS m
        |    FROM (SELECT a.j, fcv.d, sum(fcv.x) / count(*) AS mx
        |          FROM a$r a JOIN fcv ON fcv.c = a.c GROUP BY a.j, fcv.d)
        |    GROUP BY j) nm ON nm.j = mp.j)""".stripMargin
    }.mkString(",\n")
    s"""fcv AS MATERIALIZED (
      |  SELECT cd // $dim AS c, cd % $dim AS d,
      |         (CAST(CAST(concat('0x', substr(md5('$tag:' || CAST(cd // $dim AS VARCHAR) || ':' || CAST(cd % $dim AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS DOUBLE)
      |          - CAST('127.5' AS DOUBLE)) / CAST('128.0' AS DOUBLE) AS x
      |  FROM generate_series(0, ${k * dim - 1}) AS t(cd)),
      |fc AS MATERIALIZED (SELECT c, list(x ORDER BY d) AS ctr FROM fcv GROUP BY c),
      |m0 AS MATERIALIZED (SELECT j, (SELECT ctr FROM fc WHERE c = least($k - 1, (j * $k) // $g)) AS m
      |       FROM generate_series(0, ${g - 1}) AS t(j)),
      |$roundCtes,
      |gc AS (SELECT j, list_transform(m, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS gm FROM m$rounds)""".stripMargin
  }

  /** Two-level (coarse→fine) assignment CTE pair on top of
    * [[hierQuantizerCtes]] — [[Similarity.assignCellsHierarchical]]'s
    * probe path: rank the coarse groups (top `coarseProbes`, group-id
    * tie-break), then rank ONLY the probed groups' fine centroids (top
    * `fineProbes`, cell tie-break). `srcFilter` restricts the assigned
    * rows (the ANN query side); CTE names carry prefix `p` so corpus
    * and query chains compose in one oracle. */
  private[queries] def hierAssignCtes(p: String, srcFilter: String, coarseProbes: Int,
                             fineProbes: Int, rounds: Int,
                             keepRank: Boolean = false): String = {
    val rankCol = if (keepRank) ", CAST(rn AS BIGINT) AS rank" else ""
    s"""${p}pg AS (SELECT vec_id, j FROM (
      |    SELECT e.vec_id, gc.j,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, gc.gm) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(gc.gm, gc.gm))) DESC, gc.j) AS rn
      |    FROM e CROSS JOIN gc$srcFilter) WHERE rn <= $coarseProbes),
      |${p}asgn AS MATERIALIZED (SELECT vec_id, cell$rankCol FROM (
      |    SELECT pg.vec_id, fc.c AS cell,
      |      row_number() OVER (PARTITION BY pg.vec_id ORDER BY
      |        list_dot_product(e.v, fc.ctr) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(fc.ctr, fc.ctr))) DESC, fc.c) AS rn
      |    FROM ${p}pg pg JOIN a$rounds cg ON cg.j = pg.j JOIN fc ON fc.c = cg.c JOIN e ON e.vec_id = pg.vec_id)
      |  WHERE rn <= $fineProbes)""".stripMargin
  }

  /** The two-probe boundary-pair rule ([[SemDedup.dedupHier]] default,
    * r13 verdict task 1): each id probes its top-`fineProbes` fine
    * cells; a pair is a candidate when ANY probed cell is shared; the
    * survivor output is the rank-1 assignment minus distinct higher-ids
    * of qualifying pairs. The duplicate pair a shared-both-cells twin
    * generates is absorbed by NOT IN. */
  private def hierOracleSql(k: Int, dim: Int, rounds: Int,
                            coarseProbes: Int, tag: String,
                            fineProbes: Int = 2): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |${hierQuantizerCtes(k, dim, rounds, tag)},
      |${hierAssignCtes("", "", coarseProbes, fineProbes, rounds, keepRank = true)},
      |edges AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  JOIN e qe ON qe.vec_id = a.vec_id
      |  JOIN e ce ON ce.vec_id = b.vec_id
      |  WHERE list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
      |SELECT vec_id, CAST(cell AS BIGINT) AS cell
      |FROM asgn
      |WHERE rank = 1 AND vec_id NOT IN (SELECT id2 FROM edges)""".stripMargin

  /** The hierarchical INGEST rule ([[SemDedup.dedupIngestHier]]): the
    * same quantizer-rebuild + two-level probed assignment as
    * [[hierOracleSql]] over ALL ids (assignment is per-row against the
    * centroids alone, so assigning the sides separately ≡ restricting
    * one full assignment), then the ingest survivor rule on the batch
    * side: drop on an edge to ANY standing id or a SMALLER batch id. */
  private def hierIngestOracleSql(k: Int, dim: Int, rounds: Int,
                                  coarseProbes: Int, tag: String,
                                  fineProbes: Int = 2): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |${hierQuantizerCtes(k, dim, rounds, tag)},
      |${hierAssignCtes("", "", coarseProbes, fineProbes, rounds, keepRank = true)},
      |edges_int AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  JOIN e qe ON qe.vec_id = a.vec_id
      |  JOIN e ce ON ce.vec_id = b.vec_id
      |  WHERE a.vec_id % 10 >= 8 AND b.vec_id % 10 >= 8
      |    AND list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4),
      |edges_corpus AS (
      |  SELECT a.vec_id AS corpus_id, b.vec_id AS new_id
      |  FROM asgn a JOIN asgn b ON a.cell = b.cell
      |  JOIN e qe ON qe.vec_id = a.vec_id
      |  JOIN e ce ON ce.vec_id = b.vec_id
      |  WHERE a.vec_id % 10 < 8 AND b.vec_id % 10 >= 8
      |    AND list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
      |SELECT vec_id, CAST(cell AS BIGINT) AS cell
      |FROM asgn
      |WHERE rank = 1 AND vec_id % 10 >= 8
      |  AND vec_id NOT IN (SELECT id2 FROM edges_int)
      |  AND vec_id NOT IN (SELECT new_id FROM edges_corpus)""".stripMargin

  /** DuckDB replay of the FROZEN hierarchical ANN SERVING path
    * (q_ann_ivf_hier — [[Similarity.ivfTopKFrozenHier]]): the same
    * quantizer-rebuild + two-level assignment as [[hierOracleSql]], but
    * run on BOTH sides of the search — corpus rank-1 cells, query
    * top-`nprobe` cells — then the cell-keyed candidate join, exact
    * cosine, and the q_ann_ivf top-10 rank (cos DESC, neighbor
    * tie-break). The assignment CTEs are the exactness-critical part
    * and they are shared verbatim with the dedup-side oracle. */
  private def hierAnnOracleSql(k: Int, dim: Int, rounds: Int,
                               coarseProbes: Int, tag: String,
                               nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |${hierQuantizerCtes(k, dim, rounds, tag)},
      |${hierAssignCtes("c", "", coarseProbes, 1, rounds)},
      |${hierAssignCtes("q", " WHERE e.vec_id % 50 = 0", coarseProbes, nprobe, rounds)},
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |  FROM qasgn q JOIN casgn c ON q.cell = c.cell
      |  WHERE q.vec_id <> c.vec_id),
      |scored AS (
      |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
      |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
      |            JOIN e ce ON ce.vec_id = cand.neighbor_id)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM (
      |  SELECT query_id, neighbor_id, cos_sim,
      |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM scored)
      |WHERE rank <= 10""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    // Incremental ANN ingest: the new batch (vec_id % 13 = 0) searches
    // the standing corpus through its STORED PQ code table (encoded
    // once at the corpus's own ingest), shortlist 50, exact cosine
    // re-rank on the shortlist only — the semantic-novelty gate a
    // 100 TB pipeline runs per arriving batch. Oracle replays encode +
    // ADC + shortlist + re-rank restricted to batch×corpus.
    "q_ann_ingest" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.filter(col("vec_id") % 13 =!= 0)
        val storedCodes = graft.operators.Pq.encode(corpus, "vec_id", "embedding")
        graft.operators.Pq.adcIngestTopK(
          storedCodes, corpus, emb.filter(col("vec_id") % 13 === 0),
          "vec_id", "embedding", k = 10, shortlist = 50)
      },
      s"""WITH $PqIngestAdcCtes,
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id) AS rk
        |    FROM adc)
        |  WHERE rk <= 50),
        |rescored AS (
        |  SELECT s.query_id, s.neighbor_id, $CosineSql AS cos_sim
        |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
        |               JOIN e ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM rescored)
        |WHERE rank <= 10"""),

    // PQ codes for every vector — 64-dim float (256 B) → 4 nibbles
    // (2 B packed) + the reconstruction norm ADC needs. Pure narrow
    // projection (PlanAuditSpec pins it Exchange-free); hash-verified
    // against the DuckDB replay of the frozen-codebook assignment.
    "q_pq_encode" -> QueryDef(
      (s, dir) => graft.operators.Pq.encode(
        Tables.embeddings(s, dir), "vec_id", "embedding"),
      s"""WITH $PqCtes
        |SELECT vec_id, code_0, code_1, code_2, code_3,
        |       ((code_0 * 16 + code_1) * 16 + code_2) * 16 + code_3 AS pq_code,
        |       recon_norm
        |FROM pqcodes"""),

    // Pure asymmetric-distance search: candidates scored from codes +
    // per-query LUTs only (4 lookups + 3 adds per pair — never a
    // 64-mult dot), cosine against the reconstruction. Recall@10 0.24
    // on this corpus (2-byte codes on near-orthogonal random vectors —
    // PqSpec pins the floor); the rerank variant below is the quality
    // posture. Hash-verified: the oracle replays encode AND the ADC
    // fold bit-exactly.
    "q_ann_pq" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Pq.adcTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
      },
      s"""WITH $PqAdcCtes
        |SELECT query_id, neighbor_id, adc_sim, rank FROM (
        |  SELECT query_id, neighbor_id, adc_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM adc)
        |WHERE rank <= 10"""),

    // ADC shortlist-100 + exact cosine re-rank — the production IVFADC
    // posture (quantized scan nominates, exact scoring confirms):
    // recall@10 0.24 → 0.74 at 1/5 of the corpus exactly scored.
    "q_ann_pq_rerank" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Pq.adcTopKRerank(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, shortlist = 100)
      },
      s"""WITH $PqAdcCtes,
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id) AS rk
        |    FROM adc)
        |  WHERE rk <= 100),
        |rescored AS (
        |  SELECT s.query_id, s.neighbor_id, $CosineSql AS cos_sim
        |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
        |               JOIN e ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM rescored)
        |WHERE rank <= 10"""),

    // IVFADC — the production composition (FAISS's default server
    // architecture): frozen coarse cells prune WHICH vectors a query
    // scores (nprobe=8 of 16), PQ codes shrink WHAT scoring reads,
    // exact cosine re-ranks only the shortlist. Every stage is the
    // same hash-verified arithmetic as its standalone query; the
    // composition is oracle-verified end to end.
    "q_ann_ivfpq" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.operators.Pq.ivfAdcTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nprobe = 8, shortlist = 100)
      },
      s"""WITH $PqCtes,
        |cents AS (${graft.operators.IvfCentroids.duckdbValues}),
        |casgn AS (
        |  SELECT vec_id AS neighbor_id, cell FROM (
        |    SELECT e.vec_id, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents)
        |  WHERE crank <= 1),
        |qasgn AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT e.vec_id, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents WHERE e.vec_id % 50 = 0)
        |  WHERE crank <= 8),
        |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qnorm
        |      FROM e WHERE vec_id % 50 = 0),
        |adc AS (
        |  SELECT qa.query_id, x.vec_id AS neighbor_id,
        |         (((list_dot_product(list_slice(q.qv, 1, 16), b0.c)
        |            + list_dot_product(list_slice(q.qv, 17, 32), b1.c))
        |            + list_dot_product(list_slice(q.qv, 33, 48), b2.c))
        |            + list_dot_product(list_slice(q.qv, 49, 64), b3.c))
        |           / (q.qnorm * x.recon_norm) AS adc_sim
        |  FROM pqcodes x
        |  JOIN casgn c ON c.neighbor_id = x.vec_id
        |  JOIN qasgn qa ON qa.cell = c.cell
        |  JOIN q ON q.query_id = qa.query_id
        |  JOIN cb b0 ON b0.m = 0 AND b0.code = x.code_0
        |  JOIN cb b1 ON b1.m = 1 AND b1.code = x.code_1
        |  JOIN cb b2 ON b2.m = 2 AND b2.code = x.code_2
        |  JOIN cb b3 ON b3.m = 3 AND b3.code = x.code_3
        |  WHERE x.vec_id <> qa.query_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id) AS rk
        |    FROM adc)
        |  WHERE rk <= 100),
        |rescored AS (
        |  SELECT s.query_id, s.neighbor_id, $CosineSql AS cos_sim
        |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
        |               JOIN e ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM rescored)
        |WHERE rank <= 10"""),

    // Symmetric int8 quantization (see Similarity.quantizeInt8) — the
    // typed ARRAY<LONG> stays on the operator API; the registry projects
    // a joined string (driver canonicalization cannot hash array cells).
    "q_embed_quantize" -> QueryDef(
      (s, dir) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
        q.select(col("vec_id"), col("maxabs"),
          array_join(transform(col("q8"), _.cast("string")), ",").as("q8"))
      },
      """WITH m AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS maxabs
        |  FROM embeddings)
        |SELECT vec_id, maxabs,
        |       array_to_string(list_transform(v, x ->
        |         CAST(CASE WHEN maxabs = 0 THEN 0
        |              ELSE CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT) END AS VARCHAR)), ',') AS q8
        |FROM m"""),

    // JL random projection 64→8: the oracle interpolates the SAME
    // frozen gaussian rows and list_dot_product replays the engine's
    // sequential double fold bit-exactly (the q_ann_brute-proven
    // contract), so all 8 projected coordinates hash-verify — a dense
    // float transform verified to the last bit, not just a sign test.
    "q_embed_project" -> QueryDef(
      (s, dir) => Similarity.projectEmbeddings(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64, outDim = 8),
      {
        val m = Similarity.projectionMatrix(64, 8)
        // '…'::DOUBLE per element: a bare 17-digit literal parses as
        // DECIMAL first and the two-step rounding lands 1 ulp off —
        // invisible to SRP's sign tests, fatal here where the dot
        // product IS the output (same lesson as q_ann_pq)
        val cols = (0 until 8).map { j =>
          s"list_dot_product(v, ${m(j).map(c => s"'$c'::DOUBLE").mkString("[", ", ", "]")}) AS p$j"
        }.mkString(",\n|       ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
          |SELECT vec_id, $cols
          |FROM e"""
      }),

    "q_ann_brute" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
      },
      s"""WITH ${bruteTopkCtes("")}
        |SELECT query_id, neighbor_id, cos_sim, rank FROM topk"""),

    // Recall@10 of IVF(nprobe=4) against the brute-force ground truth —
    // the evaluation harness behind every ANN operating-point choice,
    // as a first-class oracle-checked query: both top-k chains run in
    // full on BOTH engines (prefixed CTE chains on the DuckDB side) and
    // the per-query hit count must agree exactly. Queries the IVF probe
    // set missed entirely surface with recall 0 through the left join —
    // never silently dropped. recall = n_hits/10, one IEEE division.
    "q_ann_recall" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val qs = emb.filter(col("vec_id") % 50 === 0)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10),
          Similarity.ivfTopKFrozen(emb, qs, "vec_id", "embedding", k = 10, nprobe = 4),
          qs, "vec_id", k = 10)
      },
      s"""WITH ${bruteTopkCtes("b_")},
        |${ivfTopkCtes(4, "v_")},
        |hits AS (
        |  SELECT b.query_id, count(*) AS c
        |  FROM b_topk b JOIN v_topk v
        |    ON v.query_id = b.query_id AND v.neighbor_id = b.neighbor_id
        |  GROUP BY 1),
        |qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT qs.query_id, CAST(coalesce(hits.c, 0) AS BIGINT) AS n_hits,
        |       CAST(coalesce(hits.c, 0) AS DOUBLE) / CAST(10 AS DOUBLE) AS recall_at_k
        |FROM qs LEFT JOIN hits ON hits.query_id = qs.query_id"""),

    "q_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopKFrozen(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nprobe = 4)
      },
      ivfOracleSql(nprobe = 4)),

    // IVF at nprobe=8 — the high-recall end of the IVF curve (recall
    // 0.82 vs 0.56 at nprobe=4, pinned ≥0.6 in SimilaritySpec): same
    // frozen centroids, same cell-keyed join, 2× probed cells so
    // candidates ≈ corpus·8/16 per query. Registered so the full ANN
    // quality-vs-cost curve (lsh/lsh16/lsh_mp/ivf/ivf8/brute) is
    // driver-visible as CORRECTNESS rows, not spec-only.
    "q_ann_ivf8" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopKFrozen(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nprobe = 8)
      },
      ivfOracleSql(nprobe = 8)),

    // Embedding-space near-dup pairs (SRP-LSH candidates + exact cosine
    // filter), hash-verified end to end: the oracle replays the 16×4
    // hyperplane sign codes from the interpolated constants, joins on
    // (table, bucket), and re-scores candidates with the same double
    // fold. Threshold 0.4 is the operating point for THIS corpus
    // (random embeddings top out at cosine ~0.51); real near-dup
    // corpora run 0.9+. The bucket cap is the production posture
    // against degenerate mass-duplicate inputs (a no-op on this corpus
    // — buckets are orders of magnitude smaller — so rows are unchanged
    // at any tested SF, which is what keeps the oracle exact).
    "q_embed_neardup" -> QueryDef(
      (s, dir) => graft.operators.Dedup.embeddingNearDups(
        Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64,
        threshold = 0.4, planes = 4, tables = 16,
        maxBucketSize = Some(100000)),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 16)} AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 16) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |SELECT id1, id2, cos_sim FROM (
        |  SELECT id1, id2,
        |         list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.id1
        |            JOIN e ce ON ce.vec_id = cand.id2)
        |WHERE cos_sim >= 0.4"""),

    // The SRP tier's INGEST gate (Dedup.embeddingNearDupsAgainst):
    // standing corpus (vec_id%10<8) carries its STORED srpIndex (tables
    // x n narrow code rows, no vector payload), the batch (%10>=8)
    // codes in-flight under the same frozen (planes, tables); a
    // candidate is any shared (table, bucket) across the sides, exact
    // cosine >= 0.4 on survivors only. Completes the ingest family's
    // third quantizer tier — beyond the 65536-cell ceiling, where a
    // billion-vector standing corpus actually lives. The oracle
    // replays the code construction for ALL ids (codes are per-row vs
    // frozen hyperplanes, so split coding ≡ restricted full coding)
    // and re-derives the cross-side candidate join + threshold.
    "q_embed_neardup_ingest" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val standing = emb.filter(col("vec_id") % 10 < 8)
        val batch = emb.filter(col("vec_id") % 10 >= 8)
        graft.operators.Dedup.embeddingNearDupsAgainst(
          standing,
          graft.operators.Dedup.srpIndex(standing, "vec_id", "embedding",
            dim = 64, planes = 4),
          batch, "vec_id", "embedding", dim = 64, threshold = 0.4,
          planes = 4, maxBucketSize = Some(100000))
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 16)} AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 16) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS corpus_id, b2.vec_id AS new_id
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
        |  WHERE a.vec_id % 10 < 8 AND b2.vec_id % 10 >= 8)
        |SELECT corpus_id, new_id, cos_sim FROM (
        |  SELECT corpus_id, new_id,
        |         list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.corpus_id
        |            JOIN e ce ON ce.vec_id = cand.new_id)
        |WHERE cos_sim >= 0.4"""),

    // The standing-index RESIZE LIFECYCLE, end to end as one hash gate
    // (r14 verdict task 2): the SRP index's manifest says it was sized
    // when the corpus was a QUARTER of today's (planes frozen at
    // srpPlanesFor(n//4)), the staleness rule fires (srpPlanesFor is
    // log2-quantized, so a 4x growth always flips it at gate SFs), the
    // GATED rebuild re-encodes at srpPlanesFor(n), and ingest serves
    // from the rebuilt index — hash-matching an oracle that builds
    // FRESH at today's size, which is the rebuilt≡fresh-built proof.
    // The oracle replays the sizing rule itself twice from COUNT(*)
    // (p_old at n//4, p_new at n — the q_embed_neardup_auto pattern)
    // and codes with the p_new plane set; the sentinel row carries
    // (p_new, p_old), mapping an uncovered p_new to NULL so rule drift
    // can never pass vacuously. If the staleness rule ever said FRESH
    // here while p differs, the two sides' plane sets diverge and the
    // pair set hash-mismatches — the gate covers the rule, the gating,
    // and the rebuild in one row.
    "q_index_rebuild" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val standing = emb.filter(col("vec_id") % 10 < 8)
        val batch = emb.filter(col("vec_id") % 10 >= 8)
        val n = standing.count()
        val builtN = n / 4
        val mOld = graft.operators.Dedup.SrpManifest(builtN,
          graft.operators.Similarity.srpPlanesFor(builtN, 128), 16, 128)
        val (codes, m2) =
          if (graft.operators.Dedup.srpIndexStale(mOld, n))
            graft.operators.Dedup.srpIndexRebuild(standing, "vec_id",
              "embedding", 64, mOld, n)
          else
            (graft.operators.Dedup.srpIndex(standing, "vec_id", "embedding",
              64, mOld.planes), mOld)
        graft.operators.Dedup.embeddingNearDupsAgainst(
            standing, codes, batch, "vec_id", "embedding", dim = 64,
            threshold = 0.4, planes = m2.planes, maxBucketSize = Some(100000))
          .unionByName(s.range(1).select(
            lit(-1L).as("corpus_id"), lit(m2.planes.toLong).as("new_id"),
            lit(mOld.planes.toDouble).as("cos_sim")))
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |st AS (SELECT count(*) AS n FROM e WHERE vec_id % 10 < 8),
        |pold AS (SELECT min(i) AS p FROM generate_series(1, 62) AS g(i), st
        |         WHERE (st.n // 4) // (1::BIGINT << i) <= 128),
        |pnew AS (SELECT min(i) AS p FROM generate_series(1, 62) AS g(i), st
        |         WHERE st.n // (1::BIGINT << i) <= 128),
        |codes AS (SELECT vec_id, CASE (SELECT p FROM pnew)
        |    WHEN 2 THEN ${srpCodesSql(64, 2, 16)}
        |    WHEN 3 THEN ${srpCodesSql(64, 3, 16)}
        |    WHEN 4 THEN ${srpCodesSql(64, 4, 16)}
        |    END AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 16) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS corpus_id, b2.vec_id AS new_id
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
        |  WHERE a.vec_id % 10 < 8 AND b2.vec_id % 10 >= 8)
        |SELECT corpus_id, new_id, cos_sim FROM (
        |  SELECT corpus_id, new_id,
        |         list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.corpus_id
        |            JOIN e ce ON ce.vec_id = cand.new_id)
        |WHERE cos_sim >= 0.4
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS corpus_id,
        |       CAST(CASE WHEN (SELECT p FROM pnew) IN (2, 3, 4)
        |                 THEN (SELECT p FROM pnew) END AS BIGINT) AS new_id,
        |       CAST((SELECT p FROM pold) AS DOUBLE) AS cos_sim"""),

    // The quantizer tier's RESIZE LIFECYCLE — q_index_rebuild's sibling
    // on the semantic tier, driver-gating the OTHER standing artifact's
    // staleness rule + gated rebuild (StalenessSpec pins the mechanics;
    // this row makes them oracle evidence). The manifest says the
    // quantizer was sized when the corpus was an EIGHTH of today's
    // (k frozen at cellsFor(n/8)) — outside the 2× band at every gate
    // SF, so quantizerStale fires, probedIndexRebuild retrains at
    // cellsFor(n) on the deterministic hashCentroids trainer (the
    // q_semdedup_hier oracle-replayability posture) and re-assigns the
    // standing corpus (label migration), and ingest serves from the
    // REBUILT index. The oracle replays the sizing rule from COUNT(*)
    // ((n+127)//128), reconstructs hashCentroids at that RUNTIME k from
    // md5 integer arithmetic (the hierQuantizerCtes fcv pattern over an
    // oversized constant series, filtered to k·64 — k > 64 maps the
    // sentinel to NULL so truncation can never pass silently), and
    // re-derives the full ingest rule. Hash match = stale-gate +
    // rebuild + re-assignment + ingest ≡ a fresh build at today's size.
    "q_quantizer_rebuild" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val standing = emb.filter(col("vec_id") % 10 < 8)
        val batch = emb.filter(col("vec_id") % 10 >= 8)
        val n = standing.count()
        val builtN = n / 8
        val mOld = graft.operators.SemDedup.QuantizerManifest(builtN,
          graft.operators.SemDedup.cellsFor(builtN), 2, 128)
        val (idx, cents, m2) =
          if (graft.operators.SemDedup.quantizerStale(mOld, n))
            graft.operators.SemDedup.probedIndexRebuild(standing, "vec_id",
              "embedding", mOld, n,
              k => graft.operators.Similarity.hashCentroids(k, 64))
          else {
            val c = graft.operators.Similarity.hashCentroids(mOld.k, 64)
            (graft.operators.SemDedup.probedIndex(standing, "vec_id",
              "embedding", c), c, mOld)
          }
        graft.operators.SemDedup.dedupIngest(standing, idx, batch,
            "vec_id", "embedding", threshold = 0.4, cents)
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
          .unionByName(s.range(1).select(
            lit(-1L).as("vec_id"), lit(m2.k.toLong).as("cell")))
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |st AS (SELECT count(*) AS n FROM e WHERE vec_id % 10 < 8),
        |kk AS (SELECT (n + 127) // 128 AS k FROM st),
        |fcv AS MATERIALIZED (
        |  SELECT cd // 64 AS c, cd % 64 AS d,
        |         (CAST(CAST(concat('0x', substr(md5('hc:' || CAST(cd // 64 AS VARCHAR) || ':' || CAST(cd % 64 AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS DOUBLE)
        |          - CAST('127.5' AS DOUBLE)) / CAST('128.0' AS DOUBLE) AS x
        |  FROM generate_series(0, 4095) AS t(cd)
        |  WHERE cd < (SELECT k FROM kk) * 64),
        |fc AS MATERIALIZED (SELECT c, list(x ORDER BY d) AS ctr FROM fcv GROUP BY c),
        |asgn AS MATERIALIZED (
        |  SELECT vec_id, cell, crank FROM (
        |    SELECT e.vec_id, fc.c AS cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, fc.ctr) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(fc.ctr, fc.ctr))) DESC,
        |             fc.c) AS crank
        |    FROM e CROSS JOIN fc)
        |  WHERE crank <= 2),
        |edges AS MATERIALIZED (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        |  JOIN e qe ON qe.vec_id = a.vec_id
        |  JOIN e ce ON ce.vec_id = b.vec_id
        |  WHERE list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
        |SELECT asgn.vec_id, CAST(asgn.cell AS BIGINT) AS cell
        |FROM asgn
        |WHERE crank = 1 AND vec_id % 10 >= 8
        |  AND vec_id NOT IN (SELECT id2 FROM edges
        |                     WHERE id1 % 10 >= 8 AND id2 % 10 >= 8 AND id1 < id2)
        |  AND vec_id NOT IN (SELECT id2 FROM edges
        |                     WHERE id1 % 10 < 8 AND id2 % 10 >= 8)
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS vec_id,
        |       CAST(CASE WHEN (SELECT k FROM kk) <= 64
        |                 THEN (SELECT k FROM kk) END AS BIGINT) AS cell"""),

    // The AUTO-SIZED near-dup path — the round-10 scale ladder's headline
    // fix graduated to a CORRECTNESS row: the engine learns n with one
    // count() and sizes planes = srpPlanesFor(n, 128); the oracle replays
    // the RULE ITSELF (smallest p with n // 2^p ≤ 128, from COUNT(*))
    // and branches into the full interpolated hyperplane set for that p
    // (each p has a DISTINCT Random(42) layout, so each branch carries
    // its own 16-table constants). Plane sets cover p ∈ {2,3,4} — the
    // rule's output at every verified corpus size (500 → 2, 2000 → 4)
    // plus the gap point. A p outside the covered range can NOT pass
    // vacuously (r11 ADVICE: NULL codes → zero oracle candidates could
    // coincide with a genuinely pair-free corpus): both sides emit a
    // SENTINEL row (id1 = -1) carrying the replayed p and COUNT(*) —
    // the oracle maps an uncovered p to NULL there, so rule drift or
    // an uncovered corpus size hash-mismatches on the sentinel even
    // when the pair set is empty on both sides. Same candidate join +
    // exact-cosine filter as q_embed_neardup, so the pair stands as
    // fixed-vs-auto evidence.
    "q_embed_neardup_auto" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // the sentinel's sizing inputs, computed ONCE and handed to
        // embeddingNearDupsAuto via knownCount (r12: the previous
        // exact-but-duplicate count() scanned the corpus twice per run)
        val n = emb.count()
        val p = graft.operators.Similarity.srpPlanesFor(n, 128)
        graft.operators.Dedup.embeddingNearDupsAuto(
          emb, "vec_id", "embedding", dim = 64,
          threshold = 0.4, tables = 16, targetBucketSize = 128,
          maxBucketSize = Some(100000), knownCount = Some(n))
          .unionByName(s.range(1).select(
            lit(-1L).as("id1"), lit(p.toLong).as("id2"),
            lit(n.toDouble).as("cos_sim")))
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |pp AS (SELECT min(i) AS p FROM generate_series(1, 32) AS g(i)
        |       WHERE (SELECT count(*) FROM e) // (1::BIGINT << i) <= 128),
        |codes AS (SELECT vec_id, CASE (SELECT p FROM pp)
        |    WHEN 2 THEN ${srpCodesSql(64, 2, 16)}
        |    WHEN 3 THEN ${srpCodesSql(64, 3, 16)}
        |    WHEN 4 THEN ${srpCodesSql(64, 4, 16)}
        |    END AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 16) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |SELECT id1, id2, cos_sim FROM (
        |  SELECT id1, id2,
        |         list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.id1
        |            JOIN e ce ON ce.vec_id = cand.id2)
        |WHERE cos_sim >= 0.4
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS id1,
        |       CAST(CASE WHEN (SELECT p FROM pp) IN (2, 3, 4)
        |                 THEN (SELECT p FROM pp) END AS BIGINT) AS id2,
        |       CAST((SELECT count(*) FROM e) AS DOUBLE) AS cos_sim"""),

    "q_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", dim = 64, k = 10, planes = 4)
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 8)} AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 8) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
        |            JOIN e ce ON ce.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10"""),

    // ANN ensemble fusion: the IVF(nprobe=4) and SRP-LSH(8 tables)
    // top-10 lists fused per query by reciprocal rank (Retrieval
    // .rrfFuse keyed by (query_id, neighbor_id)) — the production
    // recall-rescue pattern when two index families miss DIFFERENT
    // neighbors (IVF loses cross-cell, LSH loses low-collision): the
    // union is re-ranked by consensus without score calibration. Both
    // arms' full chains replay on both engines; the fused score is the
    // fixed-order 1/(60+r) fold (IEEE-exact), missed-arm ranks are −1.
    // This also driver-gates rrfFuse's per-QUERY keyed path (q_hybrid
    // _rrf gates the single-query shape).
    "q_ann_fuse" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val qs = emb.filter(col("vec_id") % 50 === 0)
        val ivf = Similarity.ivfTopKFrozen(
            emb, qs, "vec_id", "embedding", k = 10, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("r"))
        val lsh = Similarity.lshTopK(
            emb, qs, "vec_id", "embedding", dim = 64, k = 10, planes = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("r"))
        graft.operators.Retrieval.rrfFuse(
            Seq(ivf, lsh), Seq("query_id", "neighbor_id"), "r", k = 60)
          .select(col("query_id"), col("neighbor_id"),
            col("rank_0").as("ivf_rank"), col("rank_1").as("lsh_rank"),
            col("rrf_score"))
      },
      s"""WITH ${ivfTopkCtes(4, "v_")},
        |l_e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |l_codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 8)} AS codes FROM l_e),
        |l_b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |        FROM l_codes CROSS JOIN generate_series(1, 8) AS g(i)),
        |l_cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM l_b q JOIN l_b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
        |l_scored AS (
        |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
        |  FROM l_cand cand JOIN l_e qe ON qe.vec_id = cand.query_id
        |            JOIN l_e ce ON ce.vec_id = cand.neighbor_id),
        |l_topk AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT query_id, neighbor_id,
        |           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |    FROM l_scored)
        |  WHERE rank <= 10)
        |SELECT coalesce(i.query_id, l.query_id) AS query_id,
        |       coalesce(i.neighbor_id, l.neighbor_id) AS neighbor_id,
        |       CAST(coalesce(i.rank, -1) AS BIGINT) AS ivf_rank,
        |       CAST(coalesce(l.rank, -1) AS BIGINT) AS lsh_rank,
        |       (CASE WHEN i.rank IS NULL THEN CAST(0 AS DOUBLE)
        |             ELSE CAST(1.0 AS DOUBLE) / CAST(60 + i.rank AS DOUBLE) END)
        |       + (CASE WHEN l.rank IS NULL THEN CAST(0 AS DOUBLE)
        |              ELSE CAST(1.0 AS DOUBLE) / CAST(60 + l.rank AS DOUBLE) END) AS rrf_score
        |FROM v_topk i FULL JOIN l_topk l
        |  ON i.query_id = l.query_id AND i.neighbor_id = l.neighbor_id"""),

    // More-tables config: same SRP-LSH, 16 tables instead of 8 — the
    // middle of the quality-vs-cost curve (recall 0.87 measured, floor
    // 0.85 pinned in SimilaritySpec; 2× corpus replication, same keyed
    // (table,bucket) join shape). Oracle replays all 16 tables'
    // hyperplane constants. For the ≥0.9 serving endpoint see
    // q_ann_lsh_mp — multiprobe beats more tables on cost.
    "q_ann_lsh16" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", dim = 64, k = 10, planes = 4, tables = 16)
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 16)} AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 16) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
        |            JOIN e ce ON ce.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10"""),

    // The high-recall serving endpoint: 8 tables + Hamming-1 multiprobe
    // (recall 1.00 measured on this corpus, floor 0.9 pinned in
    // SimilaritySpec via the 16-table variant). Each query probes its
    // own bucket plus the 4 codes one bit away — fanout is on the
    // SMALL broadcast query side only, so this beats 16 tables (0.87)
    // at HALF the corpus replication. Oracle replays the probe
    // expansion with xor() over the same interpolated hyperplanes.
    "q_ann_lsh_mp" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", dim = 64, k = 10,
          planes = 4, tables = 8, probes = 4)
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, ${srpCodesSql(64, 4, 8)} AS codes FROM e),
        |b AS (SELECT vec_id, i AS tbl, codes[i] AS bucket
        |      FROM codes CROSS JOIN generate_series(1, 8) AS g(i)),
        |qb AS (SELECT vec_id, tbl,
        |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
        |       FROM b WHERE vec_id % 50 = 0),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM qb q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |  WHERE q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id, $CosineSql AS cos_sim
        |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
        |            JOIN e ce ON ce.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10"""),

    // One Lloyd update step from the frozen quantizer — the TRAINING
    // side of the IVF story, in-engine and hash-verified: assignment
    // replays the q_ann_ivf cell rule (max cosine, cell tie-break), the
    // centroid update is a fixed-point-exact per-dimension mean (see
    // KMeansOps.lloydStep — integer sums, ONE IEEE division at the end).
    "q_kmeans_step" -> QueryDef(
      (s, dir) =>
        graft.operators.KMeansOps.lloydStep(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          graft.operators.IvfCentroids.cells),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (${graft.operators.IvfCentroids.duckdbValues}),
        |asgn AS (
        |  SELECT vec_id, v, cell FROM (
        |    SELECT e.vec_id, e.v, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents)
        |  WHERE crank = 1),
        |ex AS (
        |  SELECT cell,
        |         unnest([{'pos': i - 1, 'x': v[i]} for i in generate_series(1, 64)],
        |                recursive := true)
        |  FROM asgn)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
        |       CAST(SUM(CAST(floor(x * 1073741824.0) AS BIGINT)) AS DOUBLE)
        |         / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS c_new,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM ex GROUP BY cell, pos"""),

    // Multi-round Lloyd fit (2 rounds from the frozen seed) — the full
    // in-engine training loop, hash-verified end to end. Round 2's
    // centroid table is round 1's k·dim aggregation re-entering as a
    // broadcast build (KMeansOps.lloydIterate — no collect, no driver
    // action between rounds). Bit-exact across engines because every
    // centroid component is a fixed-point-exact mean (integer sums, one
    // IEEE division) and CosineSimilarity now fuses mixed FLOAT-data /
    // DOUBLE-centroid loops with the same widen-then-fold order DuckDB
    // replays via list_dot_product.
    "q_kmeans_fit" -> QueryDef(
      (s, dir) =>
        graft.operators.KMeansOps.lloydIterate(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          graft.operators.IvfCentroids.cells, rounds = 2),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents0 AS (${graft.operators.IvfCentroids.duckdbValues}),
        |asgn1 AS (
        |  SELECT vec_id, v, cell FROM (
        |    SELECT e.vec_id, e.v, cents0.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents0.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents0.c, cents0.c))) DESC,
        |             cents0.cell) AS crank
        |    FROM e CROSS JOIN cents0)
        |  WHERE crank = 1),
        |ex1 AS (
        |  SELECT cell,
        |         unnest([{'pos': i - 1, 'x': v[i]} for i in generate_series(1, 64)],
        |                recursive := true)
        |  FROM asgn1),
        |upd1 AS (
        |  SELECT cell, pos,
        |         CAST(SUM(CAST(floor(x * 1073741824.0) AS BIGINT)) AS DOUBLE)
        |           / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS c
        |  FROM ex1 GROUP BY cell, pos),
        |cents1 AS (SELECT cell, list(c ORDER BY pos) AS c FROM upd1 GROUP BY cell),
        |asgn2 AS (
        |  SELECT vec_id, v, cell FROM (
        |    SELECT e.vec_id, e.v, cents1.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents1.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents1.c, cents1.c))) DESC,
        |             cents1.cell) AS crank
        |    FROM e CROSS JOIN cents1)
        |  WHERE crank = 1),
        |ex2 AS (
        |  SELECT cell,
        |         unnest([{'pos': i - 1, 'x': v[i]} for i in generate_series(1, 64)],
        |                recursive := true)
        |  FROM asgn2)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
        |       CAST(SUM(CAST(floor(x * 1073741824.0) AS BIGINT)) AS DOUBLE)
        |         / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS c_new,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM ex2 GROUP BY cell, pos"""),

    // SemDeDup (Abbas et al. 2023): semantic near-dup removal bounded
    // by the frozen IVF cells — candidates only WITHIN a cell (Σ|cell|²
    // work, the semantic-space analogue of the LSH bucket join), exact
    // cosine ≥ 0.4, min-id survivor per dup edge. The oracle replays
    // assignment (the q_ann_ivf cell rule), the intra-cell pair join,
    // the cosine threshold, and the anti join — the whole pipeline is
    // hash-verified, not sampled. Output = the kept corpus + its cell.
    "q_semdedup" -> QueryDef(
      (s, dir) => graft.operators.SemDedup.dedup(
        Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.4)
        .select(col("vec_id"), col("cell").cast("long").as("cell")),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (${graft.operators.IvfCentroids.duckdbValues}),
        |asgn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents)
        |  WHERE crank = 1),
        |edges AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN e qe ON qe.vec_id = a.vec_id
        |  JOIN e ce ON ce.vec_id = b.vec_id
        |  WHERE list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell
        |FROM asgn
        |WHERE vec_id NOT IN (SELECT id2 FROM edges)"""),

    // SemDedup.dedupProbed — the FLAT quantizer tier's boundary-pair
    // rule (r13 verdict task 1), hash-gated on the frozen IvfCentroids
    // operating point: each id probes its top-2 cells (crank <= 2,
    // same cosine rank as q_semdedup's assignment), a pair is a
    // candidate when ANY probed cell is shared, survivors = rank-1
    // assignment minus distinct higher-ids. This is the candidate rule
    // dedupAuto's flat tier now runs; q_semdedup keeps gating the
    // literal single-probe SemDeDup recipe beside it.
    "q_semdedup_probe2" -> QueryDef(
      (s, dir) => graft.operators.SemDedup.dedupProbed(
        Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.4)
        .select(col("vec_id"), col("cell").cast("long").as("cell")),
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (${graft.operators.IvfCentroids.duckdbValues}),
        |asgn AS (
        |  SELECT vec_id, cell, crank FROM (
        |    SELECT e.vec_id, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents)
        |  WHERE crank <= 2),
        |edges AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN e qe ON qe.vec_id = a.vec_id
        |  JOIN e ce ON ce.vec_id = b.vec_id
        |  WHERE list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell
        |FROM asgn
        |WHERE crank = 1 AND vec_id NOT IN (SELECT id2 FROM edges)"""),

    // SemDedup.dedupIngest — the semantic tier's batch-vs-standing
    // entry point (the lshCandidatesAgainst shape): standing corpus =
    // vec_id%10<8 with its STORED probedIndex, batch = vec_id%10>=8
    // probed in-path under the same frozen quantizer. A batch id is
    // dropped on a >=0.4 edge to ANY standing id (standing always wins,
    // id order irrelevant across sides) or to a SMALLER batch id
    // (min-id within the batch). The oracle replays the probed
    // assignment once for all ids, splits the sides, and re-derives
    // both edge streams — the whole ingest rule is hash-verified.
    "q_semdedup_ingest" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val standing = emb.filter(col("vec_id") % 10 < 8)
        val batch = emb.filter(col("vec_id") % 10 >= 8)
        graft.operators.SemDedup.dedupIngest(
            standing,
            graft.operators.SemDedup.probedIndex(standing, "vec_id", "embedding"),
            batch, "vec_id", "embedding", threshold = 0.4)
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
      },
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (${graft.operators.IvfCentroids.duckdbValues}),
        |asgn AS (
        |  SELECT vec_id, cell, crank FROM (
        |    SELECT e.vec_id, cents.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.v, cents.c) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.c, cents.c))) DESC,
        |             cents.cell) AS crank
        |    FROM e CROSS JOIN cents)
        |  WHERE crank <= 2),
        |edges_int AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN e qe ON qe.vec_id = a.vec_id
        |  JOIN e ce ON ce.vec_id = b.vec_id
        |  WHERE a.vec_id % 10 >= 8 AND b.vec_id % 10 >= 8
        |    AND list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4),
        |edges_corpus AS (
        |  SELECT a.vec_id AS corpus_id, b.vec_id AS new_id
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell
        |  JOIN e qe ON qe.vec_id = a.vec_id
        |  JOIN e ce ON ce.vec_id = b.vec_id
        |  WHERE a.vec_id % 10 < 8 AND b.vec_id % 10 >= 8
        |    AND list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) >= 0.4)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell
        |FROM asgn
        |WHERE crank = 1 AND vec_id % 10 >= 8
        |  AND vec_id NOT IN (SELECT id2 FROM edges_int)
        |  AND vec_id NOT IN (SELECT new_id FROM edges_corpus)"""),

    // The >FlatAssignCeiling tier of semantic dedup, hash-gated end to
    // end (r11 verdict task 2): the engine path is SemDedup.dedupHier →
    // Similarity.assignCellsHierarchical (coarsen's driver Lloyd + the
    // two-level coarse→fine probe) on the DETERMINISTIC hashCentroids
    // quantizer at k = 4100 > 4096 — the first cell count past the flat
    // assigner's ceiling. Since r14 the gated semantics is the tier's
    // NEW default: fineProbes = 2 boundary-pair candidates (any shared
    // probed cell), survivor output = rank-1 assignment — the r13
    // verdict-task-1 recall recovery, driver-gated here. The oracle
    // retrains the coarse Lloyd from scratch (8 unrolled rounds) and
    // replays assignment + the two-probe candidate rule + survivor
    // rule; see hierOracleSql for the exactness argument.
    "q_semdedup_hier" -> QueryDef(
      (s, dir) => graft.operators.SemDedup.dedupHier(
        Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.4,
        centroids = HierCentroids)
        .select(col("vec_id"), col("cell").cast("long").as("cell")),
      hierOracleSql(k = 4100, dim = 64, rounds = 8, coarseProbes = 2, tag = "hc")),

    // The hierarchical tier's INGEST gate: SemDedup.dedupIngestHier on
    // the same frozen k = 4100 > FlatAssignCeiling quantizer as
    // q_semdedup_hier — standing (vec_id%10<8) carries its STORED
    // probedIndexHier, the batch (%10>=8) assigns through the
    // two-level path in-flight. Past the flat ceiling this is the only
    // affordable batch assigner ((1+coarseProbes)·√k cosines/row vs
    // n_batch·k), and everything after assignment is tier-blind — the
    // q_semdedup_ingest rule verbatim. The oracle rebuilds the
    // quantizer (driver Lloyd, unrolled MATERIALIZED CTEs) and replays
    // the probed assignment once over all ids (per-row vs centroids
    // alone, so split assignment ≡ restricted full assignment), then
    // both edge streams and the standing-wins survivor rule.
    "q_semdedup_ingest_hier" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val standing = emb.filter(col("vec_id") % 10 < 8)
        val batch = emb.filter(col("vec_id") % 10 >= 8)
        graft.operators.SemDedup.dedupIngestHier(
            standing,
            graft.operators.SemDedup.probedIndexHier(
              standing, "vec_id", "embedding", HierCentroids),
            batch, "vec_id", "embedding", threshold = 0.4, HierCentroids)
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
      },
      hierIngestOracleSql(k = 4100, dim = 64, rounds = 8, coarseProbes = 2,
        tag = "hc")),

    // The hierarchical ANN SERVING branch's driver gate (r12 verdict
    // task 1): ivfTopKFrozenHier routes BOTH corpus and query sides
    // through Similarity.assignCellsHierarchical on the same frozen
    // k = 4100 > FlatAssignCeiling hashCentroids quantizer as
    // q_semdedup_hier, then the cell-keyed join + exact-cosine top-10.
    // nprobe = 64 keeps the candidate set non-vacuous on this corpus
    // (4100 cells over 500-2000 vectors leaves most cells empty; a
    // 4-probe row would gate almost nothing). The oracle retrains the
    // coarse Lloyd from scratch and replays coarse→fine assignment on
    // both sides — see hierAnnOracleSql.
    "q_ann_ivf_hier" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopKFrozenHier(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nprobe = 64,
          centroids = HierCentroids)
      },
      hierAnnOracleSql(k = 4100, dim = 64, rounds = 8, coarseProbes = 2,
        tag = "hc", nprobe = 64)),

    // Scalar int8 quantization with per-vector abs-max calibration (the
    // faiss/llama.cpp Q8 shape, the MEMORY lever beside PQ): 4 B float →
    // 1 B code per dim, scale = one IEEE division, codes =
    // floor(x·scale + 0.5) — exact-rounded mult/add then exact floor, so
    // the float-derived codes hash-verify. approx_sq_norm exercises the
    // int8 serving kernel: exact BIGINT code dot, ONE float division by
    // scale² — on the unit-normalized corpus it replays ≈1 bit-exactly.
    "q_quant_int8" -> QueryDef(
      (s, dir) => {
        import graft.operators.Quant
        Quant.int8Codes(Tables.embeddings(s, dir), "vec_id", "embedding")
          .select(col("vec_id"), col("scale"),
            aggregate(col("q"), lit(0L), (a, b) => a + b).as("sum_q"),
            aggregate(col("q"), lit(0L), (a, b) => a + abs(b)).as("sum_abs_q"),
            array_max(transform(col("q"), x => abs(x))).as("max_abs_q"),
            Quant.dequantDot(col("q"), col("q"), col("scale"), col("scale"))
              .as("approx_sq_norm"))
      },
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max([abs(x) for x in v]) AS mx FROM e),
        |s AS (SELECT vec_id, v,
        |             CASE WHEN mx > 0 THEN CAST(127 AS DOUBLE) / mx ELSE CAST(0 AS DOUBLE) END AS scale
        |      FROM m),
        |q AS (SELECT vec_id, scale, [CAST(floor(x * scale + 0.5) AS BIGINT) for x in v] AS qs FROM s)
        |SELECT vec_id, scale,
        |       CAST(list_sum(qs) AS BIGINT) AS sum_q,
        |       CAST(list_sum([abs(x) for x in qs]) AS BIGINT) AS sum_abs_q,
        |       CAST(list_max([abs(x) for x in qs]) AS BIGINT) AS max_abs_q,
        |       CASE WHEN scale > 0
        |            THEN CAST(list_sum([qs[i] * qs[i] for i in generate_series(1, len(qs))]) AS DOUBLE) / (scale * scale)
        |            ELSE CAST(0 AS DOUBLE) END AS approx_sq_norm
        |FROM q""")
  )
}
