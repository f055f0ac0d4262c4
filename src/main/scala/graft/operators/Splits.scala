package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `rand()`-based sampling re-rolls on every retry/re-run and differs
  * across engines — useless for a held-out set that must stay held out
  * across months of pipeline runs. This assigns each row a bucket from
  * the md5-based portable hash of (salt || id): stable under
  * re-partitioning, task retries, engine swaps, and incremental
  * re-ingestion (a row's split never changes when other rows arrive).
  * Changing the salt re-rolls the whole split. Pure map-side
  * projection — no shuffle, no RNG state, embarrassingly parallel at
  * any scale.
  *
  * Family-wide contracts:
  *  - NULL ids are DROPPED by every op here (a null cannot hash to a
  *    deterministic fate; silently routing it to some default split
  *    would skew exactly the held-out set this family exists to
  *    protect).
  *  - COMPOSED ops need DISTINCT salts: every decision is a function
  *    of hash(salt:id), so e.g. stratifiedSample at rate r then
  *    [[assign]] with the SAME salt puts the entire surviving sample
  *    in 'train' (the sample is precisely the low-hash rows). One salt
  *    per decision, not per dataset.
  */
object Splits {

  /** Bucket 0..99 for a row id (any type; cast to string). */
  def bucket(id: Column, salt: String): Column =
    Dedup.portableHash64(concat(lit(salt + ":"), id.cast("string"))) % 100

  /** Deterministic stratified sampling: keep a row iff
    * portableHash64(salt:id) % 10000 < the stratum's per-myriad rate
    * (integer thresholds — no float compare can drift cross-engine).
    * Same stability contract as [[assign]]: a row's fate depends only on
    * (salt, id), never on partitioning, retries, or other rows — so
    * up-sampling high-quality strata / down-sampling boilerplate sources
    * is reproducible across pipeline runs and engines. Pure map-side
    * filter — no shuffle, no RNG state.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesPermyriad: Map[String, Int],
                       defaultPermyriad: Int, salt: String): DataFrame = {
    (ratesPermyriad.values ++ Seq(defaultPermyriad)).foreach(r =>
      require(r >= 0 && r <= 10000, s"per-myriad rate out of [0,10000]: $r"))
    val h = Dedup.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))) % 10000
    val rate = ratesPermyriad.foldLeft(lit(defaultPermyriad)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // null ids drop naturally (NULL < rate is never true) — the
    // family-wide null contract
    df.filter(h < rate)
  }

  /** Deterministic mixture resampling — the epoch-weights primitive: a
    * stratum with weight w (per-myriad, 10000 = 1×) emits each of its
    * rows floor(w/10000) times, plus one extra copy iff
    * portableHash64(salt:id) % 10000 < w % 10000 — so a 2.5× source
    * duplicates every doc and triples a reproducible half of them, and
    * an 0.5× source keeps a reproducible half. Same stability contract
    * as [[stratifiedSample]] (a row's fate depends only on salt and id).
    * `copy_idx` (1-based) distinguishes replicas for downstream epoch
    * shuffling. Narrow explode — no shuffle; output size scales by the
    * mixture weight exactly.
    */
  def resampleByWeight(df: DataFrame, idCol: String, strataCol: String,
                       weightsPermyriad: Map[String, Int],
                       defaultPermyriad: Int, salt: String): DataFrame = {
    (weightsPermyriad.values ++ Seq(defaultPermyriad)).foreach(w =>
      require(w >= 0, s"negative mixture weight: $w"))
    val h = Dedup.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))) % 10000
    // integer base/frac split per stratum happens in Scala (no column
    // division drift possible)
    def perStratum(f: Int => Long): Column =
      weightsPermyriad.foldLeft(lit(f(defaultPermyriad))) { case (acc, (k, v)) =>
        when(col(strataCol) === k, lit(f(v))).otherwise(acc)
      }
    val base = perStratum(v => (v / 10000).toLong)
    val frac = perStratum(v => (v % 10000).toLong)
    // copies >= 1 before the sequence: sequence(1, 0) would flip to a
    // DESCENDING default step and emit [1, 0] instead of nothing
    df.filter(col(idCol).isNotNull) // family-wide null contract — a null
      // id would otherwise get exactly `base` copies (its fractional
      // when() is NULL), a third silent fate distinct from the siblings'
      .withColumn("_copies", base + when(h < frac, 1L).otherwise(0L))
      .filter(col("_copies") >= 1)
      .select(df.columns.map(col) :+
        explode(sequence(lit(1L), col("_copies"))).as("copy_idx"): _*)
  }

  /** Deterministic PPS (probability-proportional-to-size) systematic
    * sampling per stratum — the weighted draw the mixing family lacks:
    * [[stratifiedSample]] keeps a fixed-RATE subset,
    * [[graft.operators.TextPipeline.capTokenBudget]] cuts a running
    * total, THIS draws exactly k slots per stratum with inclusion
    * probability proportional to each row's weight (classic systematic
    * sampling over the portable-hash-ordered stream).
    *
    * All-integer selection: with W the stratum's total weight and a row
    * owning cumulative interval (cum−w, cum] in hash order, the row is
    * drawn `n_draws = (cum·k) div W − ((cum−w)·k) div W` times — the
    * number of the k equally-spaced slot boundaries landing in its
    * interval. Σ n_draws = k per stratum (the sum telescopes to
    * (W·k) div W = k), a row heavier than W/k is drawn with
    * multiplicity (the VarOpt-style certainty item, reported rather
    * than silently clamped), and the hash order makes the draw a
    * reproducible shuffle: stable under re-partitioning, retries, and
    * engine swaps. No floats anywhere, so the sample is
    * oracle-hash-verifiable (q_sample_pps).
    *
    * Scale shape: ONE window exchange (the ordered cumulative sum and
    * the stratum total share the partitionBy(strata) exchange+sort),
    * per-group serial state bounded by the largest stratum — the
    * [[graft.operators.TextPipeline.capTokenBudget]] contract. Rows
    * with weight ≤ 0 are dropped up front (also guards the W=0
    * stratum, whose division would throw under ANSI). Overflow bound:
    * cum·k must fit a BIGINT — k ≤ 10⁵ is safe past 10¹³ tokens per
    * stratum.
    *
    * Output: input columns + `weight` + `n_draws`.
    */
  def samplePps(df: DataFrame, idCol: String, strataCol: String,
                weight: Column, k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    // integral weights only: cast("long") on a fractional weight would
    // silently truncate (0.9 → 0 → row DROPPED; 1.9 and 1.1 both → 1),
    // biasing the 'proportional to size' contract with no error
    val wType = df.select(weight.as("_w")).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(wType.typeName),
      s"samplePps weight must be an integral column, got $wType — " +
        "scale fractional weights to integers (e.g. per-myriad) first")
    val h = Dedup.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(strataCol))
    // ROWS frame, not the default RANGE: under RANGE, duplicate ids tie
    // on the (h, id) order key and share one _cum, overlapping their
    // intervals and breaking the telescoping Σ n_draws = k; ROWS gives
    // every physical row its own prefix (identical results for unique
    // ids, where RANGE ≡ ROWS)
    val inOrder = byStratum.orderBy(h.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // family-wide NULL-id contract (resampleByWeight/assign/negativeSample):
    // a NULL id hashes to NULL (the salt concat propagates it), sorts first
    // under asc, and would join the draw with a partition-order-dependent
    // tie on (h, id) — dropped up front like the weight≤0 rows
    df.filter(col(idCol).isNotNull)
      .withColumn("_w", weight.cast("long"))
      .filter(col("_w") > 0)
      .withColumn("_cum", sum(col("_w")).over(inOrder))
      .withColumn("_tot", sum(col("_w")).over(byStratum))
      .withColumn("n_draws",
        expr(s"((_cum * $k) div _tot) - (((_cum - _w) * $k) div _tot)"))
      .filter(col("n_draws") >= 1)
      // the sampling weight IS the output `weight` column — an input
      // column of the same name is superseded, never duplicated (two
      // `weight` columns would make every downstream by-name reference
      // an AMBIGUOUS_REFERENCE error)
      .select(df.columns.filterNot(_ == "weight").map(col) :+
        col("_w").as("weight") :+ col("n_draws"): _*)
  }

  /** Deterministic negative sampling — the contrastive-pairs primitive
    * (in-batch negatives don't exist in a batch engine; this is the
    * corpus-wide equivalent): k pseudo-random negatives per anchor,
    * drawn by portable hash of (salt, anchor, slot) mod corpus size
    * into the doc-id-ranked corpus. A row's negatives depend only on
    * (salt, its id, N) — reproducible across runs, engines, and
    * partitionings. Self-hits are dropped rather than re-probed (≤ k
    * negatives per anchor, expected shortfall k/N — re-probing would
    * need data-dependent iteration for a ~1/N event).
    *
    * Scale shape: the corpus size enters as a 1-row broadcast (never a
    * collect), candidates explode map-side (k narrow rows per anchor),
    * and the draw is ONE keyed join on the rank. The rank rides
    * [[SeqPack.prefixSum]]'s two-level scan — one RANGE exchange on the
    * id plus broadcast partition offsets (a bare unpartitioned
    * row_number window would plan Exchange SinglePartition: one task
    * sorting and holding every id, the opposite of this paragraph);
    * corpora with dense ids can substitute the id for the rank and
    * skip it.
    *
    * Output: (anchor_id, slot, neg_id).
    */
  def negativeSample(docs: DataFrame, idCol: String, k: Int,
                     salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // three consumers (count, rank, slots) — persist so the id
    // projection runs once; released by the caller via Caching.release()
    val ids = graft.Caching.persistTracked(
      docs.select(col(idCol)).filter(col(idCol).isNotNull))
    val nFrame = ids.agg(count(lit(1)).as("_n"))
    val ranked = SeqPack.prefixSum(
        ids.select(col(idCol), lit(1L).as("_one")), idCol, "_one")
      .select(col(idCol), (col("tok_start") + 1L).as("_rank"))
    val slots = ids.select(col(idCol).as("anchor_id"),
        explode(sequence(lit(1), lit(k))).as("slot"))
      .withColumn("_h", Dedup.portableHash64(concat(
        lit(salt + ":"), col("anchor_id").cast("string"),
        lit(":"), col("slot").cast("string"))))
    slots.crossJoin(broadcast(nFrame))
      .withColumn("_r", (col("_h") % col("_n")) + lit(1))
      .join(ranked, col("_r") === col("_rank"))
      .filter(col("anchor_id") =!= col(idCol))
      .select(col("anchor_id"), col("slot").cast("long").as("slot"),
        col(idCol).as("neg_id"))
  }

  /** train/valid/test label: buckets [0,trainPct) → train,
    * [trainPct, trainPct+validPct) → valid, rest → test. NULL ids are
    * dropped (family contract — a NULL bucket would otherwise fall
    * through both when() arms and silently land in 'test'). */
  def assign(df: DataFrame, idCol: String, salt: String,
             trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"split percentages must partition [0,100): train=$trainPct valid=$validPct")
    val b = bucket(col(idCol), salt)
    df.filter(col(idCol).isNotNull)
      .withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + validPct, "valid")
          .otherwise("test"))
  }
}
