package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** PPJoin+ SUFFIX FILTER (Xiao et al. WWW'08 §3.3), the third lossless
  * filter of [[graft.operators.Dedup.prefixJaccardPairs]] after the
  * length and positional filters — evaluated per candidate-join row,
  * before the distinct exchange.
  *
  * MEASURED and OFF BY DEFAULT on this engine (r14, 100× ladder rung,
  * 500k docs, τ = 1/2): it pruned 4.8% of candidate rows (13.16M →
  * 12.53M) while the sample payload doubled the candidate stage's cost
  * (28.5 s → 57.9 s, shuffle 1.84 → 3.30 GB) — on long-document
  * corpora the length + positional filters already kill the easy
  * candidates, and an Q=8-sampled rank interval (±sz/8) is too loose
  * to separate the rest at τ = 1/2. The same measurement showed the
  * rung's real disk frame was the VERIFICATION fan, since replaced by
  * [[SortedIntersectCount]] verify-in-place. The filter stays available
  * (`suffixFilter = true`) for the corpus class it was designed for —
  * short records (titles, names) at high τ, where prefixes are a large
  * fraction of each doc and candidates dominate end-to-end cost.
  *
  * Semantics. A candidate row matches docs d1, d2 on a shared prefix
  * token at canonical positions (i, j) (both docs list their tokens in
  * the SAME global (df, shingle) order). For the pair's EARLIEST shared
  * token, every other shared token is larger in the global order, hence
  * lies in BOTH suffixes (tokens after i in d1, after j in d2) — so
  * common ≤ 1 + |suffix1 ∩ suffix2|, and with H the symmetric-
  * difference (Hamming) size, |s1 ∩ s2| = (|s1| + |s2| − H)/2. The
  * filter computes a LOWER bound on H by partitioning both suffixes
  * around a probe token m (Xiao Lemma: H ≥ |l1 − l2| + |r1 − r2| +
  * (1 − [m ∈ suffix1]) for partitions (< m, m, > m)) and drops the row
  * when even the optimistic overlap cannot reach τ. Rows that are NOT
  * their pair's earliest match may be dropped "wrongly" — exactly as
  * with the positional filter, the earliest match of a true pair always
  * survives, so pair-level recall is unaffected (the q_prefix_jaccard
  * oracle replays the UNfiltered all-pairs join; hash equality at every
  * SF is the losslessness proof at the driver gate).
  *
  * Instead of carrying whole suffixes into the join (which would dwarf
  * the savings), each doc carries [[Q]] SAMPLES of its token list —
  * the (df, shingle) values at positions ceil(q·sz/Q), interleaved in
  * one ARRAY<LONG>. The probe m is the other side's sample nearest its
  * suffix median (its rank in its own doc is then EXACT); the rank of m
  * in THIS doc is interval-bounded by the surrounding samples, and the
  * Hamming bound is minimized over the interval (and over m-membership)
  * — every uncertainty is resolved toward KEEPING the row, which is
  * what makes the sampled filter lossless. Both directions are applied;
  * either can kill the row. Docs with sz ≤ Q carry their full token
  * list and the rank query is exact.
  */
object SuffixFilter {

  /** Samples per document. 8 keeps the per-row payload at ≤ 16 longs
    * (128 B) while the rank interval width — the filter's slack — is
    * sz/8, tight enough to separate τ-reachable pairs at τ = 1/2. */
  val Q = 8

  /** 1-based position of sample t in a doc of size sz (the inverse of
    * the boundary-crossing selection rule `(rn·Q) div sz >
    * ((rn−1)·Q) div sz`): ceil(t·sz/Q) when sz ≥ Q, else t (the
    * selection keeps every position when sz < Q). */
  def samplePos(t: Int, sz: Long): Long =
    if (sz >= Q) (t.toLong * sz + Q - 1) / Q else t.toLong

  /** True when the candidate row can still belong to a τ-pair under the
    * suffix bound (both probe directions). All-long integer arithmetic;
    * τ = tauNum/tauDen exactly, as in the verification filter. */
  def keep(smp1: ArrayData, rn1: Long, sz1: Long,
           smp2: ArrayData, rn2: Long, sz2: Long,
           tauNum: Long, tauDen: Long): Boolean = {
    val s1 = sz1 - rn1; val s2 = sz2 - rn2
    if (s1 <= 0L || s2 <= 0L) return true // positional filter governs
    // required: common·(den+num) ≥ num·(sz1+sz2); common ≤ 1 + ov_ub
    val need = tauNum * (sz1 + sz2)
    val tauSum = tauNum + tauDen
    dirOk(smp1, rn1, sz1, smp2, rn2, sz2, need, tauSum) &&
      dirOk(smp2, rn2, sz2, smp1, rn1, sz1, need, tauSum)
  }

  /** One probe direction: m drawn from B's samples (exact rank in B),
    * rank in A interval-bounded from A's samples. */
  private def dirOk(smpA: ArrayData, ia: Long, szA: Long,
                    smpB: ArrayData, ib: Long, szB: Long,
                    need: Long, tauSum: Long): Boolean = {
    val sA = szA - ia; val sB = szB - ib
    val nB = smpB.numElements() / 2
    // probe = B's sample nearest its suffix median, position > ib
    val target = ib + (sB + 1L) / 2L
    var best = -1; var bestD = Long.MaxValue
    var t = 1
    while (t <= nB) {
      val p = samplePos(t, szB)
      if (p > ib) {
        val d = math.abs(p - target)
        if (d < bestD) { bestD = d; best = t }
      }
      t += 1
    }
    if (best < 0) return true // unreachable: samplePos(nB, szB) = szB > ib
    val pB = samplePos(best, szB)
    val mdf = smpB.getLong(2 * (best - 1))
    val msh = smpB.getLong(2 * (best - 1) + 1)
    val l2 = pB - ib - 1L          // exact: # suffixB tokens < m
    val r2 = sB - l2 - 1L          // exact: m ∈ suffixB
    // rank interval of m in A's FULL token list: k = # samples ≤ m
    val nA = smpA.numElements() / 2
    var k = 0
    var u = 1
    while (u <= nA) {
      val df = smpA.getLong(2 * (u - 1))
      val sh = smpA.getLong(2 * (u - 1) + 1)
      if (df < mdf || (df == mdf && sh <= msh)) k = u
      u += 1
    }
    // # A tokens ≤ m ∈ [cleLo, cleHi] (samples sit at known positions)
    val cleLo = if (k == 0) 0L else samplePos(k, szA)
    val cleHi = if (k == nA) szA else samplePos(k + 1, szA) - 1L
    // l1 = # suffixA tokens < m = clamp(cntLT − ia); cntLT ∈ [cleLo−1, cleHi]
    val l1lo = math.max(0L, math.min(sA, cleLo - 1L - ia))
    val l1hi = math.max(0L, math.min(sA, cleHi - ia))
    // Hlb = min over l1 ∈ [l1lo, l1hi], f1 ∈ {0,1} of
    //   |l1 − l2| + |sA − l1 − f1 − r2| + (1 − f1)
    // (convex piecewise-linear in l1 → min at a clamped breakpoint)
    def clamp(x: Long): Long = math.max(l1lo, math.min(l1hi, x))
    def g(l1: Long, f1: Long): Long =
      math.abs(l1 - l2) + math.abs(sA - l1 - f1 - r2) + (1L - f1)
    val hlb = math.min(
      math.min(g(clamp(l2), 1L), g(clamp(sA - 1L - r2), 1L)),
      math.min(g(clamp(l2), 0L), g(clamp(sA - r2), 0L)))
    val ovUb = math.max(0L, (sA + sB - hlb) / 2L)
    (1L + ovUb) * tauSum >= need
  }
}

/** Boolean filter expression over the candidate-join row: children =
  * (samples1, rn1, sz1, samples2, rn2, sz2), τ as constructor rational.
  * Codegen'd (a static call per row, inside whole-stage codegen) — it
  * runs once per prefix-match row, the hottest stream of the suite's
  * heaviest query. NULL on any child keeps the row (nullable = false,
  * value true): the filter is an optimization, never a gate. */
case class SuffixFilterKeep(smp1: Expression, rn1: Expression, sz1: Expression,
                            smp2: Expression, rn2: Expression, sz2: Expression,
                            tauNum: Int, tauDen: Int) extends Expression {

  override def children: Seq[Expression] = Seq(smp1, rn1, sz1, smp2, rn2, sz2)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = smp1.dataType.isInstanceOf[ArrayType] &&
      smp1.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      smp2.dataType.isInstanceOf[ArrayType] &&
      smp2.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      Seq(rn1, sz1, rn2, sz2).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "suffix_filter_keep expects (ARRAY<LONG>, LONG, LONG, ARRAY<LONG>, LONG, LONG), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val a = smp1.eval(input); val i = rn1.eval(input); val n1 = sz1.eval(input)
    val b = smp2.eval(input); val j = rn2.eval(input); val n2 = sz2.eval(input)
    if (a == null || i == null || n1 == null || b == null || j == null || n2 == null) true
    else SuffixFilter.keep(
      a.asInstanceOf[ArrayData], i.asInstanceOf[Long], n1.asInstanceOf[Long],
      b.asInstanceOf[ArrayData], j.asInstanceOf[Long], n2.asInstanceOf[Long],
      tauNum.toLong, tauDen.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code).reduce(_ + _)
    ev.copy(
      code = childCode + code"""
        boolean ${ev.value} = true;
        if (!($anyNull)) {
          ${ev.value} = graft.functions.SuffixFilter.keep(
            ${evs(0).value}, ${evs(1).value}, ${evs(2).value},
            ${evs(3).value}, ${evs(4).value}, ${evs(5).value},
            ${tauNum}L, ${tauDen}L);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SuffixFilterKeep =
    copy(smp1 = newChildren(0), rn1 = newChildren(1), sz1 = newChildren(2),
      smp2 = newChildren(3), rn2 = newChildren(4), sz2 = newChildren(5))

  override def prettyName: String = "suffix_filter_keep"
}

object SuffixFilterKeep {
  def apply(smp1: Column, rn1: Column, sz1: Column,
            smp2: Column, rn2: Column, sz2: Column,
            tauNum: Int, tauDen: Int): Column =
    ColumnBridge.column(SuffixFilterKeep(
      ColumnBridge.expression(smp1), ColumnBridge.expression(rn1),
      ColumnBridge.expression(sz1), ColumnBridge.expression(smp2),
      ColumnBridge.expression(rn2), ColumnBridge.expression(sz2),
      tauNum, tauDen))
}
