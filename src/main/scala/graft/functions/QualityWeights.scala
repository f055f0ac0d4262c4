package graft.functions

/** Frozen fastText-class quality-classifier weights — trained ONCE by
  * [[graft.tools.FreezeQualityWeights]] (full-batch logistic regression
  * over hashed bag-of-token features, D = 256 buckets of
  * [[PortableHash60]] mod D, distillation labels = stopword_ratio >=
  * corpus median, sf0.01 `documents`, 500 rounds, quantized train
  * accuracy 0.94) and checked in as 10^-6 fixed-point constants — the
  * same train-once/serve-many posture as [[BpeMerges]] and
  * [[graft.operators.IvfCentroids]]. Fixed-point weights make the
  * serving dot product an exact integer sum (order-free under any
  * partitioning) and the logit two IEEE double ops, so the model is
  * DuckDB-hash-verifiable end to end.
  */
object QualityWeights {
  val D: Int = 256
  val biasFp: Long = 28983L
  val weightsFp: Seq[Long] = Seq(
    0L, 0L, 0L, 0L, -1036277L, 0L, 0L, -97879L, 0L, -702564L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, -477657L, 0L, 0L,
    0L, 0L, 0L, -646712L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, -1040150L, 0L, -1563243L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, -691516L, 0L, 0L, 0L,
    0L, 0L, -64981L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, -933410L, 0L, 0L, 0L, 0L, 0L,
    0L, 246515L, -724902L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, -59069L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 532763L, 6314141L, 0L, 0L, 6401264L,
    0L, 0L, 0L, 0L, 0L, 145287L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, -616247L, -1357789L, 0L, 0L, 0L, 0L, 0L, -109897L, 0L,
    0L, -268402L, -856765L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    -374290L, 0L, 0L, 0L, 0L, 0L, 344042L, 0L, 0L, 0L,
    0L, -541611L, 204470L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 250279L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, -489045L, 0L, 0L, 0L,
    0L, 0L, 0L, -811771L, -73271L, 0L, -872328L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L)
}
