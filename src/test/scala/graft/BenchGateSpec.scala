package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the quiet-run drift gate's pure pieces: the wobble-floored
  * out-of-band rule (r16 — a synthetic real slowdown must still fire;
  * sub-floor wobble must not) and the SCOPED reference-band parse
  * (r15 ADVICE — only the two steady maps feed the band, never any
  * future per-query numeric field in the same file).
  */
class BenchGateSpec extends AnyFunSuite {

  test("drift gate fires on a real slowdown and floors sub-0.3s wobble") {
    // a genuine regression: 2x on a 1-second query → fires
    assert(Bench.driftsOutOfBand(ref = 1.0, steady = 2.0))
    // the r15 lucky-minimum class: 0.63 s minimum, 0.9 s typical
    // (1.43x but only 0.27 s over) → floored, no flag
    assert(!Bench.driftsOutOfBand(ref = 0.63, steady = 0.90))
    // ratio gate alone is not enough on big queries either: 5.0 → 5.4
    // (+0.4 s but 1.08x) stays in band
    assert(!Bench.driftsOutOfBand(ref = 5.0, steady = 5.4))
    // both gates over → fires even sub-second (0.3 → 0.8: 2.7x, +0.5 s)
    assert(Bench.driftsOutOfBand(ref = 0.3, steady = 0.8))
    // boundary: exactly at the floor or the ratio does NOT fire
    assert(!Bench.driftsOutOfBand(ref = 1.0, steady = 1.3))
    assert(!Bench.driftsOutOfBand(ref = 1.0, steady = 1.4))
  }

  test("reference-band parse is scoped to the two steady maps and min-folds them") {
    val txt =
      """{
        | "sf": "/root/testdata/sf0.1",
        | "source": {"total_sec": 185.2, "loadavg_start": 0.65, "n_queries": 220},
        | "steady_sec": {"q_a": 1.5, "q_b": 0.9},
        | "steady_min_sec": {"q_a": 1.2, "q_b": 1.1},
        | "drift_seen": {"q_a": 9.9, "q_c": 0.1}
        |}""".stripMargin
    val band = Bench.parseReferenceBand(txt, "/root/testdata/sf0.1")
    // dual band = per-query min of the two steady maps
    assert(band("q_a") == 1.2)
    assert(band("q_b") == 0.9)
    // a future per-query numeric field must NOT leak into the band:
    // q_a keeps its steady min (not 9.9 — and a flat regex would also
    // never have produced it, the dangerous leak is a SMALLER value),
    // and q_c (present only in the foreign map) is absent entirely
    assert(!band.contains("q_c"))
    // wrong sf → empty (the band is per-SF by construction)
    assert(Bench.parseReferenceBand(txt, "/root/testdata/sf0.01").isEmpty)
    // a foreign map with a smaller value for a banded query must not
    // tighten the band
    val txt2 = txt.replace("\"drift_seen\": {\"q_a\": 9.9, \"q_c\": 0.1}",
      "\"drift_seen\": {\"q_a\": 0.01}")
    assert(Bench.parseReferenceBand(txt2, "/root/testdata/sf0.1")("q_a") == 1.2)
  }
}
