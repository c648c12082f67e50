package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact bench line must fit the driver's ~2 KB stdout tail WHOLE
  * at any query count — totals are never lost. Pure-function tests over
  * [[Bench.compactArtifactLine]]'s three degradation levels (no Spark).
  */
class BenchEmitSpec extends AnyFunSuite {

  private def synth(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}_synthetic_name_$i%03d", i * 0.137))

  test("small runs keep the full 1-dp per-query map") {
    val rs = synth(40)
    val line = Bench.compactArtifactLine(rs, Map.empty, "sf0.1")
    assert(line.length <= 1900)
    assert(line.contains(""""nq":40"""))
    // 1-dp precision survives (q3 -> 0.411 -> "0.4")
    assert(line.contains(""""q3":0.4"""))
    assert(line.endsWith("}"))
  }

  test("mid-size runs degrade to whole seconds, still complete") {
    // sized so the 1-dp line overflows (~190 x 11 B + header > 1900)
    // but the whole-second line fits (~190 x 9 B + header < 1900) —
    // exactly the level-2 regime
    val rs = (1 to 190).map(i => (s"q${i}x", 7.77))
    val line = Bench.compactArtifactLine(rs, Map.empty, "sf0.1")
    assert(line.length <= 1900, s"len ${line.length}")
    assert(line.contains(""""nq":190"""))
    // every query still present (complete map, cruder precision)
    assert((1 to 190).forall(i => line.contains(s""""q${i}x":8""")),
      "whole-second line must still carry every query")
  }

  test("300 synthetic queries stay under the tail guard via the slowest-10 fallback") {
    val rs = synth(300)
    val errs = (1 to 15).map(i => s"e$i" -> "boom").toMap
    val line = Bench.compactArtifactLine(rs, errs, "sf0.1")
    assert(line.length <= 1900, s"len ${line.length}")
    assert(line.contains(""""nq":300"""))
    assert(line.contains(""""nerr":15"""))
    // totals are never lost
    val total = rs.map(_._2).sum
    assert(line.contains(f""""value":${BigDecimal(total).setScale(1, BigDecimal.RoundingMode.HALF_UP).bigDecimal.stripTrailingZeros.toPlainString}"""))
    // the 10 slowest (q291..q300) are the per-query survivors
    assert(line.contains(""""slowest":{"""))
    assert(line.contains(""""q300":41.1"""))
    assert(line.contains(""""q291":"""))
    assert(!line.contains(""""q1":"""), "fallback drops the full map")
  }

  test("degradation is monotone in the limit: tighter limits never overflow") {
    val rs = synth(300)
    // the slowest-N list shrinks until the line fits — the guarantee
    // holds at any limit down to the totals-only floor
    Seq(4000, 1900, 800, 400, 150).foreach { lim =>
      val line = Bench.compactArtifactLine(rs, Map.empty, "sf0.1", limit = lim)
      assert(line.length <= lim, s"limit $lim -> len ${line.length}: $line")
      assert(line.contains(""""value":"""))
      assert(line.contains(""""nq":300"""))
    }
  }
}
