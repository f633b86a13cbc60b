package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wkt

/**
 * Property tests for the WKT envelope extractor against a brute-force
 * regex-based coordinate parse (seeded → deterministic).
 */
class WktSpec extends AnyFunSuite {

  private val numRe = """-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?""".r

  /** Brute force: collect (x, y) pairs in text order via regex. */
  private def bruteEnvelope(wkt: String): Array[Double] = {
    val nums = numRe.findAllIn(wkt).map(_.toDouble).toSeq
    if (nums.isEmpty) null
    else {
      val xs = nums.grouped(2).map(_.head).toSeq
      val ys = nums.grouped(2).flatMap(_.drop(1).headOption).toSeq
      Array(xs.min, ys.min, xs.max, ys.max)
    }
  }

  test("envelope matches brute force on random polygons (1000 seeded cases)") {
    val rnd = new Random(42)
    for (_ <- 1 to 1000) {
      val n = 3 + rnd.nextInt(8)
      val pts = Seq.fill(n)((rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90))
      val ring = (pts :+ pts.head).map { case (x, y) => f"$x%.6f $y%.6f" }.mkString(", ")
      val wkt = s"POLYGON (($ring))"
      assert(Wkt.envelope(wkt).toSeq == bruteEnvelope(wkt).toSeq, wkt)
    }
  }

  test("multipolygon, nested rings, negative and scientific-notation coords") {
    val wkt = "MULTIPOLYGON (((1 2, 3 4, 5 6, 1 2)), ((-7 -8, 9.5 1e2, -1.5E-1 0, -7 -8)))"
    assert(Wkt.envelope(wkt).toSeq == Seq(-7.0, -8.0, 9.5, 100.0))
  }

  test("shapely box layout (the reference's generator output)") {
    val wkt = "POLYGON ((10 -10, 10 10, -10 10, -10 -10, 10 -10))"
    assert(Wkt.envelope(wkt).toSeq == Seq(-10.0, -10.0, 10.0, 10.0))
  }

  test("no coordinates → null envelope; intersects is false") {
    assert(Wkt.envelope("POLYGON EMPTY") == null)
    assert(!Wkt.envelopeIntersects("POLYGON EMPTY", -1, -1, 1, 1))
  }

  test("envelopeIntersects agrees with interval logic on random boxes") {
    val rnd = new Random(7)
    for (_ <- 1 to 1000) {
      def box() = {
        val x0 = rnd.nextDouble() * 100; val y0 = rnd.nextDouble() * 100
        (x0, y0, x0 + rnd.nextDouble() * 50, y0 + rnd.nextDouble() * 50)
      }
      val (ax0, ay0, ax1, ay1) = box()
      val (bx0, by0, bx1, by1) = box()
      val wkt = s"POLYGON (($ax0 $ay0, $ax1 $ay0, $ax1 $ay1, $ax0 $ay1, $ax0 $ay0))"
      val expected = ax0 <= bx1 && ax1 >= bx0 && ay0 <= by1 && ay1 >= by0
      assert(Wkt.envelopeIntersects(wkt, bx0, by0, bx1, by1) == expected)
    }
  }

  test("touching edges count as intersecting (closed-interval semantics)") {
    val wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert(Wkt.envelopeIntersects(wkt, 10, 10, 20, 20)) // corner touch
    assert(Wkt.envelopeIntersects(wkt, -5, -5, 0, 5))   // edge touch
    assert(!Wkt.envelopeIntersects(wkt, 10.0001, 0, 20, 10))
  }


  test("3-D WKT, EWKT SRID prefixes, and unknown words are UNKNOWN (null)") {
    // parity hazard: 'POINT Z (1 2 3)' would otherwise read 1 as x, 2 as y,
    // 3 as x again — a silently corrupt envelope instead of an unknown one
    assert(Wkt.envelope("POINT Z (1 2 3)") == null)
    assert(Wkt.envelope("POLYGON Z ((1 2 3, 4 5 6, 7 8 9, 1 2 3))") == null)
    assert(Wkt.envelope("POINT M (1 2 3)") == null)
    assert(Wkt.envelope("POINT ZM (1 2 3 4)") == null)
    assert(Wkt.envelope("SRID=4326;POINT (1 2)") == null)
    assert(Wkt.envelope("approximately 3 by 4 meters") == null)
    // round-9 regression: an alpha run that merely FOLLOWS a digit is not
    // an exponent — "1x2" would parity-flip into a corrupt [1,2,3,2] box
    assert(Wkt.envelope("POINT(1x2 3)") == null)
    assert(Wkt.envelope("POLYGON((1deg 2, 3 4))") == null)
    assert(Wkt.envelope("POINT(1ex 2)") == null) // 'ex' run: not a lone exponent
    assert(!Wkt.envelopeIntersects("POINT Z (1 2 3)", 0, 0, 10, 10))
    // 2-D forms with exponents and the full keyword set still parse
    assert(Wkt.envelope("POINT (1e2 -2.5E-1)").toSeq == Seq(100.0, -0.25, 100.0, -0.25))
    assert(Wkt.envelope(
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6))").toSeq ==
      Seq(1.0, 2.0, 5.0, 6.0))
    assert(Wkt.envelope("POLYGON EMPTY") == null)
  }

  test("malformed numeric text returns null, never throws") {
    // "1.2.3" and a bare "-" both LOOK like number starts to the scanner;
    // parseDouble would throw and kill the whole scan task
    for (bad <- Seq("N/A - missing", "POLYGON((1.2.3 4))", "POLYGON((- 5))",
        "..", "1e", "POLYGON((3e++2 1))")) {
      assert(Wkt.envelope(bad) == null || Wkt.envelope(bad) != null, bad) // no throw
      // and intersects degrades to false when the envelope is unknown
      if (Wkt.envelope(bad) == null)
        assert(!Wkt.envelopeIntersects(bad, 0, 0, 10, 10), bad)
    }
    assert(Wkt.envelope("POLYGON((1.2.3 4))") == null)
    assert(Wkt.envelope("N/A - missing") == null)
  }
}
