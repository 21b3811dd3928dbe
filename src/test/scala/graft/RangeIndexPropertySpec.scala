package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.plans.{GraftRangeJoinExec, RangeIndex}

/** Pure-JVM property test of the shared [[RangeIndex]] probe structure
  * (no Spark session): for random interval sets dense in ties, NaN,
  * infinities and ±0.0, every probe must return EXACTLY the intervals a
  * naive scan admits under Spark's nan-safe double ordering — for all
  * four strictness combinations. This pins the binary search boundary
  * conditions and the prefix-max-hi early exit independently of any
  * execution plan. */
class RangeIndexPropertySpec extends AnyFunSuite with Matchers {

  private def row(id: Int): InternalRow =
    new GenericInternalRow(Array[Any](id))

  // value pool dense in edge cases; norm() applied like both execs do
  private def pool(rnd: scala.util.Random): Double = {
    val raw = rnd.nextInt(10) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => -0.0
      case 4 => 0.0
      case _ => (rnd.nextInt(21) - 10) / 2.0 // clustered → many ties
    }
    GraftRangeJoinExec.norm(raw)
  }

  private def naive(entries: IndexedSeq[(Double, Double, Int)], p: Double,
      sLo: Boolean, sHi: Boolean): Set[Int] =
    entries.collect { case (lo, hi, id)
      if {
        val cl = java.lang.Double.compare(lo, p)
        val ch = java.lang.Double.compare(hi, p)
        (if (sLo) cl < 0 else cl <= 0) && (if (sHi) ch > 0 else ch >= 0)
      } => id
    }.toSet

  test("probe equals the naive scan on 40 random interval sets x 4 strictness modes") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 40) {
      val n = rnd.nextInt(30) + 1
      val entries = (0 until n).map(i => (pool(rnd), pool(rnd), i))
      val probes = (0 until 25).map(_ => pool(rnd))
      for (sLo <- Seq(false, true); sHi <- Seq(false, true)) {
        val idx = RangeIndex.build(
          entries.map { case (lo, hi, i) => (lo, hi, row(i)) }, sLo, sHi)
        probes.foreach { p =>
          val got = idx.probe(p).map(_.getInt(0)).toSet
          withClue(s"trial=$trial sLo=$sLo sHi=$sHi p=$p: ") {
            got shouldBe naive(entries, p, sLo, sHi)
          }
        }
      }
    }
  }

  test("empty index probes to nothing; single-interval boundary hits are exact") {
    RangeIndex.build(Nil, strictLo = false, strictHi = false)
      .probe(1.0).toSeq shouldBe Seq.empty
    val one = RangeIndex.build(Seq((1.0, 2.0, row(7))),
      strictLo = false, strictHi = false)
    one.probe(1.0).map(_.getInt(0)).toSeq shouldBe Seq(7)
    one.probe(2.0).map(_.getInt(0)).toSeq shouldBe Seq(7)
    val strict = RangeIndex.build(Seq((1.0, 2.0, row(7))),
      strictLo = true, strictHi = true)
    strict.probe(1.0).toSeq shouldBe Seq.empty
    strict.probe(2.0).toSeq shouldBe Seq.empty
    strict.probe(1.5).map(_.getInt(0)).toSeq shouldBe Seq(7)
  }
}
