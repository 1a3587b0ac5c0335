package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Stat0Spec extends AnyFunSuite {
  test("standardize: GeoDa sample-sd semantics") {
    val a = Array(1.0, 2.0, 3.0)
    Stat0.standardize(a)
    // mean 2, sd = sqrt(2/2) = 1
    assert(a.sameElements(Array(-1.0, 0.0, 1.0)))
  }

  test("meanSd exact and order-independent") {
    val a = Array(0.1, 0.2, 0.3, -0.1, 1e15, -1e15)
    val (m1, s1) = Stat0.meanSd(a)
    val (m2, s2) = Stat0.meanSd(a.reverse)
    assert(m1 == m2 && s1 == s2)
  }

  test("percentileSorted: GeoDa plotting-position convention") {
    val v = Array(1.0, 2.0, 3.0, 4.0)
    // p_i = 100*(i+0.5)/4 = 12.5, 37.5, 62.5, 87.5
    assert(Stat0.percentileSorted(12.5, v) == 1.0)
    assert(Stat0.percentileSorted(10.0, v) == 1.0) // below p_0 clamps
    assert(Stat0.percentileSorted(87.5, v) == 4.0)
    assert(Stat0.percentileSorted(99.0, v) == 4.0)
    assert(Stat0.percentileSorted(50.0, v) == 2.5) // midway 2..3
    assert(Stat0.percentileSorted(25.0, v) == 1.5)
  }

  test("scale methods") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(Stat0.scale(a, "raw").sameElements(a))
    assert(Stat0.scale(a, "demean").sameElements(Array(-1.5, -0.5, 0.5, 1.5)))
    assert(Stat0.scale(a, "range_standardize")
      .sameElements(Array(0.0, 1.0 / 3, 2.0 / 3, 1.0)))
    assert(Stat0.scale(a, "range_adjust")
      .sameElements(Array(1.0 / 3, 2.0 / 3, 1.0, 4.0 / 3)))
    // mad: median 2.5, abs devs [1.5,0.5,0.5,1.5] → mad 1.0
    assert(Stat0.scale(a, "mad").sameElements(Array(-1.5, -0.5, 0.5, 1.5)))
    intercept[IllegalArgumentException](Stat0.scale(a, "nope"))
  }
}
