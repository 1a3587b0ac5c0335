package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5.2) via raw ScalaCheck: RNG range and
  * determinism, tiling consistency, percentile monotonicity, standardize
  * moments, distance symmetry.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, tests: Int = 200): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(tests)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("tw hash maps any long into [0,1)") {
    check(Prop.forAll { (k: Long) =>
      val v = Rng.thomasWangHashDouble(k)
      v >= 0.0 && v < 1.0
    })
  }

  test("u64ToDouble equals BigInt unsigned conversion") {
    check(Prop.forAll { (x: Long) =>
      Rng.u64ToDouble(x) == BigInt(java.lang.Long.toUnsignedString(x)).toDouble
    })
  }

  test("drawDistinct: distinct ids, never self, deterministic") {
    val gen = for {
      n <- Gen.choose(3, 200)
      self <- Gen.choose(0, n - 1)
      k <- Gen.choose(1, math.max(1, math.min(8, n - 2)))
      seed <- Gen.choose(0, Int.MaxValue / 2)
    } yield (n, self, k, seed)
    check(Prop.forAll(gen) { case (n, self, k, seed) =>
      val w = new Rng.IntSet(n)
      val out1 = new Array[Int](k)
      val out2 = new Array[Int](k)
      val s1 = Rng.drawDistinct(seed, n, self, k, w, out1)
      val s2 = Rng.drawDistinct(seed, n, self, k, w, out2)
      s1 == s2 && out1.sameElements(out2) &&
        out1.toSet.size == k && !out1.contains(self) &&
        out1.forall(v => v >= 0 && v < n)
    })
  }

  test("cellId: same cell implies proximity; id decomposes") {
    val coord = Gen.choose(-1000.0, 1000.0)
    val gen = for {
      x1 <- coord; y1 <- coord; x2 <- coord; y2 <- coord
      s <- Gen.choose(0.1, 50.0)
    } yield (x1, y1, x2, y2, s)
    check(Prop.forAll(gen) { case (x1, y1, x2, y2, s) =>
      val sameCellOk =
        if (Tiling.cellId(x1, y1, s) == Tiling.cellId(x2, y2, s))
          math.abs(x1 - x2) < s && math.abs(y1 - y2) < s
        else true
      val c = Tiling.cellId(x1, y1, s)
      sameCellOk && Tiling.cellOf(Tiling.cellIx(c), Tiling.cellIy(c)) == c
    })
  }

  test("percentileSorted is monotone in the percentile") {
    val gen = for {
      a <- Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
      p1 <- Gen.choose(0.0, 100.0)
      p2 <- Gen.choose(0.0, 100.0)
    } yield (a.toArray, p1, p2)
    check(Prop.forAll(gen) { case (a, p1, p2) =>
      java.util.Arrays.sort(a)
      val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
      Stat0.percentileSorted(lo, a) <= Stat0.percentileSorted(hi, a)
    })
  }

  test("standardize: mean ~0, sample sd ~1 for non-degenerate input") {
    val gen = Gen.listOfN(50, Gen.choose(-1e3, 1e3)).map(_.toArray)
      .suchThat(a => a.distinct.length > 1)
    check(Prop.forAll(gen) { (a: Array[Double]) =>
      val z = a.clone()
      Stat0.standardize(z)
      val (m, sd) = Stat0.meanSd(z)
      math.abs(m) < 1e-9 && math.abs(sd - 1.0) < 1e-9
    }, tests = 100)
  }

  test("distance-band predicate symmetric; kernels bounded") {
    val gen = for {
      x1 <- Gen.choose(0.0, 100.0); y1 <- Gen.choose(0.0, 100.0)
      x2 <- Gen.choose(0.0, 100.0); y2 <- Gen.choose(0.0, 100.0)
      t <- Gen.choose(1.0, 30.0)
    } yield (x1, y1, x2, y2, t)
    check(Prop.forAll(gen) { case (x1, y1, x2, y2, t) =>
      val dij = Dist.euclidean(x1, y1, x2, y2)
      val dji = Dist.euclidean(x2, y2, x1, y1)
      val sym = (dij <= t) == (dji <= t)
      val kernelsOk = Seq("triangular", "uniform", "epanechnikov",
        "quartic", "gaussian").forall { kn =>
        val v = Dist.kernel(kn, dij, t, useDiagonal = false)
        v >= 0.0 && v <= 1.0
      }
      sym && kernelsOk
    })
  }

  test("TextExtract: arbitrary markup-ish input never throws, canonical output") {
    val soup = Gen.listOf(Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)),
      (2, Gen.oneOf('<', '>', '&', ';', '/', '!', '-', '#', '"', '\'')
        .map(_.toString)),
      (2, Gen.oneOf(' ', '\t', '\n', '\r').map(_.toString)),
      (1, Gen.oneOf("script style p div amp lt nbsp x".split(' ').toSeq))))
      .map(_.mkString)
    check(Prop.forAll(soup) { s =>
      val a = graft.pipeline.TextExtract.fromHtml(s)
      val b = graft.pipeline.TextExtract.fromHtml(s)
      // deterministic + canonical whitespace (no runs, trimmed edges).
      // NOT idempotent in general: a decoded &lt; legitimately
      // reintroduces markup — the unit spec pins idempotence on
      // markup-free output instead.
      a == b && !a.contains("  ") && !a.contains("\n\n") && a == a.trim
    }, tests = 500)
  }
}
