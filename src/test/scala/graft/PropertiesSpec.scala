package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property-based checks (plain ScalaCheck, driven through its own
  * runner — the scalatest bridge isn't vendored) for the pure kernels
  * whose exactness the oracle gates lean on. */
class PropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  import graft.operators.Multimodal.dhashOfPixels

  /** Run a property under a FIXED seed (deterministic CI) and assert
    * it passed. */
  private def check(p: Prop): Unit = {
    val params = ScTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(0xA11CE))
    val res = ScTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("dHash is invariant under uniform brightness shift") {
    val gen = for {
      w <- Gen.choose(9, 40)
      h <- Gen.choose(8, 32)
      seed <- Gen.choose(0L, Long.MaxValue)
      shift <- Gen.choose(0, 55)
    } yield (w, h, seed, shift)
    check(Prop.forAll(gen) { case (w, h, seed, shift) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt(200))
      def gray(x: Int, y: Int) = px(y * w + x)
      dhashOfPixels(gray, w, h) ==
        dhashOfPixels((x, y) => gray(x, y) + shift, w, h)
    })
  }

  test("dHash is defined exactly when the 9x8 grid has no empty block") {
    check(Prop.forAll(Gen.choose(1, 24), Gen.choose(1, 24)) { (w, h) =>
      dhashOfPixels((x, y) => x + y, w, h).isDefined == (w >= 9 && h >= 8)
    })
  }

  test("dHash downscale blocks partition every pixel exactly once") {
    check(Prop.forAll(Gen.choose(9, 50), Gen.choose(8, 40)) { (w, h) =>
      var seen = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          seen += (x1 - x0).toLong * (y1 - y0)
          cx += 1
        }
        cy += 1
      }
      seen == w.toLong * h
    })
  }
}
