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

  test("LinearTextScore decomposes exactly: score(a⧺b) = score(a) + score(b) + w(boundary bigram)") {
    import graft.functions.LinearTextScore
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.Literal
    val expr = LinearTextScore(Literal(""), 1 << 16, 61)
    def score(s: String): Long = expr.compute(UTF8String.fromString(s))
    // boundary-bigram weight expressed through score itself:
    // score("x y") = w(x) + w(y) + w("x y") and score(tok) = w(tok)
    def wPair(x: String, y: String): Long =
      score(x + " " + y) - score(x) - score(y)
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(text, text) { (a, b) =>
      val lastA = a.split(" ", -1).last
      val firstB = b.split(" ", -1).head
      score(a + " " + b) == score(a) + score(b) + wPair(lastA, firstB)
    })
  }

  test("Pii.redact is idempotent and clean text is a fixed point") {
    // replay the engine's regexp_replace chain (same Java regex
    // engine, same pattern order) without a session
    def redactOnce(s: String): String =
      graft.operators.Pii.patterns.foldLeft(s) { case (t, (_, re, tok)) =>
        t.replaceAll(re, java.util.regex.Matcher.quoteReplacement(tok))
      }
    val piiGen = Gen.oneOf(
      Gen.choose(0, 9999).map(i => s"user$i@mail$i.org"),
      Gen.choose(0, 9999).map(i => f"123-45-$i%04d"),
      Gen.choose(0, 255).map(i => s"10.$i.0.$i"),
      Gen.choose(0, 9999).map(i => f"+1 555-${i % 1000}%03d-$i%04d"))
    val filler = Gen.listOf(Gen.alphaChar).map(_.mkString)
    val gen = for {
      parts <- Gen.listOfN(4, Gen.zip(filler, piiGen))
    } yield parts.map { case (f, p) => s"$f $p " }.mkString
    check(Prop.forAll(gen) { s =>
      val once = redactOnce(s)
      redactOnce(once) == once && !once.contains("@") &&
        graft.operators.Pii.patterns.forall { case (_, re, _) =>
          !re.r.findFirstIn(once).isDefined
        }
    })
  }

  test("splitmix64 stream is collision-free over dense index ranges") {
    import graft.functions.SignProjection.mix64
    check(Prop.forAll(Gen.choose(0L, 1L << 40)) { base =>
      val vals = (0 until 512).map(i => mix64(base + i))
      vals.distinct.size == 512
    })
  }

  test("shuffle-order shard decomposition: unsigned key order == (shard, signed) lex order") {
    // the mathematical core of ShuffleOrder: shard = key >>> (64-b)
    // is order-aligned with UNSIGNED key order, and within a shard
    // (same top b >= 1 bits => same sign) SIGNED comparison agrees
    // with unsigned — so per-shard signed sorts + shard offsets
    // reproduce the global unsigned sort exactly
    val gen = for {
      k1 <- Gen.choose(Long.MinValue, Long.MaxValue)
      k2 <- Gen.choose(Long.MinValue, Long.MaxValue)
      b <- Gen.choose(1, 20)
    } yield (k1, k2, b)
    check(Prop.forAll(gen) { case (k1, k2, b) =>
      val unsignedLess = java.lang.Long.compareUnsigned(k1, k2) < 0
      val (s1, s2) = (k1 >>> (64 - b), k2 >>> (64 - b))
      val lexLess = s1 < s2 || (s1 == s2 && k1 < k2)
      unsignedLess == lexLess || k1 == k2
    })
  }

  test("curriculum key packing is bucket-major, hash-minor in unsigned order") {
    // key = bucket << (64-bb) | hash >>> bb: unsigned key order must
    // equal (bucket asc, hash-top-bits unsigned asc) lexicographic
    val gen = for {
      h1 <- Gen.choose(Long.MinValue, Long.MaxValue)
      h2 <- Gen.choose(Long.MinValue, Long.MaxValue)
      bb <- Gen.choose(1, 19)
      b1 <- Gen.choose(0L, (1L << bb) - 1)
      b2 <- Gen.choose(0L, (1L << bb) - 1)
    } yield (h1, h2, bb, b1, b2)
    check(Prop.forAll(gen) { case (h1, h2, bb, b1, b2) =>
      val k1 = (b1 << (64 - bb)) | (h1 >>> bb)
      val k2 = (b2 << (64 - bb)) | (h2 >>> bb)
      val keyLess = java.lang.Long.compareUnsigned(k1, k2) < 0
      val wantLess = b1 < b2 ||
        (b1 == b2 && java.lang.Long.compareUnsigned(h1 >>> bb, h2 >>> bb) < 0)
      keyLess == wantLess
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
