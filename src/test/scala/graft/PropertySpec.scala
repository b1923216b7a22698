package graft

import graft.operators.TrainingLoad
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests (seeded random sampling) for the pure kernels the
  * distributed operators lean on — no SparkSession, millisecond-fast, and
  * they pin down the math under arbitrary inputs rather than one example.
  */
class PropertySpec extends AnyFunSuite {

  private val rng = new Random(42)
  private val N = 500

  test("roundD formula is idempotent and within half-a-step of the value") {
    def r(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    (1 to N).foreach { _ =>
      val x = (rng.nextDouble() - 0.5) * 2e6
      assert(r(r(x)) == r(x), s"not idempotent at $x")
      assert(math.abs(r(x) - x) <= 0.00005 + math.ulp(x) * 1e4, s"too far at $x")
    }
  }

  test("emaFold length matches input and never leaves the input envelope") {
    (1 to N).foreach { _ =>
      val xs = List.fill(1 + rng.nextInt(60))(rng.nextDouble() * 1000.0)
      val span = 2 + rng.nextInt(59)
      val ema = TrainingLoad.emaFold(xs, span)
      assert(ema.length == xs.length)
      assert(ema.forall(v => v >= xs.min - 1e-9 && v <= xs.max + 1e-9),
        "EMA is a convex combination and cannot leave [min, max] of its input")
    }
  }

  test("emaFold of a constant series is that constant; first element passes through") {
    (1 to N).foreach { _ =>
      val c = (rng.nextDouble() - 0.5) * 200
      val span = 2 + rng.nextInt(59)
      val ema = TrainingLoad.emaFold(List.fill(1 + rng.nextInt(50))(c), span)
      assert(ema.forall(v => math.abs(v - c) < 1e-9))
      val xs = List.fill(5)(rng.nextDouble() * 10)
      assert(TrainingLoad.emaFold(xs, span).head == xs.head)
    }
  }

  test("larger span reacts more slowly to a step change") {
    val step = List.fill(30)(0.0) ++ List.fill(30)(100.0)
    val fast = TrainingLoad.emaFold(step, TrainingLoad.AtlSpan)
    val slow = TrainingLoad.emaFold(step, TrainingLoad.CtlSpan)
    // after the step, the short-span EMA is always at least as far along
    (30 until 60).foreach(i => assert(fast(i) >= slow(i) - 1e-9))
  }

  test("classifyForm is total and consistent with its thresholds") {
    (1 to N).foreach { _ =>
      val tsb = (rng.nextDouble() - 0.5) * 200
      val f = TrainingLoad.classifyForm(tsb)
      assert(Set("fresh", "neutral", "building", "fatigued")(f))
      if (tsb > 15) assert(f == "fresh")
      else if (tsb >= 0) assert(f == "neutral")
      else if (tsb >= -15) assert(f == "building")
      else assert(f == "fatigued")
    }
  }

  test("fakeDecode is deterministic and its features are in-range") {
    (1 to N).foreach { _ =>
      val id = rng.nextLong() % 100000
      val mt = Seq("image", "audio", "video")(rng.nextInt(3))
      val payload = Array.fill(rng.nextInt(500))(rng.nextInt(256).toByte)
      val a = graft.operators.Multimodal.fakeDecode(id, mt, payload)
      val b = graft.operators.Multimodal.fakeDecode(id, mt, payload.clone())
      assert(a == b, "decode must be a pure function of its inputs")
      assert(a.getInt(3) >= 64 && a.getInt(3) <= 64 + 15 * 32) // width
      assert(a.getInt(4) >= 64 && a.getInt(4) <= 64 + 15 * 32) // height
      assert(a.getDouble(5) >= 0.0 && a.getDouble(5) <= 255.0) // mean_luma
      if (mt != "video") assert(a.getInt(6) == 1)
    }
  }

  /** The JVM-arithmetic twin of [[Num.phi]]'s formula — same constants,
    * same association order, so it characterizes exactly what the Column
    * expression and the DuckDB mirror compute.
    */
  private def phiScalar(x: Double): Double = {
    val z = x / math.sqrt(2.0)
    val az = math.abs(z)
    val sg = if (z < 0) -1.0 else 1.0
    val t = 1.0 / (1.0 + 0.3275911 * az)
    val poly = ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592
    0.5 * (1.0 + sg * (1.0 - poly * t * math.exp(-az * az)))
  }

  test("phi formula is a CDF: bounded, monotone, symmetric, correct tails") {
    var prev = -1.0
    (-800 to 800).foreach { i =>
      val x = i / 100.0
      val p = phiScalar(x)
      assert(p >= 0.0 && p <= 1.0, s"phi($x) = $p out of range")
      assert(p >= prev - 1.5e-7, s"phi not monotone at $x")
      prev = p
      // the A&S erf is odd by construction for x ≠ 0 (± ulps); at x = 0
      // the branch takes sign +1 and the residual is the approximation
      // error itself (~1e-9), so the bound is the A&S error bound
      assert(math.abs(p + phiScalar(-x) - 1.0) < 2e-7, s"asymmetric at $x")
    }
    assert(phiScalar(-8.0) < 1e-7 && phiScalar(8.0) > 1.0 - 1e-7)
    // spot values vs the exact normal CDF, inside the 1.5e-7 A&S bound
    assert(math.abs(phiScalar(1.0) - 0.8413447461) < 2e-7)
    assert(math.abs(phiScalar(-1.96) - 0.0249978951) < 2e-7)
  }

  test("conjugate-posterior effect shrinks toward the data as evidence grows") {
    // with prior N(m0, v0) and likelihood mean m1, var v1/n: the posterior
    // mean is a convex combination — more post observations pull it closer
    // to the post mean. Mirrors q76's arithmetic (Experiments.scala).
    (1 to N).foreach { _ =>
      val m0 = (rng.nextDouble() - 0.5) * 100
      val m1 = (rng.nextDouble() - 0.5) * 100
      val v0 = 0.1 + rng.nextDouble() * 50
      val v1 = 0.1 + rng.nextDouble() * 50
      def postMean(n: Int): Double = {
        val lik = v1 / n
        val pv = 1.0 / (1.0 / v0 + 1.0 / lik)
        pv * (m0 / v0 + m1 / lik)
      }
      val small = postMean(2); val large = postMean(50)
      assert(math.abs(large - m1) <= math.abs(small - m1) + 1e-9,
        "more evidence must pull the posterior toward the data")
      Seq(small, large).foreach { pm =>
        assert(pm >= math.min(m0, m1) - 1e-9 && pm <= math.max(m0, m1) + 1e-9,
          "posterior mean must lie between prior and data means")
      }
    }
  }

  private def arr(xs: Array[Long]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs)

  test("MinhashBandsKernel equals the naive per-permutation minimum on random arrays") {
    import graft.functions.{MinhashBandsKernel, MinhashParams => MP}
    (1 to N).foreach { _ =>
      val xs = Array.fill(1 + rng.nextInt(120))(rng.nextLong().abs % (1L << 60))
      val out = MinhashBandsKernel.compute(arr(xs))
      val mins = MP.perms.map { case (a, b) => xs.map(x => (x % MP.P * a + b) % MP.P).min }
      val expected = (0 until MP.Bands).map(bd =>
        (0 until MP.RowsPerBand).map(r => mins(bd * MP.RowsPerBand + r)).mkString(":"))
      val got = (0 until MP.Bands).map(i => out.getUTF8String(i).toString)
      assert(got == expected)
    }
    // order invariance: a permutation of the shingle multiset gives identical bands
    val xs = Array.fill(50)(rng.nextLong().abs % (1L << 60))
    val shuffled = rng.shuffle(xs.toList).toArray
    assert((0 until MP.Bands).forall(i =>
      MinhashBandsKernel.compute(arr(xs)).getUTF8String(i).toString ==
        MinhashBandsKernel.compute(arr(shuffled)).getUTF8String(i).toString))
    // null contract: empty array is null
    assert(MinhashBandsKernel.compute(arr(Array.empty[Long])) == null)
  }

  test("CappedLongSet equals a reference distinct-set under random streams and merge trees") {
    import graft.functions.CappedLongSet
    (1 to N).foreach { _ =>
      val cap = 1 + rng.nextInt(40)
      val domain = 1 + rng.nextInt(80)
      val stream = Array.fill(1 + rng.nextInt(200))(rng.nextInt(domain).toLong)
      // random partitioning into partial buffers, then a merge chain —
      // the shapes partial aggregation actually produces
      val parts = stream.grouped(1 + rng.nextInt(stream.length)).map { chunk =>
        val b = new CappedLongSet(cap)
        chunk.foreach(b.add)
        b
      }.toSeq
      val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
      val distinct = stream.toSet
      if (distinct.size > cap)
        assert(merged.overflow && merged.set.isEmpty,
          s"df ${distinct.size} > cap $cap must overflow")
      else {
        assert(!merged.overflow)
        assert(merged.set == distinct, "non-overflow buffer must hold the exact distinct set")
      }
      // the storage invariant, at every point: checked inside add(); here
      // assert the end state too
      assert(merged.set.size <= cap)
    }
  }

  /** Naive in-memory Mann-Whitney — midranks via sorting, the textbook
    * formulas — characterizing exactly what q88's window formulation must
    * produce (Predictive.scala mannWhitneyPanel).
    */
  private def naiveMannWhitney(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    val pooled = (a.map((_, 1)) ++ b.map((_, 2))).sortBy(_._1)
    // value → average of its 1-based sorted positions (the midrank)
    val midOf = pooled.zipWithIndex.groupBy(_._1._1)
      .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.size }
    val r1 = a.map(midOf).sum
    val n1 = a.size.toDouble; val n2 = b.size.toDouble; val nn = n1 + n2
    val u1 = r1 - n1 * (n1 + 1.0) / 2.0
    val ties = pooled.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val sig2 = n1 * n2 / 12.0 * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    val mu = n1 * n2 / 2.0
    val z = (u1 - mu - 0.5 * math.signum(u1 - mu)) / math.sqrt(sig2)
    (u1, z)
  }

  test("q88's doubled-midrank algebra equals the naive sorted-rank Mann-Whitney") {
    (1 to N).foreach { _ =>
      // small value domains force heavy ties — the hard case
      val domain = 2 + rng.nextInt(8)
      val a = Seq.fill(5 + rng.nextInt(20))(rng.nextInt(domain).toDouble)
      val b = Seq.fill(5 + rng.nextInt(20))(rng.nextInt(domain).toDouble)
      if (!(a ++ b).forall(_ == (a ++ b).head)) { // σ > 0 guard, as q88 filters
        // replicate the window formulation: min_rank = count(less) + 1,
        // tie_n = count(equal), doubled midrank = 2·min_rank + tie_n − 1
        val pooled = a ++ b
        def dr(v: Double): Long =
          2L * (pooled.count(_ < v) + 1) + pooled.count(_ == v) - 1
        val r1 = a.map(dr).sum.toDouble / 2.0
        val n1 = a.size.toDouble; val n2 = b.size.toDouble; val nn = n1 + n2
        val u1 = r1 - n1 * (n1 + 1.0) / 2.0
        val tieSum = pooled.map(v => { val t = pooled.count(_ == v).toDouble; t * t - 1 }).sum
        val sig2 = n1 * n2 / 12.0 * ((nn + 1.0) - tieSum / (nn * (nn - 1.0)))
        val z = (u1 - n1 * n2 / 2.0 - 0.5 * math.signum(u1 - n1 * n2 / 2.0)) /
          math.sqrt(sig2)
        val (u1Ref, zRef) = naiveMannWhitney(a, b)
        assert(math.abs(u1 - u1Ref) < 1e-9, s"U $u1 vs $u1Ref")
        assert(math.abs(z - zRef) < 1e-9, s"z $z vs $zRef")
      }
    }
  }

  test("Simhash60Kernel equals the naive bit-vote fold and is order-invariant") {
    import graft.functions.Simhash60Kernel
    (1 to N).foreach { _ =>
      val hs = Array.fill(1 + rng.nextInt(120))(rng.nextLong().abs % (1L << 60))
      val got = Simhash60Kernel.compute(arr(hs)).asInstanceOf[Long]
      val expected = (0 until 60).map { b =>
        val vote = hs.map(h => if (((h >>> b) & 1L) != 0L) 1 else -1).sum
        if (vote > 0) 1L << b else 0L
      }.sum
      assert(got == expected)
      val shuffled = rng.shuffle(hs.toList).toArray
      assert(Simhash60Kernel.compute(arr(shuffled)) == got, "votes are order-invariant")
    }
    assert(Simhash60Kernel.compute(arr(Array.empty[Long])) == null)
  }
}
