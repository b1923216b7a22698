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
}
