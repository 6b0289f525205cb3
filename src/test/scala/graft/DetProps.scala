package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-math properties of the Det rounding helpers (scalacheck):
  * these are the formulas both engines evaluate, so their algebraic
  * properties are what cross-engine hash-equality rests on.
  */
object DetProps extends Properties("Det") {

  private def rN(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.floor(x * p + 0.5) / p
  }

  private def rS(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.floor(math.abs(x) * p + 0.5) / p * math.signum(x)
  }

  private val pos: Gen[Double] = Gen.choose(0.0, 1e6)
  private val any: Gen[Double] = Gen.choose(-1e6, 1e6)
  private val digits: Gen[Int] = Gen.choose(0, 6)

  property("rN is idempotent") = Prop.forAll(pos, digits) { (x, n) =>
    rN(rN(x, n), n) == rN(x, n)
  }

  property("rN error bounded by half-ulp of the target scale") =
    Prop.forAll(pos, digits) { (x, n) =>
      math.abs(rN(x, n) - x) <= 0.5 * math.pow(10, -n) + 1e-9 * math.max(1.0, x)
    }

  property("rN is monotone") = Prop.forAll(pos, pos, digits) { (a, b, n) =>
    val (lo, hi) = if (a <= b) (a, b) else (b, a)
    rN(lo, n) <= rN(hi, n)
  }

  property("rS is odd: rS(-x) == -rS(x)") = Prop.forAll(any, digits) { (x, n) =>
    rS(-x, n) == -rS(x, n)
  }

  property("rS agrees with rN on positives") = Prop.forAll(pos, digits) { (x, n) =>
    rS(x, n) == rN(x, n)
  }
}
