package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY §2.9).
  *
  * Summing IEEE doubles is order-dependent, and Spark's partition/merge
  * order differs from DuckDB's — at 100 TB (or with AQE re-plans) the
  * addition order is never stable. The fix: per-element cast to decimal
  * (a deterministic rounding of an identical double in both engines —
  * decimal tie points like k.5·10⁻⁸ are never exactly representable in
  * binary, so the engines' tie-break rules can't diverge), then an EXACT
  * decimal sum (order-independent), then cast back to double (exact).
  * Element-level arithmetic stays in double — IEEE ops on identical
  * inputs are bit-identical across engines.
  */
object Det {
  /** Order-independent double sum. Oracle twin: `Det.oSum("expr")`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast("double")

  /** Order-independent double avg. Oracle twin: `Det.oAvg("expr")`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB-side SQL for [[dsum]]. */
  def oSum(e: String): String = s"cast(sum(cast(($e) as decimal(30,8))) as double)"

  /** DuckDB-side SQL for [[davg]]. */
  def oAvg(e: String): String = s"${oSum(e)} / count(*)"

  /** Per-row 2-dp rounding that is bit-identical across engines.
    * Engine `round()` implementations disagree on half-boundaries
    * (Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds in
    * float space), which bites on per-row money values whose decimal
    * repr ends in 5. `floor(x*100 + 0.5)/100` is pure IEEE arithmetic —
    * identical on identical inputs. Positive inputs only.
    */
  def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** DuckDB-side SQL for [[r2]]. */
  def oR2(e: String): String = s"floor(($e) * 100 + 0.5) / 100"

  /** [[r2]] generalized to n decimal places (positive inputs only). */
  def rN(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + lit(0.5)) / p
  }

  /** DuckDB-side SQL for [[rN]]. */
  def oRN(e: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($e) * $p + 0.5) / $p"
  }

  /** Signed per-row rounding: engines' round() disagree on half-points;
    * trunc-based symmetric rounding is pure IEEE arithmetic. */
  def rS(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    (floor(abs(c) * p + lit(0.5)) / p) * signum(c)
  }

  /** DuckDB-side SQL for [[rS]]. */
  def oRS(e: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"(floor(abs($e) * $p + 0.5) / $p) * sign($e)"
  }
}
