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

  /** Single-partition window key the optimizer cannot fold away:
    * pmod(xxhash64(c), 1) is identically 0 but non-foldable (a literal
    * key like lit(0) is constant-folded OUT of the partition spec,
    * leaving the window partitionless again). Use for
    * deliberately-global windows over BOUNDED frames (vocab ranks,
    * bins, deciles, top-k lists): the execution is the same single
    * partition a partitionless window uses, but WindowExec sees a real
    * partition spec — keeping the "No Partition Defined" warning
    * channel clean for REAL regressions (a global window over an
    * unbounded table). */
  def onePart(c: Column): Column = pmod(xxhash64(c), lit(1))

  /** Order-independent double avg. Oracle twin: `Det.oAvg("expr")`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB-side SQL for [[dsum]]. */
  def oSum(e: String): String = s"cast(sum(cast(($e) as decimal(30,8))) as double)"

  /** DuckDB-side SQL for [[davg]]. */
  def oAvg(e: String): String = s"${oSum(e)} / count(*)"

  /** Epoch microseconds of a TIMESTAMP_NTZ — a zero-cost codegen
    * IDENTITY ([[org.apache.spark.sql.graftx.NtzEpochMicros]]): the NTZ
    * physical representation IS naive epoch micros, so no conversion
    * code runs and no session time zone can be consulted. Never spell
    * this `unix_micros(cast(c as timestamp))` — the NTZ→instant cast
    * applies the session zone (and is even non-linear across DST gaps;
    * probed empirically across the 2024-03-10 US gap: both that
    * spelling and `timestamp_diff` on NTZ shift). Equal to the UTC
    * value every DuckDB oracle computes, in EVERY session zone.
    *
    * The inverse direction (epoch µs → NTZ) is the sibling identity
    * `MicrosToNtz`; [[Tables.events]] constructs NTZ with naive
    * `timestampadd` (verified TZ-invariant by the same probe).
    */
  def ntzMicros(c: Column): Column = org.apache.spark.sql.graftx.NtzReinterpret.micros(c)

  /** Field-arithmetic twin of [[ntzMicros]] (date_diff/hour/minute/
    * extract-SECOND — sub-second exact via the DECIMAL(8,6) fraction),
    * TZ-invariant by construction — kept as the independent witness
    * that the reinterpret's physical-representation assumption holds
    * (TzRobustnessSpec asserts equality on the real events data under
    * two session zones). Not used in query paths. */
  private[graft] def ntzMicrosFields(c: Column): Column =
    date_diff(to_date(c), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * 86400000000L +
      hour(c).cast("long") * 3600000000L +
      minute(c).cast("long") * 60000000L +
      (date_part(lit("SECOND"), c) * 1000000).cast("long")

  /** `date_trunc('hour', c)` for TIMESTAMP_NTZ, WITHOUT the session-zone
    * shift: Spark's `date_trunc` only accepts TIMESTAMP, so an NTZ input
    * is implicitly cast through the session zone (probed: the result
    * even lands on a different hour across a DST gap) and the output
    * becomes an instant. This spelling — zero-cost reinterpret, long
    * floor-to-hour, reinterpret back — stays TIMESTAMP_NTZ and is
    * identical in every session zone. `x − pmod(x, m)` is floor
    * alignment for ANY sign, so pre-1970 values truncate correctly. */
  def ntzTruncHour(c: Column): Column = {
    val m = ntzMicros(c)
    org.apache.spark.sql.graftx.NtzReinterpret.ntz(m - pmod(m, lit(3600000000L)))
  }

  /** `date_trunc('day', c)` for TIMESTAMP_NTZ — see [[ntzTruncHour]]. */
  def ntzTruncDay(c: Column): Column = {
    val m = ntzMicros(c)
    org.apache.spark.sql.graftx.NtzReinterpret.ntz(m - pmod(m, lit(86400000000L)))
  }

  /** `date_trunc('week', c)` (ISO Monday start, like DuckDB's) for
    * TIMESTAMP_NTZ — see [[ntzTruncHour]] for why the built-in spelling
    * is zone-shifted. Day alignment is the pmod floor; the week step
    * subtracts `weekday(date(c))` days (Monday = 0) — the NTZ→DATE cast
    * is pure field extraction, no instant, so the whole expression is
    * session-zone-free. 1970-01-01 was a Thursday, so the epoch floor
    * alone would align to Thursdays; weekday() carries the calendar. */
  def ntzTruncWeek(c: Column): Column = {
    val m   = ntzMicros(c)
    val day = m - pmod(m, lit(86400000000L))
    org.apache.spark.sql.graftx.NtzReinterpret.ntz(
      day - weekday(c.cast("date")).cast("long") * lit(86400000000L)
    )
  }

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
