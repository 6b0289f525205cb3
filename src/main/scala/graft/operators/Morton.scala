package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE Morton/Z-order bit-interleave kernel — one spelling, two
  * callers ([[Maintenance.maintZorder]]'s cell report and
  * [[Extras.zValueOf]] behind ExtrasSpec's on-disk skipping proof), so
  * the curve definition cannot fork between the registry row and the
  * file-level evidence (r13 review finding: the two sites had
  * independent implementations with opposite bit parity).
  *
  * Interleaves the low `bits` bits of `even` into even output
  * positions and of `odd` into odd positions; terms occupy disjoint
  * bits so the `+` fold equals an OR. Callers with an over-range
  * dimension add their own high-bit carry above position `2*bits`
  * (see maintZorder). Pure codegen'd shift/mask arithmetic;
  * [[zvalSql]] is the bit-identical DuckDB twin. */
private[operators] object Morton {

  def zval(even: Column, odd: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(even, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(odd, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
      .reduce(_ + _)

  def zvalSql(even: String, odd: String, bits: Int): String =
    (0 until bits)
      .map(i => s"(((($even >> $i) & 1) << ${2 * i}) + ((($odd >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" + ")
}
