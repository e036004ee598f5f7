package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve position: interleave the low 16 bits of two
  * non-negative dimensions into a 32-bit curve value. Pure bitwise Column
  * math (codegen'd, shuffle-free) with a digit-exact DuckDB rendering —
  * shared by the z1 layout query and [[graft.sinks.LayoutWriter]].
  */
object Morton {

  val Bits = 16

  /** zval = Σ_j ((x>>j)&1)<<2j | ((y>>j)&1)<<(2j+1); callers pre-mask the
    * dimensions into [0, 2^16) (`pmod`).
    */
  def z16(x: Column, y: Column): Column =
    (0 until Bits).map { j =>
      (shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)

  /** DuckDB SQL for [[z16]] over integer expressions `x`, `y`. */
  def sqlZ16(x: String, y: String): String =
    (0 until Bits).map { j =>
      s"((($x >> $j) & 1) * ${1L << (2 * j)} + (($y >> $j) & 1) * ${1L << (2 * j + 1)})"
    }.mkString(" + ")
}
