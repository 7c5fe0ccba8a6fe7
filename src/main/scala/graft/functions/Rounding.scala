package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-portable decimal rounding: `floor(x·10^dp + 0.5) / 10^dp`.
  *
  * This is THE cross-engine rounding form for every oracle-compared
  * double in the repo — never `round()`: Spark's round is
  * HALF_UP on the decimal string, DuckDB's is banker's-adjacent on
  * the binary double, and they disagree on exact .5 boundaries;
  * the floor form evaluates identically in both engines (and for
  * negative values rounds half UP toward +∞ in both, consistently).
  * Every operator must use this single definition — the formula
  * appearing once per file is how the two engines drift.
  */
object Rounding {
  def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
}
