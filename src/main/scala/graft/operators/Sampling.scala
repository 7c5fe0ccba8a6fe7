package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key sampling / top-n selection.
  *
  * `perKey` takes the first `n` rows of each key group under an
  * explicit ordering — pass a hash (`xxhash64(id, salt)`) for
  * deterministic pseudo-random samples, or a real column for top-n
  * semantics. One shuffle on the key; Spark 4 plans the rank filter
  * as WindowGroupLimit, so each mapper forwards at most n candidate
  * rows per key before the exchange — the property that makes
  * "3 examples per language over 100 TB" cheap.
  */
object Sampling {

  def perKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Deterministic pseudo-random n-per-key sample. */
  def randomPerKey(df: DataFrame, keys: Seq[String], idCol: String,
                   n: Int, salt: Int = 0): DataFrame =
    perKey(df, keys, Seq(xxhash64(col(idCol), lit(salt)), col(idCol)), n)
}
