package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the operator-ized form of
  * the reference's consolidated validations, cf.
  * src/silver/job-silver-rues.py RN-007 and `Profiler.validations`;
  * the API shape follows public Deequ/Great-Expectations practice).
  *
  * ALL row-level rules evaluate in ONE aggregation pass — a rule adds
  * one conditional-sum column, never a scan; `Unique` adds an exact
  * count-distinct to the same pass. The result is long-format
  * (rule, n_violations, violation_rate) so downstream gating is a
  * filter, and the whole check costs one job at any corpus size.
  */
object Expectations {

  sealed trait Rule {
    def name: String
    /** true where the row VIOLATES the rule (null-safe: a null that
      * isn't itself the subject of NotNull does not violate range or
      * pattern rules — unknown is not a failure).
      */
    def violation: Column
  }

  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
    def violation: Column = col(column).isNull
  }

  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column,$lo,$hi)"
    def violation: Column =
      col(column).isNotNull && (col(column) < lo || col(column) > hi)
  }

  final case class OneOf(column: String, values: Seq[String]) extends Rule {
    val name = s"one_of($column)"
    def violation: Column =
      col(column).isNotNull && !col(column).isin(values: _*)
  }

  final case class MatchesRegex(column: String, pattern: String) extends Rule {
    val name = s"matches_regex($column)"
    def violation: Column =
      col(column).isNotNull && !regexp_like(col(column), lit(pattern))
  }

  /** Arbitrary SQL predicate that each row must satisfy. */
  final case class Satisfies(name: String, predicate: String) extends Rule {
    def violation: Column = !coalesce(expr(predicate), lit(false))
  }

  /** Key-uniqueness — not row-local; folded into the same single
    * aggregation as an exact count-distinct.
    */
  final case class Unique(columns: Seq[String]) {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** One row per rule: (rule, n_rows, n_violations, violation_rate
    * 6 dp). Row rules and uniqueness rules all evaluate in a single
    * aggregation job.
    */
  def check(df: DataFrame, rules: Seq[Rule],
            unique: Seq[Unique] = Nil): DataFrame = {
    require(rules.nonEmpty || unique.nonEmpty, "no expectations given")
    val rowAggs = rules.map(r =>
      sum(when(r.violation, 1L).otherwise(0L)).as(r.name))
    val uniqAggs = unique.map(u =>
      (count(lit(1)) - count_distinct(struct(u.columns.map(col): _*))).as(u.name))
    val aggs = rowAggs ++ uniqAggs :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = rules.map(_.name) ++ unique.map(_.name)
    val entries = names.map(n =>
      struct(lit(n).as("rule"), col(s"`$n`").as("n_violations")))
    one.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("n_rows"),
        col("e.n_violations").as("n_violations"),
        when(col("n_rows") === 0, lit(0.0)).otherwise(
          floor(col("e.n_violations").cast("double") / col("n_rows")
            * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("violation_rate"))
  }
}
