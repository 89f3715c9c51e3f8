package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Engine

/** D12: user-visible partial-aggregate state (the reference's
  * `AggregateFunction` / `-State`/`-Merge` combinator surface) as a
  * typed `Aggregator` registered through `udaf()` — Spark runs it
  * partial→merge→finish exactly like the engine's two-level hash agg.
  */
object Udafs {
  type Q = (SparkSession, String) => DataFrame

  /** Exact sum of squares over integral-valued doubles, carried in a
    * Long state — associative/commutative, so partial states merge
    * exactly (the property SURVEY §5 tests by scalacheck). */
  object SumSqState extends Aggregator[Double, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = b + (a.toLong * a.toLong)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private def d12PartialState(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("sum_sq", udaf(SumSqState))
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("sum_sq(l_quantity)").as("sum_sq_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "d12_partial_state" -> (d12PartialState _))

  val oracles: Map[String, String] = Map(
    "d12_partial_state" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_sq_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
