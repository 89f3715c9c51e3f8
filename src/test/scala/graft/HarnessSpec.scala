package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry yields rows; every declared oracle key
  * exists in queries; query names are unique across modules. */
class HarnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps do not collide") {
    val all = Seq(
      ops.Basics.queries, ops.Joins.queries, ops.Aggregates.queries,
      ops.Windows.queries, ops.Events.queries, ops.SortsLimits.queries, ops.SetOps.queries,
      ops.Functions.queries, ops.LlmText.queries, ops.LlmPipeline.queries,
      ops.LlmVector.queries,
      ops.Multimodal.queries, ops.Formats.queries, ops.Storage.queries,
      ops.SystemTables.queries, ops.Streaming.queries, ops.Udafs.queries,
      ops.Sampling.queries, fuzz.Differential.queries)
    val total = all.map(_.size).sum
    assert(SparkEntry.queries.size == total, "duplicate query names across modules")
  }

  test("approximate distinct stays within 10% of exact at sf0.001") {
    import org.apache.spark.sql.functions._
    val o = Engine.t(spark, TestSpark.sf, "orders")
    val r = o.agg(approx_count_distinct(col("o_custkey")).as("a"),
      count_distinct(col("o_custkey")).as("e")).collect().head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.10, s"approx=$a exact=$e")
  }
}
