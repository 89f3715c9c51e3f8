package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join must execute with zero shuffle
  * exchanges on the join inputs — the 100 TB fact-fact join shape. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join plan has no shuffle exchange") {
    // at sf0.001 the planner would (correctly) broadcast the small
    // side; disable broadcast so the bucketed path is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined =
      try ops.Storage.bucketedJoinPlan(spark, TestSpark.sf)
      finally {}
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a co-located join, plan:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle, plan:\n$plan")
    // and the result matches the unbucketed join
    val expected = Engine.t(spark, TestSpark.sf, "orders")
      .join(Engine.t(spark, TestSpark.sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey")).count()
    try assert(joined.count() == expected)
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
