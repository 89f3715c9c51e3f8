package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Window-function surface (SURVEY §2.E). Spark's WindowExec sorts
  * within the key partition after one shuffle on partitionBy keys; all
  * windows below share their partitioning so a single exchange serves
  * each query at scale. Running decimal sums are exact prefix sums —
  * order-deterministic by the total ordering in every ORDER BY.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** E1: row_number / rank / dense_rank / ntile. Rank functions use a
    * bucketed (tie-producing) order key — deterministic because rank
    * depends only on key values; row_number gets a total order. */
  private def e1Ranking(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
      .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long"))
    val total = Window.partitionBy("c_nationkey")
      .orderBy(col("bal_bucket").desc, col("c_custkey").asc)
    val tied = Window.partitionBy("c_nationkey").orderBy(col("bal_bucket").desc)
    c.select(
        col("c_nationkey"), col("c_custkey"), col("bal_bucket"),
        row_number().over(total).as("rn"),
        rank().over(tied).as("rnk"),
        dense_rank().over(tied).as("drnk"),
        ntile(4).over(total).as("quartile"))
      .filter(col("rn") <= 5)
      .orderBy("c_nationkey", "c_custkey")
  }

  /** E2: lag/lead over per-user event streams. */
  private def e2LagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Engine.events(spark, dir)
      .filter(col("user_id") < 5)
      .select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("value") - lag(col("value"), 1, 0.0).over(w)).as("delta"))
      .orderBy("user_id", "event_id")
  }

  /** E3: first_value / last_value / nth_value with the explicit full
    * frame (last_value under the default frame is the current row). */
  private def e3FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Engine.t(spark, dir, "orders")
      .select(
        col("o_custkey"),
        row_number().over(order).as("rn"),
        first_value(col("o_orderkey")).over(full).as("first_ok"),
        last_value(col("o_orderkey")).over(full).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_ok"))
      .filter(col("rn") === 1)
      .select("o_custkey", "first_ok", "last_ok", "second_ok")
      .orderBy("o_custkey")
  }

  /** E4: aggregates over windows — exact running decimal sum. */
  private def e4RunningAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Engine.t(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(CH.dec(col("o_totalprice"))).over(w).cast("double").as("run_sum"),
        count(lit(1)).over(w).as("run_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E5: ROWS and RANGE frame specs. */
  private def e5Frames(spark: SparkSession, dir: String): DataFrame = {
    val rows3 = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_orderkey").asc)
      .rowsBetween(-2, Window.currentRow)
    val range5k = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc)
      .rangeBetween(-5000, Window.currentRow)
    Engine.t(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        round(avg(col("o_totalprice")).over(rows3), 6).as("avg3"),
        count(lit(1)).over(range5k).as("n_range"))
      .orderBy("o_orderkey")
  }

  /** E14: moving median — an exact quantile aggregate evaluated over a
    * sliding ROWS frame (CH `quantile` as a window fn). The daily
    * rollup happens first (exact decimal sums → exact doubles), so the
    * frame holds ≤7 exact values and the interpolated median is
    * engine-portable without rounding tricks. One shuffle for the
    * rollup, one window sort per event_type. */
  private def e14MovingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    Engine.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(CH.dec(col("value"))).cast("double").as("rev"))
      .withColumn("mm7", round(expr("percentile(rev, 0.5)").over(w), 6))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        col("rev"), col("mm7"))
      .orderBy("event_type", "day_s")
  }

  val queries: Map[String, Q] = Map(
    "e14_moving_median" -> (e14MovingMedian _),
    "e1_ranking" -> (e1Ranking _),
    "e2_lag_lead" -> (e2LagLead _),
    "e3_first_last_nth" -> (e3FirstLast _),
    "e4_running_agg" -> (e4RunningAgg _),
    "e5_frames" -> (e5Frames _))

  val oracles: Map[String, String] = Map(
    "e14_moving_median" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS rev
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, rev,
        |  round(quantile_cont(rev, 0.5) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mm7
        |FROM d ORDER BY event_type, day_s""".stripMargin,
    "e1_ranking" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |  row_number() OVER w_total AS rn,
        |  rank() OVER w_tied AS rnk,
        |  dense_rank() OVER w_tied AS drnk,
        |  ntile(4) OVER w_total AS quartile
        |FROM customer
        |WINDOW
        |  w_total AS (PARTITION BY c_nationkey ORDER BY CAST(floor(c_acctbal/1000) AS BIGINT) DESC, c_custkey ASC),
        |  w_tied AS (PARTITION BY c_nationkey ORDER BY CAST(floor(c_acctbal/1000) AS BIGINT) DESC)
        |QUALIFY rn <= 5
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "e2_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  value - lag(value, 1, 0.0) OVER w AS delta
        |FROM events WHERE user_id < 5
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "e3_first_last_nth" ->
      """SELECT o_custkey, first_ok, last_ok, second_ok FROM (
        |  SELECT o_custkey,
        |    row_number() OVER w AS rn,
        |    first_value(o_orderkey) OVER wf AS first_ok,
        |    last_value(o_orderkey) OVER wf AS last_ok,
        |    nth_value(o_orderkey, 2) OVER wf AS second_ok
        |  FROM orders
        |  WINDOW
        |    w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |    wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "e4_running_agg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS VARCHAR) AS DOUBLE) AS run_sum,
        |  count(*) OVER w AS run_n
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "e5_frames" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(avg(o_totalprice) OVER w3, 6) AS avg3,
        |  count(*) OVER wr AS n_range
        |FROM orders WHERE o_custkey < 50
        |WINDOW
        |  w3 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  wr AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
        |         RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
}
