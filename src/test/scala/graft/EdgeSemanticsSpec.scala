package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics the oracle queries can't probe directly (VERDICT r1
  * item 9): exceptAll duplicate counting, last_value frame defaults,
  * ASOF tie-breaks and no-match drops, null handling in aggregates. */
class EdgeSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exceptAll preserves multiset difference counts") {
    val a = Seq(1, 1, 1, 2, 3).toDF("v")
    val b = Seq(1, 2, 2).toDF("v")
    val got = a.exceptAll(b).groupBy("v").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 2L, 3 -> 1L))
  }

  test("intersectAll takes multiset minimum counts") {
    val a = Seq(1, 1, 2, 2, 2).toDF("v")
    val b = Seq(1, 2, 2).toDF("v")
    val got = a.intersectAll(b).groupBy("v").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 2L))
  }

  test("last_value under default frame is current row; full frame is partition max") {
    val df = Seq((1, 10), (1, 20), (1, 30)).toDF("k", "v")
    val order = Window.partitionBy("k").orderBy("v")
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rows = df.select(
      last_value(col("v")).over(order).as("dflt"),
      last_value(col("v")).over(full).as("full")).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(10, 20, 30)) // default frame ends at current row
    assert(rows.map(_.getInt(1)).forall(_ == 30))
  }

  test("ASOF rewrite: ties break to larger id, unmatched left rows drop") {
    val purchases = Seq((100L, 1L, 50L)).toDF("p_id", "p_user", "p_ts")
    val clicks = Seq((1L, 1L, 50L), (2L, 1L, 50L), (3L, 1L, 60L), (4L, 2L, 10L))
      .toDF("c_id", "c_user", "c_ts")
    val w = Window.partitionBy("p_id").orderBy(col("c_ts").desc, col("c_id").desc)
    val got = purchases
      .join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("p_id", "c_id").collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L) // ts tie → larger c_id
    // a purchase by a user with no prior clicks yields no row (inner asof)
    val lonely = Seq((200L, 9L, 50L)).toDF("p_id", "p_user", "p_ts")
    assert(lonely.join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts")).count() == 0)
  }

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-edge").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("e6 cascade equals ordered-fold semantics on out-of-order arrival") {
    // rows written DELIBERATELY out of timestamp order: the conditional-min
    // cascade must be arrival-order independent (VERDICT r7 #2 done-gate)
    val dir = writeEvents(Seq(
      // user 1: view→click→purchase inside 24h, purchase row arrives first → level 3
      (5L, ts("2024-01-01 11:00:00"), 1L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-01 10:30:00"), 1L, "click", 1.0, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      // user 2: all clicks precede the first view → level 1
      (10L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (11L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (12L, ts("2024-01-01 09:30:00"), 2L, "click", 1.0, "{}"),
      // user 3: purchase at 10:15 precedes the click at 10:30 → level 2
      (20L, ts("2024-01-01 10:15:00"), 3L, "purchase", 1.0, "{}"),
      (21L, ts("2024-01-01 10:00:00"), 3L, "view", 1.0, "{}"),
      (22L, ts("2024-01-01 10:30:00"), 3L, "click", 1.0, "{}"),
      // user 4: purchase with no view → level 0
      (30L, ts("2024-01-01 12:00:00"), 4L, "purchase", 1.0, "{}"),
      // user 5: click at EXACTLY t1 (chain needs strictly-after) → level 1
      (40L, ts("2024-01-01 10:00:00"), 5L, "view", 1.0, "{}"),
      (41L, ts("2024-01-01 10:00:00"), 5L, "click", 1.0, "{}"),
      // user 6: click 25h after first view (outside the 24h window) → level 1
      (50L, ts("2024-01-01 10:00:00"), 6L, "view", 1.0, "{}"),
      (51L, ts("2024-01-02 11:00:00"), 6L, "click", 1.0, "{}")))
    val got = SparkEntry.queries("e6_window_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("c6 union+window rewrite: equal-ts match, tie to larger id, unmatched purchase drops") {
    val dir = writeEvents(Seq(
      (1L, ts("2024-01-01 00:00:50"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 00:00:50"), 1L, "click", 1.0, "{}"), // ts tie with click 1
      (3L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
      (100L, ts("2024-01-01 00:00:50"), 1L, "purchase", 1.0, "{}"), // equal ts → click 2 (>= + tie rule)
      (101L, ts("2024-01-01 00:01:10"), 1L, "purchase", 1.0, "{}"), // → click 3
      (200L, ts("2024-01-01 00:00:05"), 2L, "purchase", 1.0, "{}"))) // no prior click → dropped
    val got = SparkEntry.queries("c6_asof_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(100L -> 2L, 101L -> 3L))
  }

  test("e16 sweep: back-to-back intervals never double-count (half-open boundary)") {
    // durations are 60*(1 + event_id % 30) seconds; event_ids 0 and 30
    // both give 60 s, so interval 1 = [10:00:00, 10:01:00) and
    // interval 2 = [10:01:00, 10:02:00) share only the boundary instant,
    // where the -1 applies before the +1 → max_concurrent must be 1.
    // A third, genuinely overlapping interval elsewhere pins max = 2.
    val dir = writeEvents(Seq(
      (0L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (30L, ts("2024-01-01 10:01:00"), 1L, "view", 1.0, "{}"),
      (60L, ts("2024-01-02 10:00:00"), 2L, "view", 1.0, "{}"),   // 60s
      (90L, ts("2024-01-02 10:00:30"), 2L, "view", 1.0, "{}"))) // overlaps
    val r = SparkEntry.queries("e16_max_concurrent")(spark, dir).collect().head
    assert(r.getInt(0) == 2 && r.getLong(1) == 4L,
      s"max_concurrent=${r.getInt(0)} n_intervals=${r.getLong(1)}")
    // and with ONLY the back-to-back pair, the boundary must not count 2
    val dir2 = writeEvents(Seq(
      (0L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (30L, ts("2024-01-01 10:01:00"), 1L, "view", 1.0, "{}")))
    val r2 = SparkEntry.queries("e16_max_concurrent")(spark, dir2).collect().head
    assert(r2.getInt(0) == 1, s"back-to-back must stay 1, got ${r2.getInt(0)}")
  }

  test("count/sum ignore nulls; count(*) does not") {
    val df = Seq(Some(1), None, Some(3)).toDF("v")
    val r = df.agg(count(col("v")), count(lit(1)), sum(col("v"))).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 3 && r.getLong(2) == 4)
  }

  test("entropy edge: single-value group is exactly 0, uniform group is log2(k)") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "p"), ("b", "q"), ("b", "r"), ("b", "s")).toDF("g", "v")
    val h = df.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .groupBy("g")
      .agg((log2(sum(col("c"))) - sum(col("c") * log2(col("c"))) / sum(col("c"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h("a") == 0.0)
    assert(math.abs(h("b") - 2.0) < 1e-12) // uniform over 4 values
  }

  test("deltaSum edges: single event contributes 0; monotone decrease contributes 0") {
    val df = Seq((1L, 1L, 10.0), (2L, 1L, 7.0), (3L, 1L, 4.0), (4L, 2L, 5.0))
      .toDF("event_id", "user_id", "value")
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val r = df.withColumn("d", col("value") - lag("value", 1).over(w))
      .groupBy("user_id")
      .agg(sum(when(col("d") > 0, col("d")).otherwise(lit(0.0))).as("ds"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 0.0 && r(2L) == 0.0)
  }

  test("arrayDifference/cumSum edges: single-element array → [0] / [x]") {
    val r = spark.sql(
      """SELECT
        |  transform(sequence(1, size(a)), i ->
        |    CASE WHEN i = 1 THEN 0 ELSE element_at(a, i) - element_at(a, i - 1) END) AS d,
        |  aggregate(a, cast(array() as array<int>),
        |    (acc, x) -> concat(acc, array(coalesce(try_element_at(acc, -1), 0) + x))) AS c
        |FROM (SELECT array(7) AS a)""".stripMargin).collect().head
    assert(r.getSeq[Int](0) == Seq(0) && r.getSeq[Int](1) == Seq(7))
  }

  test("rank-select exact percentile equals builtin percentile (all groups, 3 ps)") {
    // d6 ships the distributed rank-select path (Aggregates.
    // exactPercentileByRank); pin it to Spark's own collect-all
    // `percentile` on real data — every group, fractional and exact
    // rank positions, two value columns.
    val li = Engine.t(spark, TestSpark.sf, "lineitem")
    val builtin = li.groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
      .orderBy("l_returnflag").collect().toSeq
    val ranked = graft.SparkEntry.queries("d6_quantiles")(spark, TestSpark.sf)
      .collect().toSeq
    assert(ranked == builtin)
  }

  test("rank-select percentile: single-row group and n=2 interpolation") {
    val df = Seq(("a", 7.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val got = graft.ops.Aggregates.exactPercentileByRank(df, "g", Seq(("v", 0.5, "p50")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 7.0, "b" -> 1.5))
  }

  test("LIMIT BY returns at most n rows per group and top-K equals sort-take") {
    val df = Seq(("a", 5), ("a", 3), ("a", 9), ("b", 1), ("b", 2)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val limited = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val counts = limited.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2))
    val topk = df.orderBy(col("v").desc).limit(2).collect().map(_.getInt(1)).toSeq
    val sorted = df.collect().map(_.getInt(1)).sorted(Ordering[Int].reverse).take(2).toSeq
    assert(topk == sorted)
  }
}
