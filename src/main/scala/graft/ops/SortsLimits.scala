package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine

/** Sort / limit / top-K surface (SURVEY §2.F), including the
  * ClickHouse-specific `LIMIT n BY col` (F4) and `ORDER BY … WITH FILL`
  * (F5) rewrites. ORDER BY + LIMIT plans as TakeOrderedAndProject —
  * a true distributed top-K with no global sort, the shape that matters
  * at 100 TB. External sort spill is automatic (reference analog:
  * `tmp_path`, Dockerfile:214).
  */
object SortsLimits {
  type Q = (SparkSession, String) => DataFrame

  /** F1: multi-key sort, mixed ASC/DESC, unique tiebreak. */
  private def f1SortMulti(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .orderBy(col("l_returnflag").asc, col("l_quantity").desc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(1000)

  /** F2: LIMIT with OFFSET after a total order. */
  private def f2LimitOffset(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(100).limit(50)

  /** F3: ORDER BY + LIMIT top-K → TakeOrderedAndProject. */
  private def f3TopK(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** F4: LIMIT n BY col — per-group top-n via row_number (ClickHouse
    * extension; same rewrite DuckDB expresses with QUALIFY).
    *
    * Plan note (audited via `graft.Explain`): Catalyst rewrites the
    * `row_number <= n` filter into `WindowGroupLimit`, with a PARTIAL
    * instance ahead of the exchange — each map task forwards at most n
    * rows per group, so the shuffle carries O(groups × n × tasks)
    * rows, not the full table. This is why the declarative rewrite IS
    * the scale path and no custom per-group-heap operator is needed. */
  private def f4LimitBy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Engine.t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
      .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
  }

  /** F5: ORDER BY … WITH FILL — generate the date spine with
    * sequence+explode, left-join the sparse aggregate, fill zeros. */
  private def f5WithFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Engine.t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .filter(col("o_orderdate").between(lit("1997-01-01").cast("date"), lit("1997-01-31").cast("date")))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = spark.range(1)
      .select(explode(sequence(
        lit("1997-01-01").cast("date"), lit("1997-01-31").cast("date"),
        expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day")
  }

  /** F6: `LIMIT n WITH TIES` — top-n plus every row tied with the nth
    * on the sort key. Semantics ≡ rank() ≤ n (rank, not row_number),
    * which is also the scale implementation: Spark's WindowGroupLimit
    * pushes the rank filter below the exchange, so each task emits at
    * most its local candidates — no global sort of the full input. */
  private def f6WithTies(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("p_size").desc)
    Engine.t(spark, dir, "part")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 10)
      .select("p_partkey", "p_size", "rk")
      .orderBy(col("p_size").desc, col("p_partkey").asc)
  }

  /** F4b (VERDICT r16 #7): `LIMIT n BY` as ClickHouse SQL *text*
    * through [[graft.ChSql]] — rewritten to the same row_number ≤ n /
    * WindowGroupLimit shape as f4, certified by f4's oracle. */
  private def f4bLimitBySql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 3 BY o_orderstatus""".stripMargin)
  }

  /** F5b (VERDICT r16 #7): `ORDER BY … WITH FILL FROM … TO … STEP` as
    * CH SQL *text* — ChSql generates the date spine and the full-outer
    * fill join; TO is exclusive per CH, so the CH text says TO
    * 1997-02-01 for the same January window as f5. The trailing
    * date_format matches f5's string-rendered day (the fill itself
    * runs on DATE). */
  private def f5bWithFillSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT to_date(o_orderdate) AS day, count(*) AS n FROM orders
        |WHERE o_totalprice > 400000
        |  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-01-31 00:00:00'
        |GROUP BY to_date(o_orderdate)
        |ORDER BY day WITH FILL FROM DATE '1997-01-01' TO DATE '1997-02-01' STEP INTERVAL 1 DAY""".stripMargin)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"))
  }

  val queries: Map[String, Q] = Map(
    "f4b_limit_by_sql" -> (f4bLimitBySql _),
    "f5b_with_fill_sql" -> (f5bWithFillSql _),
    "f6_with_ties" -> (f6WithTies _),
    "f1_sort_multi" -> (f1SortMulti _),
    "f2_limit_offset" -> (f2LimitOffset _),
    "f3_topk" -> (f3TopK _),
    "f4_limit_by" -> (f4LimitBy _),
    "f5_with_fill" -> (f5WithFill _))

  val oracles: Map[String, String] = Map(
    // f4b/f5b: the CH-dialect TEXT front door routes to the same
    // semantics, so the oracles are f4's/f5's verbatim.
    "f4b_limit_by_sql" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "f5b_with_fill_sql" ->
      """SELECT strftime(d, '%Y-%m-%d') AS day, coalesce(n, 0) AS n
        |FROM (SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-01-31', INTERVAL 1 DAY)) AS d)
        |LEFT JOIN (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
        |  WHERE o_totalprice > 400000
        |    AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-01-31 00:00:00'
        |  GROUP BY 1
        |) ON CAST(d AS DATE) = day
        |ORDER BY day""".stripMargin,
    "f6_with_ties" ->
      """SELECT p_partkey, p_size, CAST(rk AS INT) AS rk FROM (
        |  SELECT p_partkey, p_size, rank() OVER (ORDER BY p_size DESC) AS rk
        |  FROM part)
        |WHERE rk <= 10 ORDER BY p_size DESC, p_partkey""".stripMargin,
    "f1_sort_multi" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 1000""".stripMargin,
    "f2_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 50 OFFSET 100""".stripMargin,
    "f3_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "f4_limit_by" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "f5_with_fill" ->
      """SELECT strftime(d, '%Y-%m-%d') AS day, coalesce(n, 0) AS n
        |FROM (SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-01-31', INTERVAL 1 DAY)) AS d)
        |LEFT JOIN (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
        |  WHERE o_totalprice > 400000
        |    AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-01-31 00:00:00'
        |  GROUP BY 1
        |) ON CAST(d AS DATE) = day
        |ORDER BY day""".stripMargin)
}
