package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Scan / projection / filter / predicate surface (SURVEY §2.A1/A8,
  * §2.B) plus conditionals (H5) and conversions (H6), and the flagship
  * pricing-summary query (SURVEY §7.3).
  *
  * Determinism contract (SURVEY §7.1): every query ends in a total
  * ORDER BY over its output columns; money aggregates run in
  * DecimalType and are emitted as DOUBLE so both engines hash the same
  * IEEE value; per-row double arithmetic is already bit-deterministic.
  */
object Basics {
  type Q = (SparkSession, String) => DataFrame

  /** SURVEY §7.3 flagship: TPC-H-Q1-shaped pricing summary.
    * scan → pushed filter → hash agg (partial+final) → sort.
    * At 100 TB this is a single shuffle on two low-cardinality keys;
    * decimal sums are associative so map-side partial agg is exact. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Engine.t(spark, dir, "lineitem")
    val qty   = CH.dec(col("l_quantity"))            // DECIMAL(12,2)
    val price = CH.dec(col("l_extendedprice"))
    val disc  = CH.dec(col("l_discount"), 8, 4)
    val tax   = CH.dec(col("l_tax"), 8, 4)
    // Keep multiplicand precision tight or Spark's decimal-precision
    // promotion exceeds 38 and silently rounds the product to scale 6.
    val oneMinusDisc = CH.dec(lit(1) - disc, 8, 4)
    val onePlusTax   = CH.dec(lit(1) + tax, 8, 4)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * oneMinusDisc).cast("double").as("sum_disc_price"),
        sum(price * oneMinusDisc * onePlusTax).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1)).cast("double")).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4)) * CAST(1 + CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
      |  CAST(CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A1: columnar scan with pushed filter + pruned columns (reference
    * partition/mark-skipping surface, `Dockerfile:228,212`). The scan
    * should show PushedFilters + a 2-column ReadSchema. */
  private def a1Scan(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .filter(col("l_quantity") < 3 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")

  /** A8: `file()`-style ad-hoc query over a path — exactly
    * `clickhouse-local` mode (reference `Dockefile-ubuntu:52`). */
  private def a8File(spark: SparkSession, dir: String): DataFrame =
    Engine.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** A16: `numbers(N)` table function — the reference's generator
    * source for ad-hoc series (system.numbers). `spark.range` is the
    * exact equivalent: a parallel, partitioned range with no storage
    * behind it (at scale the range splits across executors like any
    * scan). */
  private def a16Numbers(spark: SparkSession, dir: String): DataFrame =
    spark.range(1L, 1001L)
      .groupBy((col("id") % 7).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("id") * col("id")).as("sum_sq"))
      .orderBy("bucket")

  /** B1: projection, aliases, computed columns. */
  private def b1Project(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("p_name_u"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      (col("p_retailprice") * 0.9).as("discounted"),
      (col("p_size") + 1).as("size1"))
      .orderBy("p_partkey")

  /** B2: WHERE with AND/OR/NOT, IN(list), BETWEEN, LIKE. */
  private def b2Filter(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .filter(
        (col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(1000, 50000) &&
          col("o_orderpriority").like("1%")) ||
        (!col("o_orderstatus").isin("O", "F", "P") && col("o_totalprice") > 400000))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  /** B3: PREWHERE — in Spark the cheap selective predicate is simply
    * pushed to the Parquet scan by Catalyst; semantics equal WHERE. */
  private def b3Prewhere(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .filter(col("l_quantity") <= 2)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date"))
      .select("l_orderkey", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_partkey", "l_quantity")

  /** B4: IN (subquery) → left-semi join (Catalyst's own rewrite). */
  private def b4InSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val bigOrders = Engine.t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_custkey")
    c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** H5: conditionals — multiIf, coalesce/nullif, greatest/least. */
  private def h5Conditionals(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .select(
        CH.multiIf(
          (col("c_acctbal") < 0, lit("neg")),
          (col("c_acctbal") < 1000, lit("low")),
          (col("c_acctbal") < 5000, lit("mid")))(lit("high")).as("bal_bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("AUTOMOBILE")), lit("OTHER")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_nationkey"), lit(10)).as("nk_cap"))
      .groupBy("bal_bucket", "seg", "nk_cap")
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("bal_floor"))).cast("double").as("sum_bal"))
      .orderBy("bal_bucket", "seg", "nk_cap")

  /** H6: conversions — CAST across int/string/date/decimal, parse back. */
  private def h6Conversions(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("price_dec"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od_str"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd")).cast("string").as("od_roundtrip"))
      .orderBy("o_orderkey")

  /** B6: `SELECT … FINAL` — ReplacingMergeTree read-side collapse:
    * duplicate keys (an update stream appended onto a base) resolve to
    * the highest-version row at READ time, no rewrite of the base.
    * Spark-native: `max_by(struct(payload), version)` per key — an
    * aggregate, not a window, so it partial-aggregates map-side and
    * the exchange carries one candidate row per key per task (a
    * window's rank would sort whole partitions; at 100 TB the
    * max_by form is the one that scales). */
  private def b6Final(spark: SparkSession, dir: String): DataFrame = {
    val o = Engine.t(spark, dir, "orders")
    val base = o.select(col("o_orderkey"), CH.dec(col("o_totalprice")).as("price"),
      col("o_orderstatus"), lit(1).as("version"))
    val updates = o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"),
        (CH.dec(col("o_totalprice")) * 2).cast("decimal(12,2)").as("price"),
        lit("U").as("o_orderstatus"), lit(2).as("version"))
    base.unionByName(updates)
      .groupBy("o_orderkey")
      .agg(max_by(struct(col("price"), col("o_orderstatus")), col("version")).as("r"))
      .select(col("o_orderkey"), col("r.price"), col("r.o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** B3b (VERDICT r16 #7): the same PREWHERE query as b3, entered as
    * ClickHouse SQL *text* through the [[graft.ChSql]] dialect front
    * door — certifies the PREWHERE→WHERE-conjunction rewrite against
    * the b3 oracle end-to-end. */
  private def b3bPrewhereSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |PREWHERE l_quantity <= 2
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin)
  }

  /** B6b (VERDICT r16 #7): `SELECT … FROM t FINAL` as CH SQL *text* —
    * the same versioned base∪updates table as b6, registered as a view
    * with ReplacingMergeTree metadata; [[graft.ChSql]] rewrites FINAL
    * into the max_by(struct, version) read-side collapse and the b6
    * oracle certifies the result. */
  private def b6bFinalSql(spark: SparkSession, dir: String): DataFrame = {
    val o = Engine.t(spark, dir, "orders")
    val base = o.select(col("o_orderkey"), CH.dec(col("o_totalprice")).as("price"),
      col("o_orderstatus"), lit(1).as("version"))
    val updates = o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"),
        (CH.dec(col("o_totalprice")) * 2).cast("decimal(12,2)").as("price"),
        lit("U").as("o_orderstatus"), lit(2).as("version"))
    base.unionByName(updates).createOrReplaceTempView("orders_versioned")
    graft.ChSql.registerFinal("orders_versioned", Seq("o_orderkey"), "version")
    graft.ChSql.sql(spark,
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(price) AS DOUBLE) AS sum_price
        |FROM orders_versioned FINAL
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** B4b: CH `GLOBAL IN` as SQL *text* — [[graft.ChSql]] strips the
    * GLOBAL distribution hint (Spark subqueries are already
    * cluster-global; c9 pins the broadcast physical shape) and the
    * query becomes b4's plain IN-subquery, certified by b4's oracle. */
  private def b4bGlobalInSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey GLOBAL IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** B7: CH projection modifiers — `* EXCEPT(col)`, `* REPLACE(expr AS
    * col)`, and `COLUMNS('regex')`. All three are plan-time schema
    * rewrites (the schema is known before execution, so the "dynamic"
    * column set costs nothing at runtime): EXCEPT = drop, REPLACE =
    * withColumn, COLUMNS = a name-regex filter over `df.columns`. */
  private def b7SelectModifiers(spark: SparkSession, dir: String): DataFrame = {
    val d = Engine.t(spark, dir, "customer")
    val star = d.drop("c_mktsegment") // * EXCEPT(c_mktsegment)
      .withColumn("c_acctbal", // * REPLACE(round(c_acctbal) AS c_acctbal)
        floor(col("c_acctbal")).cast("long"))
    val nCols = d.columns.filter(_.matches("c_n.*")) // COLUMNS('c_n.*')
    star.select((star.columns.filterNot(nCols.contains).map(col) ++
        nCols.map(n => col(n).as(s"sel_$n"))).toIndexedSeq: _*)
      .orderBy("c_custkey")
  }

  /** Q3 (second flagship): shipping-priority — the classic
    * select-project-join-aggregate-topk spine: segment-filtered
    * customer dim joins orders (both sides prune + push filters),
    * lineitem joins on orderkey, revenue aggregates per order, top 10
    * by revenue. Plan: customer is dim-sized → broadcast; the orders ⋈
    * lineitem equi-join shuffles on l_orderkey only AFTER both scans
    * filtered; final top-10 is TakeOrderedAndProject (no global
    * sort materializes). */
  private def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("date")
    val c = Engine.t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Engine.t(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Engine.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val revenue = CH.dec(col("l_extendedprice")) * CH.dec(lit(1) - CH.dec(col("l_discount"), 8, 4), 8, 4)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("revenue"), col("n_lines"))
  }

  /** Q5: local-supplier volume — the TPC-H Q5 join spine as the third
    * flagship: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
    * region with the same-nation (customer trades with a local
    * supplier) constraint. Scale shape: region and the region-filtered
    * nation list are explicit broadcasts (true dims); customer and
    * supplier get NO hint — AQE picks broadcast at test SF from real
    * stats and degrades them to shuffled hash joins when they outgrow
    * the threshold, on the same declarative plan. The one unavoidable
    * fact-fact exchange is lineitem ⋈ orders on orderkey. Decimal
    * revenue exits as a correctly-rounded double (q1 discipline). */
  private def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("date")
    val hi = lit("1997-01-01").cast("date")
    val r = Engine.t(spark, dir, "region")
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Engine.t(spark, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Engine.t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val o = Engine.t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val s = Engine.t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val l = Engine.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val revenue = CH.dec(col("l_extendedprice")) *
      CH.dec(lit(1) - CH.dec(col("l_discount"), 8, 4), 8, 4)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** B8: WITH/CTE reuse — the TPC-H Q11 shape: an aggregate subquery
    * consumed twice (per-key totals AND their global average). Catalyst
    * plans the shared subtree once where exchange reuse applies; the
    * global average is a one-row broadcast, so the second consumption
    * costs nothing at scale. */
  private def b8CteReuse(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Engine.t(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(CH.dec(col("l_quantity"))).as("tq"))
    val globalAvg = perPart.agg((sum(col("tq")) / count(lit(1))).as("avg_tq"))
    perPart.crossJoin(broadcast(globalAvg))
      .filter(col("tq") > col("avg_tq") * 1.5)
      .select(col("l_partkey"), col("tq").cast("double").as("total_qty"))
      .orderBy("l_partkey")
  }

  /** Q6: forecast-revenue-change — TPC-H Q6's pure scan-side
    * aggregate: no join at all; the date band, discount band, and
    * quantity cap all push into the parquet scan (min/max row-group
    * pruning does the rest on a date-sorted layout), and the single
    * global aggregate is a partial+final pair whose exchange carries
    * ONE buffer per task. At 100 TB this is the IO-bound best case —
    * the engine's floor for full-scan throughput. The discount band
    * compares in exact integer cents on both engines (`l_discount` is
    * a double; 0.05 ≤ x ≤ 0.07 on binary doubles is the classic
    * off-by-one-ulp trap). */
  private def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_discount") * 100).cast("int")
    Engine.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("date") &&
        col("l_shipdate") < lit("1995-01-01").cast("date") &&
        col("l_quantity") < 24)
      .filter(cents.between(5, 7))
      .agg(
        sum(CH.dec(col("l_extendedprice")) * CH.dec(col("l_discount"), 8, 4))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q14: promotion effect — TPC-H Q14: one month of lineitem joined
    * to `part` for the PROMO share of revenue. The fact side carries
    * its date filter into the scan; `part` gets no hint — AQE
    * broadcasts it while it fits and degrades to a shuffled hash join
    * past the threshold (same policy as q5's customer/supplier).
    * Decimal revenue throughout; the percentage division happens in
    * doubles (+,×,/ are IEEE-identical cross-engine) and rounds to
    * 6 dp on both sides. */
  private def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val rev = CH.dec(col("l_extendedprice")) *
      CH.dec(lit(1) - CH.dec(col("l_discount"), 8, 4), 8, 4)
    val l = Engine.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("date") &&
        col("l_shipdate") < lit("1995-10-01").cast("date"))
      .select(col("l_partkey"), rev.as("rev"))
    val p = Engine.t(spark, dir, "part").select("p_partkey", "p_type")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), col("rev"))).as("promo"),
        sum(col("rev")).as("total"),
        count(lit(1)).as("n_lines"))
      .select(
        round(lit(100.0) * col("promo").cast("double") / col("total").cast("double"), 6)
          .as("promo_pct"),
        col("promo").cast("double").as("promo_revenue"),
        col("n_lines"))
  }

  val queries: Map[String, Q] = Map(
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q14_promo_effect" -> (q14PromoEffect _),
    "b8_cte_reuse" -> (b8CteReuse _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "b7_select_modifiers" -> (b7SelectModifiers _),
    "b6_final" -> (b6Final _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "a1_scan_prune" -> (a1Scan _),
    "a8_file_query" -> (a8File _),
    "a16_numbers" -> (a16Numbers _),
    "b1_project_alias" -> (b1Project _),
    "b2_filter_predicates" -> (b2Filter _),
    "b3_prewhere" -> (b3Prewhere _),
    "b3b_prewhere_sql" -> (b3bPrewhereSql _),
    "b6b_final_sql" -> (b6bFinalSql _),
    "b4_in_subquery" -> (b4InSubquery _),
    "b4b_global_in_sql" -> (b4bGlobalInSql _),
    "h5_conditionals" -> (h5Conditionals _),
    "h6_conversions" -> (h6Conversions _))

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_quantity < 24
        |  AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7""".stripMargin,
    "q14_promo_effect" ->
      """WITH j AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4)) AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |    AND l_shipdate < TIMESTAMP '1995-10-01')
        |SELECT round(100.0 * CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev END) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE), 6) AS promo_pct,
        |  CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        |  count(*) AS n_lines
        |FROM j""".stripMargin,
    "b8_cte_reuse" ->
      """WITH pp AS (SELECT l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS tq
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(CAST(tq AS VARCHAR) AS DOUBLE) AS total_qty
        |FROM pp WHERE tq > (SELECT sum(tq) / count(*) FROM pp) * 1.5
        |ORDER BY l_partkey""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
        |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(1 - CAST(l.l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,
    "b7_select_modifiers" ->
      """SELECT c_custkey, CAST(floor(c_acctbal) AS BIGINT) AS c_acctbal,
        |  c_name AS sel_c_name, c_nationkey AS sel_c_nationkey
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "b6_final" ->
      """WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
        |    o_orderstatus, 1 AS version FROM orders),
        |upd AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DECIMAL(12,2)) AS price,
        |    'U' AS o_orderstatus, 2 AS version FROM orders WHERE o_orderkey % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
        |f AS (SELECT o_orderkey,
        |    arg_max(price, version) AS price,
        |    arg_max(o_orderstatus, version) AS o_orderstatus
        |  FROM u GROUP BY 1)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" -> q1OracleSql,
    "a1_scan_prune" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_quantity < 3 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "a8_file_query" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a16_numbers" ->
      """SELECT CAST(range % 7 AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(sum(range * range) AS BIGINT) AS sum_sq
        |FROM range(1, 1001) GROUP BY 1 ORDER BY bucket""".stripMargin,
    "b1_project_alias" ->
      """SELECT p_partkey, upper(p_name) AS p_name_u,
        |  p_brand || '#' || p_type AS brand_type,
        |  p_retailprice * 0.9 AS discounted,
        |  p_size + 1 AS size1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "b2_filter_predicates" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000 AND 50000
        |       AND o_orderpriority LIKE '1%')
        |   OR (o_orderstatus NOT IN ('O','F','P') AND o_totalprice > 400000)
        |ORDER BY o_orderkey""".stripMargin,
    "b3_prewhere" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_quantity <= 2 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin,
    // b3b/b6b: the CH-dialect TEXT front door routes to the same
    // semantics, so the oracles are b3's/b6's verbatim.
    "b3b_prewhere_sql" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_quantity <= 2 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin,
    "b6b_final_sql" ->
      """WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
        |    o_orderstatus, 1 AS version FROM orders),
        |upd AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DECIMAL(12,2)) AS price,
        |    'U' AS o_orderstatus, 2 AS version FROM orders WHERE o_orderkey % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
        |f AS (SELECT o_orderkey,
        |    arg_max(price, version) AS price,
        |    arg_max(o_orderstatus, version) AS o_orderstatus
        |  FROM u GROUP BY 1)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "b4_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "b4b_global_in_sql" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "h5_conditionals" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 1000 THEN 'low'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bal_bucket,
        |  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg,
        |  least(c_nationkey, 10) AS nk_cap,
        |  count(*) AS n,
        |  CAST(CAST(sum(CAST(greatest(c_acctbal, 0.0) AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY bal_bucket, seg, nk_cap""".stripMargin,
    "h6_conversions" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od_str,
        |  CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS VARCHAR) AS od_roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
