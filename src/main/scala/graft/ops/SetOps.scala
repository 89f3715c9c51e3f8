package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Set-operation surface (SURVEY §2.G): UNION [ALL|DISTINCT],
  * INTERSECT [ALL], EXCEPT [ALL]. Spark plans the ALL variants as
  * aggregations over tagged counts and the DISTINCT variants as
  * hash-distinct — one shuffle each, scale-safe. Result sets are
  * compacted by a groupBy count so the declared outputs stay small.
  */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  private def custNk(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer").select(col("c_nationkey").as("nk"))
  private def suppNk(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "supplier").select(col("s_nationkey").as("nk"))

  /** G1: UNION ALL (bag semantics — counts add). */
  private def g1UnionAll(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).union(suppNk(spark, dir))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk")

  /** G1: UNION DISTINCT. */
  private def g1UnionDistinct(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).union(suppNk(spark, dir)).distinct()
      .orderBy("nk")

  /** G2: INTERSECT (distinct). */
  private def g2Intersect(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).intersect(suppNk(spark, dir)).orderBy("nk")

  /** G2: INTERSECT ALL (multiset min-counts), compacted. */
  private def g2IntersectAll(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).intersectAll(suppNk(spark, dir))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk")

  /** G3: EXCEPT (distinct) — customers keys minus order keys. */
  private def g3Except(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer").select(col("c_custkey").as("k"))
    val o = Engine.t(spark, dir, "orders").select(col("o_custkey").as("k"))
    c.except(o).orderBy("k")
  }

  /** G3: EXCEPT ALL (multiset difference), compacted. */
  private def g3ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Engine.t(spark, dir, "lineitem").select(col("l_suppkey").as("k"))
    val s = Engine.t(spark, dir, "supplier").select(col("s_suppkey").as("k"))
    l.exceptAll(s)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  /** G4: UNION by NAME — position-independent union with missing
    * columns null-filled (the schema-evolution union: two table
    * versions with different projections combine without a rewrite).
    * Spark `unionByName(allowMissingColumns = true)` ≡ DuckDB
    * `UNION ALL BY NAME`. */
  private def g4UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val o = Engine.t(spark, dir, "orders")
    val v1 = o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(graft.CH.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(asc_nulls_first("o_orderpriority"))
  }

  val queries: Map[String, Q] = Map(
    "g4_union_by_name" -> (g4UnionByName _),
    "g1_union_all" -> (g1UnionAll _),
    "g1_union_distinct" -> (g1UnionDistinct _),
    "g2_intersect" -> (g2Intersect _),
    "g2_intersect_all" -> (g2IntersectAll _),
    "g3_except" -> (g3Except _),
    "g3_except_all" -> (g3ExceptAll _))

  val oracles: Map[String, String] = Map(
    "g4_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL BY NAME
        |  SELECT o_orderpriority, o_orderkey, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM u GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "g1_union_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |) GROUP BY nk ORDER BY nk""".stripMargin,
    "g1_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "g2_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "g2_intersect_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |) GROUP BY nk ORDER BY nk""".stripMargin,
    "g3_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,
    "g3_except_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT l_suppkey AS k FROM lineitem
        |  EXCEPT ALL
        |  SELECT s_suppkey AS k FROM supplier
        |) GROUP BY k ORDER BY k""".stripMargin)
}
