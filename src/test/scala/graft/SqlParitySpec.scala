package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The reference's primary surface is SQL text (clickhouse-local /
  * client); the engine's catalog must make the same queries runnable
  * through `spark.sql` with results identical to the declared
  * DataFrame plans. Parity here means byte-equal collected rows. */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q1 flagship through the SQL front door equals the DataFrame plan") {
    Engine.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE'1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = ops.Basics.q1PricingSummary(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(rows(sql) == rows(df))
  }

  test("engine-injected kernels and CH combinators resolve in SQL text") {
    Engine.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT count(*) AS n FROM documents
        |WHERE dot_f(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) = 1.0""".stripMargin)
      .collect().head.getLong(0)
    val direct = Engine.t(spark, sf, "documents").count()
    assert(r == direct)
  }

  test("window + LIMIT BY shape through SQL equals the declared f4 result") {
    Engine.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 2
        |ORDER BY p_brand, rn""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    val df = Engine.t(spark, sf, "part")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("p_brand", "p_partkey", "rn")
      .orderBy("p_brand", "rn")
    assert(rows(sql) == rows(df))
  }
}
