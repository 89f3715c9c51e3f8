package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Distributed exact global ranking (the i4b pattern —
  * `Aggregates.scala` i4bEquiheight — factored for reuse): a bare
  * global window (`Window.orderBy` with no partition) moves its WHOLE
  * input through one task, which is fine for a bounded rollup and a
  * 100 TB killer for anything that grows with the data. Equivalent
  * distributed form:
  *
  *   repartitionByRange(sortCols) → sortWithinPartitions → stage to
  *   scratch parquet (range-boundary sampling is not deterministic
  *   across jobs; staging pins ONE partition assignment for every
  *   downstream pass) → per-partition row counts (≤ one row per
  *   partition — KB driver state) → broadcast exclusive offsets →
  *   global rank = partition offset + per-partition row_number.
  *
  * With a unique tiebreak in `sortCols` the rank is a total order, so
  * every rank-derived quantity (ntile buckets here) is bit-identical
  * to the single-task builtin — DuckDB's flat window is the oracle
  * that pins the decomposition. */
object DistRank {

  /** Exact `ntile(k)` over the global `sortCols` order, appended as
    * integer column `out`. ntile's remainder rule (first n mod k
    * buckets get ⌈n/k⌉ rows) is applied in closed form from the
    * driver-side total count. */
  def ntile(spark: SparkSession, dir: String, name: String,
      df: DataFrame, sortCols: Seq[Column], k: Int, out: String): DataFrame = {
    val stagedPath = Engine.scratch(spark, dir, name)
    df.repartitionByRange(Engine.stagingWidth(spark), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(stagedPath)
    val staged = spark.read.parquet(stagedPath)
    val pidCounts = staged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = pidCounts.scanLeft(0L)(_ + _._2).zip(pidCounts)
      .map { case (off, (pid, _)) => (pid, off) }
    val n = pidCounts.map(_._2).sum
    val q = n / k
    val r = n % k
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
    val rank = col("__off") + row_number().over(wp)
    val bucket =
      if (q == 0) rank // fewer rows than buckets: bucket = rank
      else when(rank <= lit(r * (q + 1)), (rank - 1) / lit(q + 1) + 1)
        .otherwise(lit(r) + (rank - lit(r * (q + 1)) - 1) / lit(q) + 1)
    staged.join(broadcast(offDf), "__pid")
      .withColumn(out, floor(bucket).cast("int"))
      .drop("__pid", "__off")
  }

  /** Exact `ntile(k) OVER (PARTITION BY groupCols ORDER BY sortCols)`
    * without per-group window partitions. A builtin partitioned window
    * puts each GROUP on one task — fine for high-cardinality groups,
    * a skew cliff when one group dominates (one language owning 60%
    * of a 100 TB corpus is a single-task sort). Same machinery as
    * [[ntile]], with the range exchange spreading each group across
    * MANY partitions: range-partition by (groupCols, sortCols), stage,
    * collect per-(group, partition) counts — driver state is
    * n_groups × stagingWidth rows, bounded when the group domain is (languages
    * here; the caller's contract) — then per-group exclusive offsets
    * broadcast back and ntile's remainder rule applied in closed form
    * from the per-group total, all in exact `div`/`%` arithmetic.
    * Group keys must be non-null (they ride an equi-join). */
  def groupedNtile(spark: SparkSession, dir: String, name: String,
      df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column], k: Int,
      out: String): DataFrame = {
    val stagedPath = Engine.scratch(spark, dir, name)
    val partCols = groupCols.map(col) ++ sortCols
    df.repartitionByRange(Engine.stagingWidth(spark), partCols: _*)
      .sortWithinPartitions(partCols: _*)
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(stagedPath)
    val staged = spark.read.parquet(stagedPath)
    val cntRows = staged
      .groupBy(groupCols.head, (groupCols.tail :+ "__pid"): _*).count().collect()
    val offRows = cntRows
      .groupBy(r => groupCols.map(c => r.get(r.fieldIndex(c))))
      .toSeq.flatMap { case (gkey, rows) =>
        val sorted = rows.sortBy(r => r.getInt(r.fieldIndex("__pid")))
        val total = sorted.map(r => r.getLong(r.fieldIndex("count"))).sum
        sorted.scanLeft(0L)(_ + _.getLong(sorted.head.fieldIndex("count")))
          .zip(sorted).map { case (off, r) =>
            // Seq[Any] annotation: a bare Seq(Int, Long, Long) would
            // numeric-widen the pid to Long and break the INT field
            org.apache.spark.sql.Row.fromSeq(
              gkey ++ Seq[Any](r.getInt(r.fieldIndex("__pid")), off, total))
          }
      }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => staged.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__n",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), schema)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy((groupCols :+ "__pid").map(col): _*).orderBy(sortCols: _*)
    staged.join(broadcast(offDf), groupCols :+ "__pid")
      .withColumn("__rk", col("__off") + row_number().over(wp))
      .withColumn(out, expr(
        s"""CAST(CASE
           |  WHEN __n div $k = 0 THEN __rk
           |  WHEN __rk <= (__n % $k) * (__n div $k + 1)
           |    THEN (__rk - 1) div (__n div $k + 1) + 1
           |  ELSE (__n % $k) + (__rk - (__n % $k) * (__n div $k + 1) - 1) div (__n div $k) + 1
           |END AS INT)""".stripMargin))
      .drop("__pid", "__off", "__n", "__rk")
  }
}
