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
    df.repartitionByRange(32, sortCols: _*)
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
}
