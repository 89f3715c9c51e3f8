package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{CH, Engine}

/** Streaming / incremental surface (SURVEY §2.J). The reference's live
  * surface is insert-driven incremental materialized views (no Kafka
  * source configured, `Dockerfile:193-239`): each inserted block is
  * partially aggregated into a target table at insert time.
  *
  * Spark-native mapping: Structured Streaming file source →
  * - J1: `foreachBatch` appends per-batch *partial* aggregate states to
  *   a Parquet target; reads merge the partials — the
  *   AggregatingMergeTree pattern (partial-state parts, merge-on-read).
  * - J2: a streaming tumbling-window aggregation (complete mode).
  * Both run with Trigger.AvailableNow (process everything, terminate),
  * and both are oracle-checked against the batch recompute — the MV
  * equivalence property from SURVEY §5.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  /** The streaming file source wants a directory of arriving files:
    * stage events (ts already normalized) as 4 chunk files — each chunk
    * plays the role of one inserted block. */
  private def stageEvents(spark: SparkSession, dir: String): String = {
    val staged = Engine.scratch(spark, dir, "events_src")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(staged + "/_SUCCESS"))) {
      Engine.events(spark, dir).repartition(4)
        .write.mode("overwrite").parquet(staged)
    }
    staged
  }

  private def eventStream(spark: SparkSession, staged: String, oneFilePerBatch: Boolean): DataFrame = {
    val schema = spark.read.parquet(staged).schema
    val reader = spark.readStream.schema(schema)
    (if (oneFilePerBatch) reader.option("maxFilesPerTrigger", 1) else reader)
      .parquet(staged)
  }

  /** J1: incremental MV via foreachBatch. Each micro-batch writes its
    * partial (event_type → count, decimal sum) states; the final read
    * merges partials by summing — insert-time MV maintenance with
    * merge-on-read, no global state store needed. */
  private def j1IncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    val target = Engine.scratch(spark, dir, "j1_mv")
    // reset target for a deterministic run
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(target), true)
    fs.delete(new org.apache.hadoop.fs.Path(target + "_ckpt"), true)
    // one file per micro-batch → 4 genuine partial-state inserts
    val q = eventStream(spark, stageEvents(spark, dir), oneFilePerBatch = true)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", target + "_ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy("event_type")
          .agg(count(lit(1)).as("partial_n"),
            sum(CH.dec(col("value"))).as("partial_sum"))
          .write.mode("append").parquet(target)
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(target)
      .groupBy("event_type")
      .agg(sum(col("partial_n")).as("n"),
        sum(col("partial_sum")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** J2: time-bucketed rollup — streaming tumbling 6-hour windows
    * (aligned to the epoch, same as the oracle's floor arithmetic). */
  private def j2WindowRollup(spark: SparkSession, dir: String): DataFrame = {
    val sinkName = "j2_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = eventStream(spark, stageEvents(spark, dir), oneFilePerBatch = false)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("value"))).as("sv"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("bucket"),
        col("event_type"), col("n"), col("sv").cast("double").as("sum_value"))
      .orderBy("bucket", "event_type")
  }

  val queries: Map[String, Q] = Map(
    "j1_incremental_mv" -> (j1IncrementalMv _),
    "j2_window_rollup" -> (j2WindowRollup _))

  val oracles: Map[String, String] = Map(
    "j1_incremental_mv" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "j2_window_rollup" ->
      """SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)), '%Y-%m-%d %H:%M') AS bucket,
        |  event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)
}
