package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-rehearsal equivalence harness (ADVICE r9 #6): at a replica
  * scale factor (sf1/sf10 built by `scripts/make_sf_replica.py`),
  * prove the stateful-streaming sessionizer — with its size-scaled
  * state-partition count — still produces EXACTLY the batch answer:
  *
  *  1. j3 multi-batch (one staged chunk per micro-batch) ≡ j3
  *     single-batch: the `GroupState` open-session carry across
  *     batches survives the bigger state store.
  *  2. j3 ≡ batch `session_window` aggregation on
  *     (user_id, start_us, end_us, n_events): the custom incremental
  *     state machine agrees with Spark's declarative sessionization.
  *
  * Both comparisons are distributed (`exceptAll` both ways — no
  * driver collect of the session set, which is millions of rows at
  * sf10). Prints one JSON line; non-zero exit on any mismatch.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = Engine.session()

    def sessionCols(df: DataFrame): DataFrame =
      df.select("user_id", "start_us", "end_us", "n_events")

    def diffCount(a: DataFrame, b: DataFrame): (Long, Long) =
      (a.exceptAll(b).count(), b.exceptAll(a).count())

    val single = sessionCols(ops.Streaming.j3SessionizeWith(spark, sfDir, oneFilePerBatch = false))
    val multi = sessionCols(ops.Streaming.j3SessionizeWith(spark, sfDir, oneFilePerBatch = true))
    val nSessions = single.count()
    val (sm1, sm2) = diffCount(single, multi)

    val gapUs = 30L * 60 * 1000000
    val batch = Engine.events(spark, sfDir)
      .groupBy(col("user_id").cast("long").as("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), min(unix_micros(col("ts"))).as("start_us"))
      .select(col("user_id"), col("start_us"),
        (unix_micros(col("w.end")) - gapUs).as("end_us"), col("n_events"))
    val (bm1, bm2) = diffCount(single, batch)

    val ok = sm1 == 0 && sm2 == 0 && bm1 == 0 && bm2 == 0
    println(s"""{"check":"j3_scale_equivalence","sf":"$sfDir","sessions":$nSessions,""" +
      s""""multi_vs_single_diff":[$sm1,$sm2],"stream_vs_batch_diff":[$bm1,$bm2],"ok":$ok}""")

    // j12 stream-stream join: the in-horizon state join must emit the
    // exact batch interval-join pair set, however the input is
    // micro-batched. Batch leg = plain self-join on the same predicate.
    val streamPairs = ops.Streaming.streamStreamPairs(spark, sfDir, oneFilePerBatch = true)
    val ev = Engine.events(spark, sfDir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batchPairs = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select("c_id", "p_id")
    val nPairs = batchPairs.count()
    val (jm1, jm2) = diffCount(streamPairs, batchPairs)
    val jok = jm1 == 0 && jm2 == 0
    println(s"""{"check":"j12_scale_equivalence","sf":"$sfDir","pairs":$nPairs,""" +
      s""""stream_vs_batch_diff":[$jm1,$jm2],"ok":$jok}""")
    spark.stop()
    if (!(ok && jok)) sys.exit(1)
  }
}
