package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Storage

/** Quantifies k20's claim: a Morton-clustered layout keeps per-file
  * (min, max) ranges tight in BOTH dimensions, so a band predicate on
  * either one overlaps a bounded fraction of the sorted files, while a
  * single-dim sort answers bands on the non-leading dimension only by
  * touching every file. File-level min/max overlap is exactly the
  * statistic Parquet row-group pruning (and the reference's sparse
  * primary index) consults, so the counts here ARE the skipping. */
class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** (ulo, uhi, tlo, thi) per parquet file. */
  private def fileRanges(path: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min(col("ts").cast("long")).as("tlo"), max(col("ts").cast("long")).as("thi"))
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("z-order bounds band overlap in both dims; a ts sort does not") {
    val z = fileRanges(Storage.k20Layout(spark, TestSpark.sf))
    val n = z.length
    assert(n >= 12, s"expected ~16 z-files, got $n")

    // middle-20% band in each dimension, from the observed global range
    val (ulo, uhi) = (z.map(_._1).min, z.map(_._2).max)
    val (tlo, thi) = (z.map(_._3).min, z.map(_._4).max)
    def band(lo: Long, hi: Long): (Long, Long) = {
      val span = hi - lo
      (lo + (span * 0.4).toLong, lo + (span * 0.6).toLong)
    }
    val (ub0, ub1) = band(ulo, uhi)
    val (tb0, tb1) = band(tlo, thi)

    val zUser = z.count(f => f._1 <= ub1 && f._2 >= ub0)
    val zTs = z.count(f => f._3 <= tb1 && f._4 >= tb0)
    // 16 z-ranges fix the top 4 interleaved bits; a 20 %-wide band
    // pins 2 of the 4 quarter-combinations in its dimension → ≤ ~half
    // the files, plus range-partitioner boundary slack.
    assert(zUser <= (0.7 * n).ceil.toInt, s"z user-band overlap $zUser of $n")
    assert(zTs <= (0.7 * n).ceil.toInt, s"z ts-band overlap $zTs of $n")

    // comparison layout: same file count, sorted by ts alone — every
    // file spans (nearly) the whole user range, so the user band
    // overlaps (nearly) all of them.
    val linOut = Engine.scratch(spark, TestSpark.sf, "k20_linear")
    Engine.t(spark, TestSpark.sf, "events")
      .repartitionByRange(16, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(linOut)
    val lin = fileRanges(linOut)
    val linUser = lin.count(f => f._1 <= ub1 && f._2 >= ub0)
    assert(linUser >= (0.9 * lin.length).floor.toInt,
      s"ts-sorted layout should NOT skip user bands: $linUser of ${lin.length}")
    // and the z layout strictly beats it on the non-leading dimension
    assert(zUser < linUser, s"z ($zUser) should beat linear ($linUser)")
  }

  test("layout survives append churn via k12-style compaction") {
    val out = Storage.k20Layout(spark, TestSpark.sf)
    val n0 = spark.read.parquet(out).count()
    // update churn: a late-arriving 10% slice appended with NO
    // clustering — each appended file spans ~the full range in BOTH
    // dimensions, so band skipping degrades until compaction
    val churnRows = Engine.t(spark, TestSpark.sf, "events")
      .filter(pmod(col("event_id"), lit(10)) === 0)
    val nChurn = churnRows.count()
    churnRows.repartition(2).write.mode("append").parquet(out)

    def userOverlap(files: Seq[(Long, Long, Long, Long)]): Int = {
      val (ulo, uhi) = (files.map(_._1).min, files.map(_._2).max)
      val span = uhi - ulo
      val (b0, b1) = (ulo + (span * 0.4).toLong, ulo + (span * 0.6).toLong)
      files.count(f => f._1 <= b1 && f._2 >= b0)
    }
    val churned = fileRanges(out)

    // K12 compaction of the clustered table = re-run the z-order
    // rewrite over the merged (clustered + churn) file set
    val compactDir = Engine.scratch(spark, TestSpark.sf, "k20_compacted")
    Storage.zorderWrite(spark, spark.read.parquet(out), compactDir)
    val compacted = fileRanges(compactDir)

    // lossless: every row (original + churn) survives compaction
    assert(spark.read.parquet(compactDir).count() === n0 + nChurn)
    // the fresh-write overlap bound holds again post-compaction
    val n = compacted.length
    assert(n >= 12, s"expected ~16 z-files after compaction, got $n")
    assert(userOverlap(compacted) <= (0.7 * n).ceil.toInt,
      s"post-compaction user-band overlap ${userOverlap(compacted)} of $n")
    // and compaction strictly repaired what churn degraded
    assert(userOverlap(compacted) < userOverlap(churned),
      s"compacted ${userOverlap(compacted)} !< churned ${userOverlap(churned)}")
  }
}
