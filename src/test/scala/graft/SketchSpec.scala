package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling.SpaceSaving

/** SpaceSaving sketch guarantees and SAMPLE rate bounds. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("theta intersection: error-bounded in the sampling regime, order- and run-deterministic") {
    import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
    import org.apache.datasketches.memory.Memory
    def sketchOf(ids: Iterable[Int]): Array[Byte] = {
      val s = UpdateSketch.builder().build()
      ids.foreach(i => s.update(i.toLong))
      s.compact().toByteArray
    }
    // |A| = |B| = 60k, true overlap 20k — far beyond k=4096, so both
    // sketches are genuinely sampling (the regime i8's 10% flag covers)
    val a = sketchOf(0 until 60000)
    val b = sketchOf(40000 until 100000)
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    ix.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    val est = ix.getResult.getEstimate
    assert(math.abs(est - 20000) <= 20000 * 0.10, s"intersection estimate $est vs true 20000")
    // sampling-regime sketches are NOT bit-stable under insertion order
    // (QuickSelect theta evolves with arrival order) — but the estimate
    // stays in band for any order:
    val aShuffled = sketchOf(new scala.util.Random(7).shuffle((0 until 60000).toVector))
    val ix2 = SetOperation.builder().buildIntersection()
    ix2.intersect(Sketches.wrapSketch(Memory.wrap(aShuffled)))
    ix2.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    val est2 = ix2.getResult.getEstimate
    assert(math.abs(est2 - 20000) <= 20000 * 0.10, s"shuffled estimate $est2 vs true 20000")
    // BELOW k the sketch is exact and therefore order-independent bit-for-bit
    val small = sketchOf(0 until 3000)
    val smallShuffled = sketchOf(new scala.util.Random(11).shuffle((0 until 3000).toVector))
    assert(java.util.Arrays.equals(small, smallShuffled),
      "exact-mode compact sketch must be order-independent")
    // and the engine's distributed per-type sketches reproduce across runs
    val m1 = ops.Aggregates.thetaSketchesByType(spark, TestSpark.sf)
    val m2 = ops.Aggregates.thetaSketchesByType(spark, TestSpark.sf)
    assert(m1.keySet == m2.keySet && m1.keySet.nonEmpty)
    m1.keys.foreach(k => assert(java.util.Arrays.equals(m1(k), m2(k)), s"sketch for $k not stable"))
  }

  test("SpaceSaving finds true heavy hitters on skewed data") {
    import spark.implicits._
    // zipf-ish: value i appears ~ 1000/i times
    val data = (1 to 20).flatMap(i => Seq.fill(1000 / i)(s"v$i"))
    val df = spark.createDataset(data).toDF("v").repartition(8)
    spark.udf.register("ss_test", udaf(new SpaceSaving(8)))
    val topk = df.agg(expr("ss_test(v)")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    // the top-3 true heavy hitters must survive an 8-counter sketch
    assert(Set("v1", "v2", "v3").subsetOf(topk.toSet), s"got $topk")
    assert(topk.length <= 8)
  }

  test("CountMin estimates are overestimates within eps*N of exact") {
    // i6's declared guarantee: exact <= est <= exact + eps*N (w.p. 1-δ;
    // with a fixed seed the run is deterministic, so this is a hard
    // assert here).
    val rows = graft.ops.Aggregates.queries("i6_countmin")(spark, TestSpark.sf).collect()
    assert(rows.length == 5, s"expected 5 event types, got ${rows.length}")
    val total = rows.map(_.getAs[Long]("exact_count")).sum
    val bound = math.ceil(0.001 * total).toLong
    rows.foreach { r =>
      val est = r.getAs[Long]("est_count"); val exact = r.getAs[Long]("exact_count")
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
      assert(est <= exact + bound, s"${r.getString(0)}: est $est > exact $exact + $bound")
    }
  }

  test("SpaceSaving counts are exact when distinct values fit in k") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("v").repartition(3)
    spark.udf.register("ss_small", udaf(new SpaceSaving(8)))
    val got = df.agg(expr("ss_small(v)")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("HLL++ approx distinct is within its declared rsd of the exact count") {
    // The error-bound check lives here, NOT in the declared i1 op:
    // computing exact count_distinct alongside the sketch would pay
    // the full distinct shuffle the sketch exists to avoid (VERDICT r4).
    val ev = Engine.t(spark, TestSpark.sf, "events").select("user_id")
    val row = ev.agg(
      approx_count_distinct(col("user_id"), 0.01).as("approx"),
      count_distinct(col("user_id")).as("exact")).collect().head
    val (approx, exact) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    // rsd=0.01 is a standard deviation; 5σ makes the test deterministic
    // in practice while still catching a broken sketch outright
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx is within the sketch's rank-error bound of exact") {
    // `percentile_approx(…, accuracy=a)` guarantees rank error ≤ 1/a:
    // the returned value's rank is within n/a of q·n. Assert by
    // bracketing — exact percentile at q−ε ≤ approx(q) ≤ exact at
    // q+ε, ε = 2/a headroom. Pins the i2_tdigest_quantiles inputs
    // (accuracy 2000, q ∈ {0.1, 0.5, 0.9, 0.99}) and the
    // d6_approx_quantiles input (accuracy 1000, q = 0.5), the two
    // no-oracle quantile-sketch ops (VERDICT r5 #3).
    val l = Engine.t(spark, TestSpark.sf, "lineitem").select("l_extendedprice")
    for ((q, acc) <- Seq((0.1, 2000), (0.5, 2000), (0.9, 2000), (0.99, 2000), (0.5, 1000))) {
      val eps = 2.0 / acc
      val (qlo, qhi) = (math.max(q - eps, 0.0), math.min(q + eps, 1.0))
      val row = l.agg(
        percentile_approx(col("l_extendedprice"), lit(q), lit(acc)).cast("double").as("a"),
        expr(s"percentile(l_extendedprice, $qlo)").as("lo"),
        expr(s"percentile(l_extendedprice, $qhi)").as("hi")).collect().head
      val (a, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(a >= lo && a <= hi, s"q=$q acc=$acc: approx=$a outside [$lo, $hi]")
    }
  }

  test("custom t-digest: p50/p90/p99 rank error ≤ 0.02 vs exact") {
    import org.apache.spark.sql.functions._
    val vals = Engine.t(spark, TestSpark.sf, "lineitem")
      .select(col("l_extendedprice").cast("double")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    spark.udf.register("tdigest_t",
      udaf(new graft.ops.TDigestAgg(100, Array(0.5, 0.9, 0.99))))
    val est = Engine.t(spark, TestSpark.sf, "lineitem")
      .agg(expr("tdigest_t(cast(l_extendedprice as double))")).collect().head.getSeq[Double](0)
    Seq(0.5, 0.9, 0.99).zip(est).foreach { case (q, e) =>
      // rank of the estimate in the exact sorted data
      val rank = vals.count(_ <= e).toDouble / n
      assert(math.abs(rank - q) <= 0.02, s"q=$q est=$e rank=$rank")
    }
    // mergeability: result invariant-ish under partitioning is implied by
    // the aggregator algebra; check the digest survives a repartition
    val est2 = Engine.t(spark, TestSpark.sf, "lineitem").repartition(7)
      .agg(expr("tdigest_t(cast(l_extendedprice as double))")).collect().head.getSeq[Double](0)
    Seq(0.5, 0.9, 0.99).zip(est2).foreach { case (q, e) =>
      val rank = vals.count(_ <= e).toDouble / n
      assert(math.abs(rank - q) <= 0.02, s"repartitioned: q=$q est=$e rank=$rank")
    }
  }

  test("i2c t-digest verdict twin: digest invariants + quantile reads (r17)") {
    // The cross-engine certification is the DuckDB recursive-CTE
    // hash-match (CORRECTNESS i2c row); this spec pins the ENGINE-side
    // mechanism invariants so a broken compress can't pass by both
    // engines agreeing on garbage: exact mass conservation, mean-sorted
    // centroids, every cluster within the greedy size bound at its own
    // midpoint quantile, and quantile reads that are rank-accurate
    // against the exact 400-value set.
    val row = graft.ops.Aggregates.queries("i2c_tdigest_verdict")(spark, TestSpark.sf)
      .collect().head
    val n = row.getAs[Long]("n")
    assert(n == 400, s"absolute event_id bound should give 400 rows, got $n")
    val cents = row.getAs[String]("centroids").split(",").map { s =>
      val Array(m, w) = s.split(":"); (m.toLong / 10000.0, w.toLong)
    }
    assert(cents.length == row.getAs[Long]("n_centroids"))
    assert(cents.map(_._2).sum == n, "digest lost or duplicated mass")
    assert(cents.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "centroid means not sorted")
    // greedy bound: each cluster's weight ≤ max(1, 4·n·q(1−q)/δ) at its
    // midpoint (+1 slack: the bound is checked BEFORE absorbing a point)
    var cum = 0.0
    cents.foreach { case (_, w) =>
      val qMid = (cum + w / 2.0) / n
      val bound = math.max(1.0, 4.0 * n * qMid * (1 - qMid) / 100)
      assert(w <= bound + 1.0, s"cluster weight $w exceeds t-digest bound $bound at q=$qMid")
      cum += w
    }
    // quantile reads: rank error vs the exact value set ≤ 0.03
    val exact = Engine.t(spark, TestSpark.sf, "events")
      .filter(col("event_id") < 400)
      .select((col("value").cast("decimal(12,2)") * 100).cast("double"))
      .collect().map(_.getDouble(0)).sorted
    for ((q, c) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")) {
      val est = row.getAs[Double](c)
      val rank = exact.count(_ <= est).toDouble / exact.length
      assert(math.abs(rank - q) <= 0.03, s"$c est=$est rank=$rank")
    }
  }

  test("l31 bloom dedup: zero false negatives, FP rate within budget") {
    val rows = graft.ops.LlmText.queries("l31_bloom_dedup")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    var flagged = 0L; var trueDup = 0L; var incoming = 0L
    rows.foreach { r =>
      val (n, f, t) = (r.getAs[Long]("n_incoming"), r.getAs[Long]("n_flagged"), r.getAs[Long]("n_true_dup"))
      assert(f >= t, s"${r.get(0)}: bloom missed a true duplicate ($f < $t)")
      incoming += n; flagged += f; trueDup += t
    }
    // 100k capacity vs a few hundred inserts → FP rate far under 5%
    val cleanDocs = incoming - trueDup
    assert(cleanDocs == 0 || (flagged - trueDup).toDouble / cleanDocs <= 0.05,
      s"false-positive rate too high: flagged=$flagged true=$trueDup incoming=$incoming")
  }

  test("deterministic hash sample: rate near 26/256 and stable across runs") {
    val l = Engine.t(spark, TestSpark.sf, "lineitem")
    val total = l.count().toDouble
    def sampled(): Long = l.filter(substring(md5(concat_ws("-",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))), 1, 2) < "1a").count()
    val n = sampled()
    assert(math.abs(n / total - 26.0 / 256) < 0.03, s"rate ${n / total}")
    assert(sampled() == n) // same rows every evaluation — no RNG
  }

  test("simhash64_md5 per-token hash is bit-identical to DuckDB's md5_number_upper") {
    import org.apache.spark.unsafe.types.UTF8String
    // md5_number_upper = first 8 MD5 digest bytes read little-endian;
    // pinned value cross-checked against DuckDB 1.0:
    //   SELECT md5_number_upper('hello') → 8514701317032132957
    assert(graft.expressions.SimHash64Md5.hashToken(UTF8String.fromString("hello")) ==
      8514701317032132957L)
    // independent reference: java MessageDigest + explicit LE assembly
    val d = java.security.MessageDigest.getInstance("MD5").digest("graft".getBytes("UTF-8"))
    val expected = (0 to 7).map(i => (d(i) & 0xffL) << (8 * i)).reduce(_ | _)
    assert(graft.expressions.SimHash64Md5.hashToken(UTF8String.fromString("graft")) == expected)
    // empty token array → zero votes → signature 0 (the coalesce(sh, 0)
    // convention the l13b oracle relies on for token-less docs)
    val sig = spark.sql("SELECT simhash64_md5(CAST(array() AS ARRAY<STRING>)) AS s").head().getLong(0)
    assert(sig == 0L)
  }

  test("md5_u64 scalar matches the kernel and renders DuckDB's unsigned decimal via conv(hex)") {
    // the l4b verdict's band keys are conv(hex(md5_u64(x)),16,10) on
    // the Spark side vs CAST(md5_number_upper(x) AS VARCHAR) in DuckDB
    // — pin both the scalar and the unsigned rendering. 'abc' →
    // md5_number_upper = 12704604231530709392 (> 2^63, so the Long
    // carries a negative bit pattern and the rendering must not).
    val row = spark.sql(
      "SELECT md5_u64('abc') AS h, conv(hex(md5_u64('abc')), 16, 10) AS u").head()
    assert(row.getLong(0) == java.lang.Long.parseUnsignedLong("12704604231530709392"))
    assert(row.getString(1) == "12704604231530709392")
  }
}
