package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Udafs.SumSqState

/** Partial/final aggregation equivalence (SURVEY §5.3): aggregating
  * parts then merging must equal aggregating the whole — the algebra
  * Spark's partial→final HashAggregate (and the reference's
  * AggregateFunction states) relies on. */
class PartialAggPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Aggregator state merge is associative and matches single-pass reduce") {
    val prop = Prop.forAll(Gen.listOf(Gen.choose(0, 50).map(_.toDouble)), Gen.choose(1, 5)) {
      (xs: List[Double], nParts: Int) =>
        val whole = xs.foldLeft(SumSqState.zero)(SumSqState.reduce)
        val parts = xs.grouped(math.max(1, xs.size / nParts + 1)).toList
          .map(p => p.foldLeft(SumSqState.zero)(SumSqState.reduce))
        val merged = parts.foldLeft(SumSqState.zero)(SumSqState.merge)
        SumSqState.finish(merged) == SumSqState.finish(whole)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("FarmHash64/SipHash64 parity with Guava holds on arbitrary byte arrays (property)") {
    // stronger than the fixed-length VectorExpressionSpec sweep: random
    // content AND random lengths, both algorithms, every run
    val genBytes = Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    val prop = Prop.forAll(genBytes) { (bs: List[Byte]) =>
      val b = bs.toArray
      graft.expressions.FarmHash64.hash(b) ==
        com.google.common.hash.Hashing.farmHashFingerprint64().hashBytes(b).asLong() &&
      graft.expressions.SipHash64.hash(b) ==
        com.google.common.hash.Hashing.sipHash24(0L, 0L).hashBytes(b).asLong()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("decimal sum over repartitioned data equals single-partition sum") {
    import spark.implicits._
    val xs = (1 to 500).map(i => (i % 7, i * 1.25))
    val df = xs.toDF("k", "v").withColumn("d", col("v").cast("decimal(12,2)"))
    val one = df.coalesce(1).groupBy("k").agg(sum("d").as("s"))
    val many = df.repartition(13).groupBy("k").agg(sum("d").as("s"))
    val a = one.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val b = many.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(a == b)
  }

  test("VecSumLong (d21 -ForEach) merge is associative, partition-invariant") {
    import spark.implicits._
    val agg = new ops.Aggregates.VecSumLong
    // direct algebra: fold in two different groupings == flat fold
    val vs = (1 to 40).map(i => Array(i.toLong, (i * 3).toLong, (100 - i).toLong))
    val flat = vs.foldLeft(agg.zero)((b, a) => agg.reduce(b, a.clone()))
    val (l, r) = vs.splitAt(17)
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, a) => agg.reduce(b, a.clone())),
      r.foldLeft(agg.zero)((b, a) => agg.reduce(b, a.clone())))
    assert(flat.toSeq == merged.toSeq)
    // through the engine: result invariant to physical partitioning
    spark.udf.register("vec_sum_long_t", udaf(agg))
    val df = vs.zipWithIndex.map { case (a, i) => (i % 3, a) }.toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(expr("vec_sum_long_t(v)").as("s"))
        .collect().map(row => row.getInt(0) -> row.getSeq[Long](1)).toMap
    assert(run(df.coalesce(1)) == run(df.repartition(11)))
  }

  test("sortable_double_bits is strictly monotone over arbitrary doubles (property)") {
    // the rank-select bucketing is correct iff this mapping is
    // order-preserving; probe random pairs plus the adversarial edge
    // set (±0.0, ±Inf, subnormals, extremes)
    def key(d: Double): Long = {
      val bits = java.lang.Double.doubleToLongBits(d)
      if (bits >= 0L) bits else -(bits & Long.MaxValue)
    }
    val edges = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity, Double.NegativeInfinity,
      1e-308, -1e-308)
    val genD = Gen.oneOf(Gen.chooseNum(Double.MinValue, Double.MaxValue), Gen.oneOf(edges))
    val prop = Prop.forAll(genD, genD) { (a: Double, b: Double) =>
      if (a < b) key(a) < key(b)
      else if (a > b) key(a) > key(b)
      else key(a) == key(b)   // covers -0.0 == 0.0 ties
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
    // the codegen'd expression computes the same key
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = edges.toDF("v")
      .select(call_function("sortable_double_bits", col("v"))).collect().map(_.getLong(0))
    assert(got.toSeq == edges.map(key))
  }

  test("rank-select percentile equals builtin on random data (groups, dups, negatives)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // mixed continuous + heavily-duplicated small-int values, negative
    // and positive, 1-3 groups, ps hitting exact and fractional ranks
    val genVals = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(-1000.0, 1000.0), Gen.choose(-5, 5).map(_.toDouble)))
    val prop = Prop.forAll(genVals, Gen.choose(1, 3)) { (xs: List[Double], ng: Int) =>
      val df = xs.zipWithIndex.map { case (v, i) => (s"g${i % ng}", v) }.toDF("g", "v")
      val specs = Seq(("v", 0.0, "p0"), ("v", 0.25, "p25"), ("v", 0.5, "p50"), ("v", 1.0, "p100"))
      val got = graft.ops.Aggregates.exactPercentileByRank(df, "g", specs)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val want = df.groupBy("g").agg(
          expr("percentile(v, 0.0)").as("p0"), expr("percentile(v, 0.25)").as("p25"),
          expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 1.0)").as("p100"))
        .collect().flatMap(r => Seq("p0", "p25", "p50", "p100").map(q =>
          (r.getString(0), q) -> r.getAs[Double](q))).toMap
      got == want
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("udaf through SQL matches manual computation") {
    import spark.implicits._
    spark.udf.register("sum_sq_t", udaf(SumSqState))
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    df.createOrReplaceTempView("t_sumsq")
    val got = spark.sql("SELECT sum_sq_t(v) FROM t_sumsq").collect().head.getLong(0)
    assert(got == 1 + 4 + 9)
  }
}
