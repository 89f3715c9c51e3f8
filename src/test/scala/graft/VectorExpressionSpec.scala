package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen'd vector kernels must be bit-identical to the
  * interpreted higher-order fold they replaced (same sequential double
  * accumulation), and resolve through the SQL front door via
  * GraftExtensions. */
class VectorExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dot_f / l2sq_f match the interpreted zip_with fold bit-exactly") {
    val e = Engine.t(spark, TestSpark.sf, "embeddings").limit(100)
    val folded = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v).as("d"))
      .collect().map(_.getDouble(0))
    val kernel = e.select(call_function("dot_f", col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    assert(folded.toSeq == kernel.toSeq) // exact, not approximate
    val zero = e.select(call_function("l2sq_f", col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(zero.forall(_ == 0.0))
  }

  test("argmin_l2sq_f / min_l2sq_f equal the k-call array_min construction bit-exactly") {
    // the CentroidScan kernels replaced kmeansAssign's array of k
    // separate l2sq_f calls (plan-overhead fix); this pins the exact
    // equivalence — per-centroid fold order AND first-min tie-break —
    // that l40b's oracle certification rests on
    val e = Engine.t(spark, TestSpark.sf, "embeddings").limit(200)
    val cents: Seq[Array[Double]] = e.orderBy("vec_id").limit(7).collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toSeq
    val flat = typedLit(cents.flatten.toArray)
    val dArr = array(cents.map(c =>
      call_function("l2sq_f", col("embedding"), typedLit(c))): _*)
    val rows = e.select(
      call_function("argmin_l2sq_f", col("embedding"), flat).as("ac"),
      call_function("min_l2sq_f", col("embedding"), flat).as("ad"),
      dArr.as("d"))
      .withColumn("oc", (expr("array_position(d, array_min(d))") - 1).cast("int"))
      .withColumn("od", expr("array_min(d)"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("ac") == r.getAs[Int]("oc"), s"argmin diverged: $r")
      assert(r.getAs[Double]("ad") == r.getAs[Double]("od"), s"min dist diverged: $r")
    }
    // exact-tie path: duplicated centroid — argmin must keep the FIRST
    val dup = typedLit((cents(3) ++ cents(3)).toArray)
    val ties = e.select(call_function("argmin_l2sq_f", col("embedding"), dup).as("c"))
      .collect().map(_.getInt(0))
    assert(ties.forall(_ == 0), "exact tie must resolve to the first centroid")
  }

  test("centroid scan: malformed flattened matrix / empty vector -> NULL, not truncation") {
    // ADVICE r14: cents.length not a multiple of dim used to silently
    // drop the trailing values (integer division for k), and a
    // zero-length vector produced index 0 / +Infinity. Both are NULL
    // now, in BOTH the interpreted and codegen paths.
    val e = Engine.t(spark, TestSpark.sf, "embeddings").limit(5)
    val dim = e.select(expr("size(embedding)")).head().getInt(0)
    val ragged = typedLit(Array.fill(dim + 1)(0.5)) // k*dim+1: not a multiple
    val r1 = e.select(
      call_function("argmin_l2sq_f", col("embedding"), ragged).as("a"),
      call_function("min_l2sq_f", col("embedding"), ragged).as("m")).collect()
    assert(r1.forall(r => r.isNullAt(0) && r.isNullAt(1)), "ragged matrix must be NULL")
    val r2 = spark.sql(
      "SELECT argmin_l2sq_f(CAST(array() AS array<float>), array(CAST(1.0 AS DOUBLE))) AS a," +
        " min_l2sq_f(CAST(array() AS array<float>), array(CAST(1.0 AS DOUBLE))) AS m")
      .collect().head
    assert(r2.isNullAt(0) && r2.isNullAt(1), "empty vector must be NULL")
    // well-formed inputs stay non-null through the same path
    val ok = typedLit(Array.fill(2 * dim)(0.5))
    val r3 = e.select(call_function("argmin_l2sq_f", col("embedding"), ok)).collect()
    assert(r3.forall(!_.isNullAt(0)))
  }

  test("kernels resolve through SQL text (SparkSessionExtensions)") {
    val r = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d," +
        " l2sq_f(array(CAST(1.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS l")
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 9.0)
    // the hash parity expressions resolve through SQL text too
    val h = spark.sql(
      "SELECT farm_fingerprint64('abc') AS f, sip_hash64('abc') AS s").collect().head
    assert(h.getLong(0) == com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes("abc".getBytes("UTF-8")).asLong())
    assert(h.getLong(1) == com.google.common.hash.Hashing.sipHash24(0L, 0L)
      .hashBytes("abc".getBytes("UTF-8")).asLong())
  }

  test("minhash_bands == banded minhash_sigs, codegen and interpreted") {
    def run(): Seq[(Seq[Long], Seq[Long])] =
      spark.sql(
        """SELECT minhash_bands(s) AS bands,
          |  transform(sequence(0, 7),
          |    b -> xxhash64(sigs[2*b], sigs[2*b+1])) AS expected
          |FROM (SELECT minhash_sigs(s) AS sigs, s FROM (
          |  SELECT array('a b c', 'b c d', 'c d e') AS s
          |  UNION ALL SELECT array() AS s))""".stripMargin)
        .collect().toSeq.map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    val codegen = run()
    codegen.foreach { case (bands, expected) => assert(bands == expected) }
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == codegen)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("l27 int8 quantization: max reconstruction error ≤ scale/2, no code overflows") {
    val rows = graft.ops.LlmVector.queries("l27_embedding_quantize")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale_r")
      val maxErr = r.getAs[Double]("max_err")
      // round(x/s) is within 1/2 of x/s, so |x - q·s| ≤ s/2 (+ rounding
      // slack from the 6-dp scale_r column itself).
      assert(maxErr <= scale / 2 + 1e-5, s"vec ${r.get(0)}: err $maxErr > ${scale / 2}")
    }
  }

  test("jump_hash: balanced shards, minimal movement on grow, codegen == interpreted == reference") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 20000)
      .select(xxhash64(col("id")).as("k"))
      .select(col("k"),
        call_function("jump_hash", col("k"), lit(8)).as("s8"),
        call_function("jump_hash", col("k"), lit(9)).as("s9"))
    val rows = df.collect()
    // reference implementation parity (also pins interpreted == codegen,
    // since collect() ran through codegen and JumpHash.jump is the eval path)
    rows.take(500).foreach { r =>
      assert(r.getInt(1) == graft.expressions.JumpHash.jump(r.getLong(0), 8))
      assert(r.getInt(2) == graft.expressions.JumpHash.jump(r.getLong(0), 9))
    }
    val byShard = rows.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(byShard.size == 8, s"all 8 shards populated, got ${byShard.size}")
    assert(byShard.values.max.toDouble / byShard.values.min < 1.5, s"balance: $byShard")
    val moved = rows.count(r => r.getInt(1) != r.getInt(2)).toDouble / rows.length
    assert(moved > 0.05 && moved < 0.20, s"minimal movement on 8→9 grow: got $moved, expect ≈1/9")
  }

  test("farm_fingerprint64 is byte-parity with Guava's independent FarmHash Fingerprint64") {
    import spark.implicits._
    // deterministic inputs covering every length branch: 0 (empty), 1-3
    // (byte mix), 4-7 (f32), 8-16, 17-32, 33-64, then >64 including the
    // 64/65 and 128/129 block boundaries and a multi-block tail
    val strs = (0 to 300).map { n =>
      new String((0 until n).map(i => ('a' + (i * 7 + n * 13) % 26).toChar).toArray)
    }
    val got = strs.toDF("s")
      .select(col("s"), call_function("farm_fingerprint64", col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (s, h) =>
      val expect = com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashBytes(s.getBytes("UTF-8")).asLong()
      assert(h == expect, s"len=${s.length}: got $h expected $expect")
    }
    // binary input path + non-ASCII bytes (seeded PRNG → deterministic)
    val rnd = new scala.util.Random(42)
    val bins = Seq(5, 23, 47, 63, 64, 65, 200, 1024).map { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    val gotBin = bins.toDF("b")
      .select(col("b"), call_function("farm_fingerprint64", col("b")).as("h"))
      .collect().map(r => (r.getAs[Array[Byte]](0), r.getLong(1)))
    gotBin.foreach { case (b, h) =>
      val expect = com.google.common.hash.Hashing.farmHashFingerprint64().hashBytes(b).asLong()
      assert(h == expect, s"binary len=${b.length}: got $h expected $expect")
    }
    // interpreted eval path == codegen path (collect() above ran codegen)
    val ex = graft.expressions.FarmHash64.hash("hello world".getBytes("UTF-8"))
    assert(ex == com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes("hello world".getBytes("UTF-8")).asLong())
  }

  test("sip_hash64 is byte-parity with Guava's independent SipHash-2-4 (zero key)") {
    import spark.implicits._
    // every residual-tail length 0..7 across block counts 0..15
    val strs = (0 to 120).map { n =>
      new String((0 until n).map(i => ('A' + (i * 11 + n * 3) % 26).toChar).toArray)
    }
    val got = strs.toDF("s")
      .select(col("s"), call_function("sip_hash64", col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (s, h) =>
      val expect = com.google.common.hash.Hashing.sipHash24(0L, 0L)
        .hashBytes(s.getBytes("UTF-8")).asLong()
      assert(h == expect, s"len=${s.length}: got $h expected $expect")
    }
    // keyed variant against the SipHash paper's test key (via Guava)
    val paperK0 = 0x0706050403020100L
    val paperK1 = 0x0f0e0d0c0b0a0908L
    val msg = (0 until 64).map(_.toByte).toArray
    (0 to 64).foreach { n =>
      val m = msg.take(n)
      val expect = com.google.common.hash.Hashing.sipHash24(paperK0, paperK1)
        .hashBytes(m).asLong()
      assert(graft.expressions.SipHash64.hash(m, paperK0, paperK1) == expect,
        s"keyed parity failed at len=$n")
    }
  }

  test("mixed float/double arrays are accepted (IVF centroid case)") {
    val r = spark.sql(
      "SELECT dot_f(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS DOUBLE))) AS d")
      .collect().head
    assert(r.getDouble(0) == 6.0)
  }

  test("l11 rep-collapsed near-dup output equals rep-less self-join under replication") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // base vectors + 4 exact copies each with shifted ids (sf-replica shape)
    val rnd = new scala.util.Random(7)
    val baseVecs = (0 until 12).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1), i % 3)
    }
    val rows = for (r <- 0 until 4; (id, v, lb) <- baseVecs)
      yield (r.toLong * 100 + id, v, lb)
    val staged = "/tmp/graft_io/test_l11_weighted"
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$staged/embeddings.parquet")
    val fast = graft.ops.LlmVector.queries("l11_embedding_neardup")(spark, staged)
      .collect().map(_.toSeq).toSeq
    // rep-less reference: the per-label self-join over every row
    val e = spark.read.parquet(s"$staged/embeddings.parquet")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("dot_f", a, b)
    val a = e.select(col("label"), col("vec_id").as("a_id"),
      col("embedding").as("ea"), sqrt(dot(col("embedding"), col("embedding"))).as("na"))
    val b = e.select(col("label"), col("vec_id").as("b_id"),
      col("embedding").as("eb"), sqrt(dot(col("embedding"), col("embedding"))).as("nb"))
    val slow = a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cs", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cs") > 0.35)
      .select(col("label"), col("a_id"), col("b_id"), round(col("cs"), 4).as("cos_sim"))
      .orderBy("label", "a_id", "b_id")
      .collect().map(_.toSeq).toSeq
    assert(slow.nonEmpty, "replicated corpus must produce near-dup pairs (exact copies)")
    assert(fast == slow, s"rep-collapsed != rep-less: ${fast.take(3)} vs ${slow.take(3)}")
  }
}
