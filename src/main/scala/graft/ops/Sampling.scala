package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** B5 SAMPLE, J4 refreshable MV, and I3 SpaceSaving approximate topK.
  *
  * I3 is the one genuinely custom aggregate the built-in surface lacks
  * (SURVEY §7.6 stretch): a bounded-memory heavy-hitters sketch. The
  * typed `Aggregator` state is a capped counter map with SpaceSaving's
  * replace-minimum rule; merge sums counters then re-caps, so partial
  * states stay ≤ k entries per task — constant memory per executor at
  * any scale, unlike exact topK's full groupBy.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** B5: SAMPLE — deterministic sampling-key form, the ClickHouse
    * semantics (`SAMPLE 0.1` hashes the declared sampling key and keeps
    * the low fraction of hash space, so the same rows are sampled on
    * every run and every replica). Here the key is
    * (l_orderkey, l_linenumber) hashed with md5 — portable, so DuckDB
    * computes the identical sample and the query is oracle-checked
    * (was no_oracle as a seeded-RNG Bernoulli sample). Keeping the
    * first 2 hex chars < '1a' retains 26/256 ≈ 10.2 % of rows. */
  private def b5Sample(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .filter(substring(md5(
        concat_ws("-", col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))), 1, 2) < "1a")
      .agg(count(lit(1)).as("n_sampled"),
        sum(CH.dec(col("l_extendedprice"))).cast("double").as("sum_sampled_price"))

  /** J4: refreshable MV — periodic full recompute + atomic overwrite
    * (the reference's REFRESH EVERY semantics as a batch job). Runs two
    * refresh cycles; the second overwrites the first, read-back equals
    * the current batch answer. */
  private def j4RefreshableMv(spark: SparkSession, dir: String): DataFrame = {
    val target = Engine.scratch(spark, dir, "j4_mv")
    def refresh(): Unit =
      Engine.t(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(CH.dec(col("o_totalprice"))).as("sp"))
        .write.mode("overwrite").parquet(target)
    refresh(); refresh() // two cycles: overwrite must be atomic+idempotent
    spark.read.parquet(target)
      .select(col("o_orderpriority"), col("n"), col("sp").cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** SpaceSaving state: value → (count, overestimate). */
  case class SSState(counters: Map[String, (Long, Long)], k: Int)

  /** I3: SpaceSaving heavy hitters (Metwally et al. 2005, public
    * algorithm): at most k counters; an unseen value replaces the
    * minimum counter, inheriting its count as the overestimate bound. */
  class SpaceSaving(k: Int) extends Aggregator[String, SSState, Seq[(String, Long)]] {
    def zero: SSState = SSState(Map.empty, k)

    def reduce(s: SSState, v: String): SSState = {
      val c = s.counters
      c.get(v) match {
        case Some((n, e)) => s.copy(counters = c.updated(v, (n + 1, e)))
        case None if c.size < k => s.copy(counters = c.updated(v, (1L, 0L)))
        case None =>
          val (minV, (minN, _)) = c.minBy { case (key, (n, _)) => (n, key) }
          s.copy(counters = (c - minV).updated(v, (minN + 1, minN)))
      }
    }

    def merge(a: SSState, b: SSState): SSState = {
      val summed = (a.counters.keySet ++ b.counters.keySet).map { key =>
        val (n1, e1) = a.counters.getOrElse(key, (0L, 0L))
        val (n2, e2) = b.counters.getOrElse(key, (0L, 0L))
        key -> (n1 + n2, e1 + e2)
      }.toMap
      // re-cap to k: keep the largest counters (deterministic tiebreak)
      val kept = summed.toSeq
        .sortBy { case (key, (n, _)) => (-n, key) }
        .take(k).toMap
      SSState(kept, k)
    }

    def finish(s: SSState): Seq[(String, Long)] =
      s.counters.toSeq.sortBy { case (key, (n, _)) => (-n, key) }
        .map { case (key, (n, _)) => (key, n) }

    def bufferEncoder: Encoder[SSState] = Encoders.product[SSState]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** I3 query: approximate top brands vs exact counts — emitted as a
    * joined comparison, declared without oracle (sketch). */
  private def i3SpaceSaving(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("ss_topk", udaf(new SpaceSaving(8)))
    Engine.t(spark, dir, "part")
      .agg(expr("ss_topk(p_brand)").as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e._1").as("brand"), col("e._2").as("approx_count"))
      .orderBy(desc("approx_count"), col("brand"))
  }

  /** I3b: SpaceSaving in its EXACT regime (i8b precedent — declare the
    * deterministic sub-form of a sketch as an oracle row): with
    * capacity k ≥ the column's distinct count the min-counter eviction
    * never fires, so every counter is an exact count and the output
    * equals a plain GROUP BY — which DuckDB replays. p_brand has 25
    * distinct values; k=32. The approximate regime stays spec-bound
    * via i3. */
  private def i3bSpaceSavingExact(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("ss_topk32", udaf(new SpaceSaving(32)))
    Engine.t(spark, dir, "part")
      .agg(expr("ss_topk32(p_brand)").as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e._1").as("brand"), col("e._2").as("exact_count"))
      .orderBy(desc("exact_count"), col("brand"))
  }

  /** I7: KMV bottom-k sample (CH `groupArraySample`'s deterministic,
    * distributed twin): per group, the k distinct values with the
    * SMALLEST md5 — a uniform sample that is mergeable (min of mins),
    * replica-stable, and doubles as a distinct-count sketch: the kth
    * smallest hash fraction estimates n ≈ (k−1)/frac (Bar-Yossef et
    * al. 2002, public). Exact oracle: rank-by-hash is deterministic,
    * so both the sample AND the estimate hash-match. */
  private def i7KmvSample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy("h")
    Engine.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_custkey")).distinct()
      .withColumn("h", md5(col("o_custkey").cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy("o_orderpriority")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(rk, o_custkey))), " +
          "x -> cast(x.o_custkey as string)), ',')").as("sample_csv"),
        round(lit(4.0) /
          (conv(substring(max(col("h")), 1, 8), 16, 10).cast("double") / 4294967296.0), 2)
          .as("kmv_est"))
      .orderBy("o_orderpriority")
  }

  /** B5b: CH `SAMPLE k` as SQL *text* — `FROM lineitem SAMPLE 13/128`
    * routes through [[graft.ChSql]]'s registered sampling key to the
    * same md5-prefix deterministic predicate as the b5 builder:
    * 13/128 = 0x1a0000/16^6, so the 6-hex cut `< '1a0000'` keeps
    * exactly b5's 2-hex `< '1a'` row set, and the DuckDB oracle
    * replays the predicate bit-for-bit. */
  private def b5bSampleSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.registerSample("lineitem",
      "concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))")
    graft.ChSql.sql(spark,
      """SELECT count(*) AS n_sampled,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_sampled_price
        |FROM lineitem SAMPLE 13/128""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "i7_kmv_sample" -> (i7KmvSample _),
    "b5_sample" -> (b5Sample _),
    "b5b_sample_sql" -> (b5bSampleSql _),
    "j4_refreshable_mv" -> (j4RefreshableMv _),
    "i3_spacesaving_topk" -> (i3SpaceSaving _),
    "i3b_spacesaving_exact" -> (i3bSpaceSavingExact _))

  val oracles: Map[String, String] = Map(
    "i7_kmv_sample" ->
      """WITH d AS (SELECT DISTINCT o_orderpriority, o_custkey FROM orders),
        |h AS (SELECT o_orderpriority, o_custkey,
        |    md5(CAST(o_custkey AS VARCHAR)) AS h FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rk
        |  FROM h)
        |SELECT o_orderpriority,
        |  array_to_string(list(CAST(o_custkey AS VARCHAR) ORDER BY rk), ',') AS sample_csv,
        |  round(4.0 / (CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substring(max(h), i, 1)) - 1)
        |      * CAST(power(16, 8 - i) AS BIGINT))) AS DOUBLE) / 4294967296.0), 2) AS kmv_est
        |FROM r WHERE rk <= 5
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b5_sample" ->
      """SELECT count(*) AS n_sampled,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_sampled_price
        |FROM lineitem
        |WHERE substring(md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'""".stripMargin,
    "b5b_sample_sql" ->
      """SELECT count(*) AS n_sampled,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_sampled_price
        |FROM lineitem
        |WHERE substring(md5(concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))), 1, 6) < '1a0000'""".stripMargin,
    "j4_refreshable_mv" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "i3b_spacesaving_exact" ->
      """SELECT p_brand AS brand, count(*) AS exact_count
        |FROM part GROUP BY p_brand ORDER BY exact_count DESC, brand""".stripMargin)
}
