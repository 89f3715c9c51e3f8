package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Aggregation surface (SURVEY §2.D + §2.I4). Spark's
  * HashAggregateExec partial→final is the same partial-state algebra as
  * the reference engine's two-level agg (memory cap analog: reference
  * `Dockerfile:246`); map-side partial aggregation means the shuffle
  * carries one row per (partition × group), which is what keeps these
  * shapes viable at 100 TB — every query here groups on low-cardinality
  * keys, so the exchange is tiny regardless of input size.
  *
  * Determinism: money sums in DecimalType (exact, associative);
  * float-native statistics rounded to 4-6 dp on both engines
  * (SURVEY §7.1); collected lists always sorted.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** D1: plain hash aggregation, partial+final (the spine shape; also
    * exercised with measures by the flagship). */
  private def d1GroupBy(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** D2: min/max/avg per group. */
  private def d2MinMax(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .groupBy("p_brand")
      .agg(
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        (sum(CH.dec(col("p_retailprice"))).cast("double") / count(lit(1)).cast("double")).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** D3: -If combinators — countIf/sumIf as FILTERed aggregates. */
  private def d3AggIf(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        CH.countIf(col("o_totalprice") > 200000).as("n_big"),
        coalesce(CH.sumIf(CH.dec(col("o_totalprice")), col("o_orderpriority") === "1-URGENT"), lit(0))
          .cast("double").as("sum_urgent"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** D4: uniqExact → count_distinct. */
  private def d4UniqExact(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count_distinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** D5/I1: approx distinct (HLL++). Declared without oracle — sketch
    * families differ across engines; spec tests bound the error. */
  private def d5ApproxUniq(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey")).as("approx_cust"),
        count_distinct(col("o_custkey")).as("exact_cust"))
      .orderBy("o_orderstatus")

  /** Exact interpolated percentiles by distributed rank-select —
    * semantically identical to Spark's `percentile` / DuckDB's
    * `quantile_cont` (0-based pos = p·(n−1); linear interpolation
    * between the values at ranks ⌊pos⌋ and ⌈pos⌉), but scale-shaped:
    * the builtin `percentile` collects EVERY value of a group into one
    * aggregation buffer, so a 3-group 100 TB input sorts ~33 TB per
    * buffer on 3 tasks (the sf1 rehearsal measured this as a 26×
    * sf1/sf0.1 cliff). Here instead rows shuffle into VALUE-ORDERED
    * BUCKETS and rank locally:
    *
    *  1. bucket ids are DATA-INDEPENDENT and monotone in the value:
    *     the top 20 bits of the `sortable_double_bits` kernel (sign +
    *     exponent + 8 mantissa bits ≈ 256 ordered slices per binade).
    *     No `repartitionByRange` (its sampling job re-executes the
    *     upstream) and no min/max statistics pass — monotonicity is
    *     all the prefix sum needs; skewed bucket sizes cost task
    *     balance only, never correctness;
    *  2. one cheap low-cardinality aggregate counts rows per bucket;
    *     that TINY histogram (≤ groups×cols×non-empty-buckets rows,
    *     KB-sized bounded driver state like the k-means centroid
    *     probe) yields each bucket's exclusive rank offset and the
    *     group sizes — so the bucket holding each target rank
    *     ⌊pos⌋/⌈pos⌉ is known WITHOUT touching the rows again (the
    *     classic histogram pre-pass of two-phase exact selection);
    *  3. the second pass broadcast-semi-joins rows to the ≤2 candidate
    *     buckets per requested percentile — a narrow codegen'd filter
    *     that drops ~all rows — then sorts just those buckets
    *     (`row_number`, fully parallel; equal values always share a
    *     bucket so tie order can't change which VALUE sits at a rank),
    *     adds the bucket offset for the global 0-based rank, and keeps
    *     exactly the target ranks to interpolate.
    *
    * Two O(n) scans, a shuffle of only candidate-bucket rows (≈ n /
    * buckets), and no all-values agg buffer anywhere.
    *
    * `specs` is (valueCol, p, outName); all columns melt into one scan.
    * Returns long-format (g, __q, __res) — one row per spec × group.
    * Caveat vs the builtin: a group whose values are ALL null is
    * omitted entirely (the builtin keeps the group with a null
    * percentile); callers here never feed null-only groups. */
  private[graft] def exactPercentileByRank(
      df: DataFrame, g: String, specs: Seq[(String, Double, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vcols = specs.map(_._1).distinct
    // melt the value columns to (g, __col, __v) rows, bucket monotonically
    val melted = df.select(col(g), explode(array(vcols.map(c =>
        struct(lit(c).as("__col"), col(c).cast("double").as("__v"))): _*)).as("__m"))
      .select(col(g), col("__m.__col").as("__col"), col("__m.__v").as("__v"))
      .filter(col("__v").isNotNull)   // percentile ignores nulls
      .withColumn("__b",
        shiftright(call_function("sortable_double_bits", col("__v")), 44).cast("int"))
    // pass 1: rows per bucket (low-cardinality agg → tiny table). The
    // histogram is BOUNDED driver state — O(groups × cols × non-empty
    // buckets), KB-sized like the k-means centroid probe — and
    // collecting it once lets every derived table (offsets, target
    // ranks, candidate buckets) come from driver math instead of 3-4
    // re-executions of the same aggregate under separate broadcasts.
    val bcounts = melted.groupBy(col(g), col("__col"), col("__b"))
      .agg(count(lit(1)).as("__bt")).collect()
    require(bcounts.length < (1 << 22),
      s"percentile bucket histogram unexpectedly large (${bcounts.length} rows)")
    // per (g, col): bucket → exclusive offset, and the group size n
    val byGroup = bcounts.groupBy(r => (r.get(0), r.getString(1)))
    val offsets = byGroup.view.mapValues { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      val offs = sorted.scanLeft(0L)(_ + _.getLong(3))
      (sorted.map(_.getInt(2)).zip(offs).toMap, offs.last) // bucket→off, n
    }.toMap
    // target ranks per (group, col, p): pos = p*(n-1); need ⌊pos⌋/⌈pos⌉
    val targetRows = for {
      ((gv, c), (_, n)) <- offsets.toSeq; (vc, p, q) <- specs if vc == c
    } yield {
      val pos = p * (n - 1).toDouble
      Row(gv, c, q, pos, math.floor(pos).toLong, math.ceil(pos).toLong)
    }
    // candidate buckets: the ≤2 buckets whose rank range covers a target
    val btByGroup = byGroup.view.mapValues(
      _.map(r => r.getInt(2) -> r.getLong(3)).toMap).toMap
    val targetsByGroup = targetRows.groupBy(t => (t.get(0), t.getString(1)))
    val neededRows = for {
      ((gv, c), (bOffs, _)) <- offsets.toSeq
      (b, off) <- bOffs.toSeq
      bt = btByGroup((gv, c))(b)
      if targetsByGroup.getOrElse((gv, c), Nil).exists(t =>
        (t.getLong(4) >= off && t.getLong(4) < off + bt) ||
          (t.getLong(5) >= off && t.getLong(5) < off + bt))
    } yield Row(gv, c, b, off)
    val gType = df.schema(g).dataType
    import org.apache.spark.sql.types._
    val needed = spark.createDataFrame(
      spark.sparkContext.parallelize(neededRows, 1),
      StructType(Seq(StructField(g, gType), StructField("__col", StringType),
        StructField("__b", IntegerType), StructField("__off", LongType))))
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1),
      StructType(Seq(StructField(g, gType), StructField("__col", StringType),
        StructField("__q", StringType), StructField("__pos", DoubleType),
        StructField("__rf", LongType), StructField("__rc", LongType))))
    // pass 2: rank ONLY candidate-bucket rows; global rank = local + offset
    val wLocal = Window.partitionBy(col(g), col("__col"), col("__b")).orderBy(col("__v"))
    melted.join(broadcast(needed), Seq(g, "__col", "__b"))
      .withColumn("__rn", row_number().over(wLocal))
      .withColumn("__r", col("__rn") - 1 + col("__off"))
      .join(broadcast(targets), Seq(g, "__col"))
      .filter(col("__r") === col("__rf") || col("__r") === col("__rc"))
      .groupBy(col(g), col("__q"), col("__pos"), col("__rf"), col("__rc"))
      .agg(
        max(when(col("__r") === col("__rf"), col("__v"))).as("__vf"),
        max(when(col("__r") === col("__rc"), col("__v"))).as("__vc"))
      // bit-exact Percentile.getPercentile form: sorted(lower) when the
      // position is integral, else (higher−pos)·lower + (pos−lower)·higher
      // — the algebraically-equal lower+(pos−⌊pos⌋)·(higher−lower) differs
      // in the last ulp (caught by the random-data property test)
      .select(col(g), col("__q"),
        when(col("__rf") === col("__rc"), col("__vf"))
          .otherwise(
            (col("__rc").cast("double") - col("__pos")) * col("__vf") +
              (col("__pos") - col("__rf").cast("double")) * col("__vc")).as("__res"))
  }

  /** D6: exact quantiles with linear interpolation (= DuckDB
    * quantile_cont), rounded to 6 dp on both sides. Computed via
    * [[exactPercentileByRank]] (distributed rank-select) rather than
    * the builtin `percentile`, whose collect-all-per-group buffer is
    * the one shape that cannot survive 3 groups × 100 TB; equality
    * with the builtin is pinned by `EdgeSemanticsSpec`. */
  private def d6Quantiles(spark: SparkSession, dir: String): DataFrame =
    exactPercentileByRank(Engine.t(spark, dir, "lineitem"), "l_returnflag",
      Seq(("l_quantity", 0.5, "p50_qty"),
        ("l_extendedprice", 0.25, "p25_price"),
        ("l_extendedprice", 0.9, "p90_price")))
      .groupBy("l_returnflag")
      .agg(
        round(max(when(col("__q") === "p50_qty", col("__res"))), 6).as("p50_qty"),
        round(max(when(col("__q") === "p25_price", col("__res"))), 6).as("p25_price"),
        round(max(when(col("__q") === "p90_price", col("__res"))), 6).as("p90_price"))
      .orderBy("l_returnflag")

  /** D6/I2: t-digest-style approximate quantiles — no oracle. The
    * exact companion column uses the rank-select path (see d6). */
  private def d6ApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Engine.t(spark, dir, "lineitem")
    val exact = exactPercentileByRank(li, "l_returnflag",
      Seq(("l_extendedprice", 0.5, "p50_exact")))
      .groupBy("l_returnflag")
      .agg(round(max(col("__res")), 6).as("p50_exact"))
    li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"))
      .join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("p50_approx"), col("p50_exact"))
      .orderBy("l_returnflag")
  }

  /** I1: HLL++ approx-distinct as the standalone sketch op (SURVEY
    * §2.I1; D5 is the `uniq()` SQL-surface form) — tighter rsd
    * parameter, global scope. No oracle (sketch families differ
    * across engines); the error bound vs the exact count is pinned in
    * `SketchSpec` rather than computed here, so the declared op never
    * pays the exact-distinct shuffle the sketch exists to avoid.
    * Scale shape: partial sketches build per scan task and a single
    * reducer merges fixed-size sketch states — at 100 TB the scan is
    * already thousands of tasks; at test scale the input is one
    * single-row-group 2 MB file that neither split tuning nor a
    * repartition can usefully parallelize (VERDICT r4 §Whats-wrong 2),
    * so the one-task partial is the cheapest plan. */
  private def i1HllDistinct(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "events")
      .select("user_id")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** I2: t-digest-style quantile sketch as the standalone op (SURVEY
    * §2.I2; D6-approx is the single-q SQL form) — a multi-quantile
    * vector from one sketch pass. No oracle. */
  private def i2TdigestQuantiles(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.1), lit(0.5), lit(0.9), lit(0.99)), lit(2000)).as("qs"))
      .select(
        col("qs")(0).as("p10"), col("qs")(1).as("p50"),
        col("qs")(2).as("p90"), col("qs")(3).as("p99"))

  /** D7: argMax/argMin → max_by/min_by. */
  private def d7ArgMax(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(max_by(col("s_name"), col("s_acctbal")).as("richest"),
        min_by(col("s_name"), col("s_acctbal")).as("poorest"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")

  /** D8: topK exact form — global heavy hitters with total tiebreak. */
  private def d8TopK(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p_brand").asc)
      .limit(10)

  /** D9: groupArray / groupUniqArray — sorted, string-joined so both
    * engines hash identical scalars. */
  private def d9GroupArray(spark: SparkSession, dir: String): DataFrame = {
    val nations = Engine.t(spark, dir, "nation")
      .groupBy("n_regionkey")
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
    val prios = Engine.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("k2"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("uniq_prios"))
    nations.crossJoin(prios)
      .select(col("n_regionkey"), col("nations"), col("k2"), col("uniq_prios"))
      .orderBy("n_regionkey", "k2")
  }

  /** D10: sumMap — pointwise map sum, emitted in canonical sorted
    * "key:value" form (exploded relational agg underneath). */
  private def d10SumMap(spark: SparkSession, dir: String): DataFrame =
    Engine.events(spark, dir)
      .groupBy("event_type")
      .agg(sum(CH.dec(col("value"))).as("s"))
      .select(concat(col("event_type"), lit(":"), col("s").cast("string")).as("kv"))
      .agg(concat_ws(",", sort_array(collect_list(col("kv")))).as("summap"))

  /** D11: statistical aggregates; all float-native → round(4) both
    * sides; oracle computes population skew/kurt from raw moments. */
  private def d11Stats(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_pop(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
        round(skewness(col("l_quantity")), 4).as("skew_qty"),
        round(kurtosis(col("l_quantity")), 4).as("kurt_qty"))
      .orderBy("l_returnflag")

  /** D13: any/anyLast in their deterministic form — value at the
    * smallest / largest order key. */
  private def d13Any(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(min_by(col("o_orderpriority"), col("o_orderkey")).as("any_prio"),
        max_by(col("o_orderpriority"), col("o_orderkey")).as("anylast_prio"))
      .orderBy("o_orderstatus")

  /** D14: ROLLUP (null group rows labeled for engine-neutral output). */
  private def d14Rollup(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("n"), col("sum_price"))
      .orderBy("status", "prio")

  /** D14: CUBE. */
  private def d14Cube(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"), col("n"))
      .orderBy("status", "prio")

  /** D14: GROUPING SETS via SQL text against the registered catalog. */
  private def d14GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Engine.t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, prio""".stripMargin)
  }

  /** D15: WITH TOTALS ≡ rollup at depth 1. */
  private def d15WithTotals(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .rollup("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("TOTALS")).as("status"), col("n"), col("sum_price"))
      .orderBy("status")

  /** D15b: CH `WITH TOTALS` as SQL *text* — [[graft.ChSql]] rewrites
    * the clause to the two-set grouping lattice `GROUPING SETS
    * ((cols), ())` (full grouping + ONE totals row, not rollup's
    * intermediate levels); d15's oracle shape certifies it. */
  private def d15bWithTotalsSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT coalesce(o_orderstatus, 'TOTALS') AS status, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus WITH TOTALS ORDER BY status""".stripMargin)
  }

  /** D16: HAVING. */
  private def d16Having(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 15)
      .orderBy("o_custkey")

  /** D17: row-level DISTINCT. */
  private def d17Distinct(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** I4: exact-bucket histogram (width_bucket semantics via floor). */
  private def i4Histogram(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** I6: CountMin-sketch frequency estimation (CH `topKWeighted`/
    * frequency-sketch family). The sketch build is Spark's built-in
    * `count_min_sketch` — a TypedImperativeAggregate whose partial
    * buffers merge map-side, so the exchange carries one w×d counter
    * table per task, never rows. The PROBE (read estimates back out of
    * the final ~KB sketch for the 5 known keys) is a bounded
    * driver-side step, same justification as the a12 listener probe —
    * at 100 TB only the sketch build touches the data. ε=0.001,
    * δ=0.01, fixed seed → deterministic output; error bound asserted
    * in SketchSpec. */
  /** Per-type Theta sketches of the user-id set, one compact KB-sized
    * sketch per event_type — the distributed part of i8 (shared with
    * `SketchSpec`). Per-partition imperative build (an `UpdateSketch`
    * per type per task: a data-dependent retention set no SQL
    * composition expresses — the justified-mapPartitions case), then a
    * tiny shuffle of (type × task) compact sketches and a per-type
    * union. The returned map holds ≤ #types KB-sized sketches. */
  private[graft] def thetaSketchesByType(
      spark: SparkSession, dir: String,
      userCap: Long = Long.MaxValue): Map[String, Array[Byte]] = {
    import spark.implicits._
    import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
    import org.apache.datasketches.memory.Memory
    Engine.events(spark, dir)
      .filter(col("user_id") < userCap)
      .select(col("event_type"), col("user_id")).as[(String, Long)]
      .mapPartitions { it =>
        val sk = scala.collection.mutable.Map.empty[String, UpdateSketch]
        it.foreach { case (t, u) =>
          sk.getOrElseUpdate(t, UpdateSketch.builder().build()).update(u)
        }
        sk.iterator.map { case (t, s) => (t, s.compact().toByteArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (t, it) =>
        val u = SetOperation.builder().buildUnion()
        it.foreach { case (_, b) => u.union(Sketches.wrapSketch(Memory.wrap(b))) }
        (t, u.getResult.toByteArray)
      }
      .collect().toMap
  }

  /** I8: `uniqTheta` + set operations — Theta sketches estimate
    * distinct-set INTERSECTIONS (audience overlap), the query HLL's
    * union-only algebra cannot answer. The corpus-side work is
    * [[thetaSketchesByType]]; the pairwise intersections run over the
    * ≤ #types merged sketches on bounded driver-side state (same
    * contract as the a12 listener probe). Determinism: below k=4096
    * distinct values a theta sketch is EXACT and order-independent;
    * in the sampling regime the retained set depends on arrival order
    * (QuickSelect theta — measured, see `SketchSpec`), so stability
    * here comes from the deterministic replay, and the declared
    * output exposes only an estimate-accuracy flag (10 % band,
    * generous vs the ~1.6 % RSE at k=4096) next to the ORACLE-CHECKED
    * exact overlap. `SketchSpec` pins the error bound in both regimes
    * plus exact-mode order-independence. */
  private def i8ThetaOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    import org.apache.datasketches.memory.Memory
    val merged = thetaSketchesByType(spark, dir)
    val ests = merged.keys.toSeq.sorted.combinations(2).map { pair =>
      val (a, b) = (pair.head, pair(1))
      val ix = SetOperation.builder().buildIntersection()
      ix.intersect(Sketches.wrapSketch(Memory.wrap(merged(a))))
      ix.intersect(Sketches.wrapSketch(Memory.wrap(merged(b))))
      (a, b, ix.getResult.getEstimate)
    }.toSeq.toDF("type_a", "type_b", "est")
    val tu = Engine.events(spark, dir).select("event_type", "user_id").distinct()
    val exact = tu.as("x").join(tu.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact_overlap"))
    exact.join(broadcast(ests), Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("n_exact_overlap"),
        (abs(col("est") - col("n_exact_overlap")) <=
          col("n_exact_overlap") * 0.10).as("est_within_10pct"))
      .orderBy("type_a", "type_b")
  }

  /** I8b: the EXACT regime of i8, declared as a fully hash-matched
    * oracle row. Below k=4096 retained values a theta sketch stores
    * the whole hashed id set, so intersection "estimates" are exact
    * integers and order/partitioning-independent — the cap
    * `user_id < 3000` pins that regime at EVERY scale factor (the id
    * space is capped, not sampled, so 100 TB of events still sketches
    * ≤ 3000 ids per type). The declared overlap column is the sketch
    * result itself — DuckDB recomputes it as a plain distinct-set
    * join, proving the sketch path end-to-end with no tolerance band
    * (VERDICT r8 #6). */
  private def i8bThetaExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    import org.apache.datasketches.memory.Memory
    val merged = thetaSketchesByType(spark, dir, userCap = 3000L)
    merged.keys.toSeq.sorted.combinations(2).map { pair =>
      val (a, b) = (pair.head, pair(1))
      val ix = SetOperation.builder().buildIntersection()
      ix.intersect(Sketches.wrapSketch(Memory.wrap(merged(a))))
      ix.intersect(Sketches.wrapSketch(Memory.wrap(merged(b))))
      (a, b, math.round(ix.getResult.getEstimate))
    }.toSeq.toDF("type_a", "type_b", "n_overlap")
      // the oracle's inner join emits no row for disjoint pairs — and in
      // the exact regime a sketch zero IS a true zero, so drop them here
      .filter(col("n_overlap") > 0)
      .orderBy("type_a", "type_b")
  }

  private def i6CountMin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Engine.events(spark, dir)
    val bytes = ev
      .select(count_min_sketch(col("event_type"), lit(0.001), lit(0.99), lit(42)).as("s"))
      .head.getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    import spark.implicits._
    exact.map { case (t, n) => (t, cms.estimateCount(t), n) }.toSeq
      .toDF("event_type", "est_count", "exact_count")
  }

  /** Declared i6b: the CountMin mechanism itself — d=4 hash rows ×
    * w=256 buckets, cell counts, min-over-rows estimates — expressed
    * relationally with the MD5 hash kernel (`md5_u64` ≡ DuckDB
    * `md5_number_upper`) so the oracle recomputes the identical grid
    * and estimates in SQL (production i6 keeps Spark's built-in
    * `count_min_sketch`; this is the l4b kernel-swap pattern for the
    * frequency-sketch leg). w is a power of two so signed-long pmod
    * and unsigned-UBIGINT mod agree on the low bits. Every quantity
    * is integer — no FP anywhere. Scale shape: the explode is a 4×
    * narrow map, the grid aggregate carries ≤ d·w = 1024 cells. The
    * CMS overcount invariant (est ≥ exact, never under) is emitted as
    * a column the oracle checks implicitly via the hash match. */
  private def i6bCountMinVerdict(spark: SparkSession, dir: String): DataFrame = {
    // Bounded verdict input (l4b's prefix pattern): event_id < 100000
    // covers the ENTIRE table at sf<=0.1 — oracle results unchanged —
    // and pins the per-row md5 demo cost at scale (production i6's
    // count_min_sketch is the scale path).
    val ev = Engine.events(spark, dir).filter(col("event_id") < 100000)
    def bucket(j: Column, t: Column): Column =
      pmod(call_function("md5_u64",
        concat(lit("cm"), j.cast("string"), lit(":"), t)), lit(256L))
    val cells = ev.select(col("event_type"), explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("b", bucket(col("j"), col("event_type")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val keys = ev.groupBy("event_type").agg(count(lit(1)).as("exact_count"))
    keys.select(col("event_type"), col("exact_count"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("b", bucket(col("j"), col("event_type")))
      .join(cells, Seq("j", "b"))
      .groupBy("event_type", "exact_count").agg(min(col("c")).as("est_count"))
      .select(col("event_type"), col("est_count"), col("exact_count"),
        (col("est_count") - col("exact_count")).as("overcount"))
      .orderBy("event_type")
  }

  /** Declared i1b: the HLL mechanism itself — m=256 registers indexed
    * by the low 8 hash bits, register = max(57 − bitlen(upper 56
    * bits)), harmonic estimator with the standard small-range
    * linear-counting correction — with the MD5 kernel standing in for
    * the production HLL++'s internal hash, so DuckDB re-derives every
    * register and both estimator branches. Determinism: register
    * values are exact-integer (bitlen via 2^p threshold comparisons,
    * never log/shift-by-column); Z folds exact powers of two in
    * register-index order on both engines (the proven list_sum
    * idiom), so the only libm call is the ln in the linear-counting
    * branch, rounded to 2 dp. At sf0.01 (150 users) the correction
    * branch fires; at sf0.1 (1500) the raw harmonic branch does —
    * the oracle certifies both regimes. */
  private def i1bHllVerdict(spark: SparkSession, dir: String): DataFrame = {
    // Same bound as i6b: full table at sf<=0.1 (both estimator
    // branches still exercised across sf0.01/sf0.1), bounded md5-fold
    // demo beyond — production i1's HLL++ is the scale path.
    val ev = Engine.events(spark, dir)
      .filter(col("user_id").isNotNull && col("event_id") < 100000)
    val h = ev.select(call_function("md5_u64",
      concat(lit("hll:"), col("user_id").cast("string"))).as("hv"))
    val parts = h.select(
      pmod(col("hv"), lit(256L)).as("idx"),
      shiftrightunsigned(col("hv"), 8).as("w"))
    // 2^p thresholds as a literal array — element_at beats 56 pow()
    // calls per row (5.6B pow at sf100's 100M events, 247 s -> scan-
    // bound); values identical, so the oracle is untouched.
    val pows = typedLit((0 to 55).map(p => 1L << p))
    val bitlen = aggregate(sequence(lit(0), lit(55)), lit(0),
      (acc, p) => acc +
        when(col("w") >= element_at(pows, p + 1), 1).otherwise(0))
    val regs = parts.withColumn("rho", lit(57) - bitlen)
      .groupBy("idx").agg(max(col("rho")).as("r"))
    val all = spark.range(256).select(col("id").as("idx"))
      .join(regs, Seq("idx"), "left").na.fill(0L, Seq("r"))
    val zRow = all.agg(
      sort_array(collect_list(struct(col("idx"), col("r")))).as("a"),
      CH.countIf(col("r") === 0).as("v_zeros"))
      .select(
        aggregate(transform(col("a"), s => pow(lit(2.0), -s.getField("r").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("z"),
        col("v_zeros"))
    val exact = ev.agg(count_distinct(col("user_id")).as("exact_users"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val estRaw = alpha * lit(65536.0) / col("z")
    zRow.crossJoin(exact)
      .select(
        col("v_zeros"), round(col("z"), 6).as("z6"),
        round(estRaw, 4).as("est_raw"),
        round(
          when(estRaw <= 640.0 && col("v_zeros") > 0,
            lit(256.0) * log(lit(256.0) / col("v_zeros").cast("double")))
            .otherwise(estRaw), 2).as("est"),
        col("exact_users"))
  }

  /** D18: `quantileExactWeighted` — weighted quantiles (median, p90)
    * of l_quantity weighted by l_linenumber. Values pre-aggregate to
    * (group, value, Σweight) — the cumulative-rank window then runs
    * over DISTINCT values, so ties are deterministic and the window's
    * per-group sort touches value cardinality, not row count. The rank
    * test `2·cw ≥ tw` / `10·cw ≥ 9·tw` stays in exact integer
    * arithmetic — no float rank boundary. */
  private def d18WeightedQuantile(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Engine.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity").as("v"))
      .agg(sum(col("l_linenumber")).as("wsum"))
    val cumW = Window.partitionBy("l_returnflag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy("l_returnflag")
    val ranked = byVal
      .withColumn("cw", sum(col("wsum")).over(cumW))
      .withColumn("tw", sum(col("wsum")).over(totW))
    ranked.filter(col("cw") * 2 >= col("tw"))
      .groupBy("l_returnflag").agg(min(col("v")).as("wmedian"))
      .join(
        ranked.filter(col("cw") * 10 >= col("tw") * 9)
          .groupBy("l_returnflag").agg(min(col("v")).as("wp90")),
        Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  /** D19: `entropy(x)` — Shannon entropy of the o_orderpriority
    * distribution per status. Two-level exact-count aggregation
    * (the CH streaming-entropy sketch is unnecessary when counts are
    * exact): H = log2(n) − Σ c·log2(c) / n. Both shuffles carry one
    * row per group — at 100 TB the exchange is (statuses × priorities)
    * rows regardless of input size. */
  private def d19Entropy(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
      .groupBy("o_orderstatus")
      .agg(
        round(log2(sum(col("c"))) - sum(col("c") * log2(col("c"))) / sum(col("c")), 6)
          .as("entropy"),
        sum(col("c")).as("n"))
      .orderBy("o_orderstatus")

  /** D20: `deltaSum(v)` — sum of positive consecutive deltas per user
    * in arrival order (event_id IS arrival order in the testdata; using
    * it instead of ts sidesteps the ns-vs-µs tie ambiguity between the
    * two engines, see [[Engine.events]]). One shuffle on user_id; the
    * window sort is per-user. */
  private def d20DeltaSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Engine.events(spark, dir)
      .withColumn("d", col("value") - lag("value", 1).over(w))
      .groupBy("user_id")
      .agg(
        round(sum(when(col("d") > 0, col("d")).otherwise(lit(0.0))), 4).as("delta_sum"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** Element-wise long-vector sum for the -ForEach combinator: a typed
    * Aggregator (ObjectHashAggregate, map-side partial merge) so the
    * exchange carries ONE long[dim] buffer per (label × task), never
    * n×dim exploded rows — same scale argument as [[LlmVector.VecMean]]. */
  class VecSumLong extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
      if (a == null) b
      else if (b.isEmpty) a.clone()
      else {
        // ragged input must fail loudly, not truncate to the buffer's
        // length established by the first row (ADVICE r7)
        require(a.length == b.length, s"ragged vector: ${a.length} vs ${b.length}")
        var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b
      }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y else if (y.isEmpty) x
      else {
        require(x.length == y.length, s"ragged vector: ${x.length} vs ${y.length}")
        var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
      }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** D21: CH `-ForEach` combinator (`sumForEach(arr)`) — element-wise
    * aggregation over array columns, here the per-label element-wise
    * sum of embeddings. Elements are quantized to exact milli-units
    * (long) first so the sum is associative and engine-portable —
    * float addition order would otherwise differ between Spark's
    * partial-merge tree and DuckDB's. Emitted string-joined (driver
    * hash discipline for array outputs, same as mm2). */
  private def d21SumForEach(spark: SparkSession, dir: String): DataFrame = {
    val vsum = udaf(new VecSumLong)
    Engine.t(spark, dir, "embeddings")
      .withColumn("mv", expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"))
      .groupBy("label")
      .agg(vsum(col("mv")).as("vs"), count(lit(1)).as("n"))
      .select(col("label"), array_join(col("vs"), ",").as("vsum_csv"), col("n"))
      .orderBy("label")
  }

  /** D22: CH `-Array` / `-Distinct` aggregate combinators —
    * `sumArray` folds each row's array then aggregates across rows
    * (per-row fold stays in codegen; the agg sees one scalar per row),
    * `minArray`/`maxArray` likewise, `sumDistinct` is the built-in.
    * Int arrays so every sum is exact. */
  private def d22ArrayCombinators(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .withColumn("lens", expr("transform(split(p_name, ' '), w -> length(w))"))
      .groupBy("p_brand")
      .agg(
        sum(expr("aggregate(lens, 0, (a, x) -> a + x)")).as("sum_array"),
        min(expr("array_min(lens)")).as("min_array"),
        max(expr("array_max(lens)")).as("max_array"),
        sum_distinct(col("p_size")).as("sum_distinct_size"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** I2b: the ENGINE-OWNED t-digest (see [[TDigestAgg]]) — i2 maps the
    * reference's quantileTDigest onto Spark's built-in
    * `percentile_approx` sketch; this op runs the actual t-digest
    * algorithm as a custom mergeable Aggregator. No oracle (sketch
    * internals are engine-specific); SketchSpec pins p50/p90/p99 rank
    * error against exact percentiles. */
  private def i2bTdigestCustom(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("tdigest_q",
      udaf(new TDigestAgg(100, Array(0.5, 0.9, 0.99))))
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("tdigest_q(cast(l_extendedprice as double))").as("qv"))
      .select(col("l_returnflag"),
        round(col("qv").getItem(0), 2).as("p50"),
        round(col("qv").getItem(1), 2).as("p90"),
        round(col("qv").getItem(2), 2).as("p99"))
      .orderBy("l_returnflag")
  }

  /** Declared i2c (VERDICT r16 #1): the t-digest mechanism itself,
    * ORACLE-certified cross-engine — the last approximate mechanism
    * without a verdict twin (HLL has i1b, CountMin i6b, theta i8b,
    * SpaceSaving i3b, Bloom l31b). Regime chosen so the ENGINE-OWNED
    * Aggregator ([[TDigestAgg]], via [[TDigestCentroidsAgg]] which
    * delegates every step) runs fully deterministically and DuckDB can
    * replay it exactly:
    *  - bounded input: the 400 events with event_id < 400 (absolute
    *    bound, same i1b/i6b pattern — fixed size at every SF);
    *  - integer-quantized values (exact cents via DECIMAL(12,2)·100,
    *    the proven d34/d25 idiom) with unit weights, so every qMid /
    *    bound / weighted-mean double op starts from exact integers;
    *  - 400 < bufferCap (δ=100 → 500) and repartition(1) → a single
    *    partial buffer, NO intermediate compress: finish() runs the
    *    greedy size-bounded merge (4·W·q(1−q)/δ) exactly ONCE over
    *    the mean-sorted singletons — which the oracle replays
    *    step-for-step in a recursive CTE with the identical IEEE
    *    double op sequence (each op exactly rounded → bit parity).
    * Output hashes the WHOLE final digest (every centroid as
    * round(mean·10⁴):weight), its size, and the four midpoint-
    * interpolated quantile reads — so reduce, merge, compress and
    * finish are all certified, not just four reads. Insertion order
    * is immaterial by construction: no compress before finish, and
    * finish sorts by mean (ties are (mean,1.0)-identical). */
  private def i2cTdigestVerdict(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("tdigest_i2c_q",
      udaf(new TDigestAgg(100, Array(0.25, 0.5, 0.9, 0.99))))
    spark.udf.register("tdigest_i2c_cent", udaf(new TDigestCentroidsAgg(100)))
    Engine.events(spark, dir)
      .filter(col("event_id") < 400 && col("value").isNotNull)
      .select((col("value").cast("decimal(12,2)") * 100).cast("long").as("vq"))
      .repartition(1)
      .agg(count(lit(1)).as("n"),
        expr("tdigest_i2c_cent(cast(vq as double))").as("cent"),
        expr("tdigest_i2c_q(cast(vq as double))").as("qv"))
      .select(col("n"),
        expr("cast(size(cent) / 2 as bigint)").as("n_centroids"),
        expr("""array_join(transform(sequence(0, int(size(cent) / 2) - 1),
            i -> concat(cast(cast(round(cent[i * 2] * 10000) as bigint) as string), ':',
                        cast(cent[i * 2 + 1] as bigint))), ',')""").as("centroids"),
        round(col("qv")(0), 4).as("p25"), round(col("qv")(1), 4).as("p50"),
        round(col("qv")(2), 4).as("p90"), round(col("qv")(3), 4).as("p99"))
  }

  /** D8b: `topKWeighted` — heavy hitters by accumulated weight rather
    * than row count (exact form: one partial-aggregated shuffle on the
    * key, then a global top-5 via TakeOrdered). */
  private def d8bTopKWeighted(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(CH.dec(col("o_totalprice"))).as("w"))
      .orderBy(col("w").desc, col("o_custkey").asc)
      .limit(5)
      .select(col("o_custkey"), col("w").cast("double").as("weight"))

  /** D25: `welchTTest` — CH's hypothesis-testing family. Welch's
    * unequal-variance t statistic + Satterthwaite dof between two
    * groups, computed from EXACT decimal moment sums (Σx, Σx² stay
    * associative/deterministic through partial aggregation; the final
    * t/dof arithmetic is +,×,/,sqrt only — IEEE-identical on both
    * engines, the same discipline as l29/l32). One row out of one
    * scan-side aggregation. */
  private def d25WelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val v = CH.dec(col("value"))
    val vv = (v * v).cast("decimal(24,4)")
    def grp(t: String) = col("event_type") === t
    val s = Engine.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .agg(
        CH.countIf(grp("click")).cast("double").as("n1"),
        CH.sumIf(v, grp("click")).cast("double").as("sx1"),
        CH.sumIf(vv, grp("click")).cast("double").as("sxx1"),
        CH.countIf(grp("error")).cast("double").as("n2"),
        CH.sumIf(v, grp("error")).cast("double").as("sx2"),
        CH.sumIf(vv, grp("error")).cast("double").as("sxx2"))
    val m1 = col("sx1") / col("n1"); val m2 = col("sx2") / col("n2")
    val v1 = (col("sxx1") - col("sx1") * col("sx1") / col("n1")) / (col("n1") - 1)
    val v2 = (col("sxx2") - col("sx2") * col("sx2") / col("n2")) / (col("n2") - 1)
    val se1 = v1 / col("n1"); val se2 = v2 / col("n2")
    s.select(
      col("n1").cast("long").as("n_click"),
      col("n2").cast("long").as("n_error"),
      round((m1 - m2) / sqrt(se1 + se2), 4).as("t_stat"),
      round((se1 + se2) * (se1 + se2) /
        (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)), 2).as("dof"))
  }

  /** Distributed global cumulative sums over a sorted rollup WITHOUT a
    * single-partition global window (VERDICT r13 #2 — `events.value`
    * is continuous, so the distinct-value table grows with the data
    * and `Window.orderBy` with no partition is a genuine single-task
    * sort at 100 TB). The i4b pattern, factored for d34/d35:
    * range-repartition on the sort key, stage to scratch parquet (so
    * every downstream pass sees the SAME partition assignment — range
    * boundary sampling is not deterministic across jobs), collect ONE
    * subtotal row per partition per column (KB-bounded driver state),
    * and join back broadcast exclusive partition offsets `__off_<c>`.
    * Callers turn a per-partition window sum into the exact global
    * cumulative sum by adding the offset; partition boundaries cannot
    * affect the result because ranks are derived from the one staged
    * total order. Returns the staged frame plus the per-column grand
    * totals (driver scalars). */
  private def stagedCumOffsets(spark: SparkSession, dir: String, name: String,
      byVal: DataFrame, sortCol: String, sumCols: Seq[String])
      : (DataFrame, Map[String, Long]) = {
    val staged = Engine.scratch(spark, dir, name)
    byVal.repartitionByRange(Engine.stagingWidth(spark), col(sortCol))
      .sortWithinPartitions(sortCol)
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(staged)
    val df = spark.read.parquet(staged)
    val per = df.groupBy("__pid")
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
      .collect()
      .map(r => r.getInt(r.fieldIndex("__pid")) ->
        sumCols.map(c => if (r.isNullAt(r.fieldIndex(c))) 0L else r.getLong(r.fieldIndex(c))))
      .sortBy(_._1)
    val totals = sumCols.indices.map(i => sumCols(i) -> per.map(_._2(i)).sum).toMap
    val offRows = per.scanLeft((0, sumCols.map(_ => 0L))) {
      case ((_, acc), (pid, tots)) => (pid, acc.zip(tots).map { case (a, t) => a + t })
    } // scanLeft pairs: offset BEFORE partition i lives at scan index i
    val offs = per.map(_._1).zip(offRows.map(_._2)).map {
      case (pid, offVals) => Row.fromSeq(pid +: offVals)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        sumCols.map(c => org.apache.spark.sql.types.StructField(
          s"__off_$c", org.apache.spark.sql.types.LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offs.toSeq, 1), schema)
    (df.join(broadcast(offDf), "__pid"), totals)
  }

  /** D28 (CH `mannWhitneyUTest`): rank-sum U statistic with average
    * ranks for ties plus the tie-corrected normal approximation z —
    * click vs error samples on `events.value`. All rank arithmetic
    * stays in EXACT integers: the doubled average rank of a tied value
    * is 2·rank(v) = 2·offset(v) + cnt(v) + 1 (an integer), so
    * 2·R₁ = Σ n₁(v)·(2·offset+cnt+1) accumulates associatively in
    * DECIMAL(38,0) (overflow-safe past BIGINT at cluster scale; DuckDB
    * mirrors in the same decimal width). The final u/z arithmetic is
    * one fixed double expression over those exact sums — the same IEEE
    * sequence on both engines (d25's discipline). The rank window runs
    * over the DISTINCT-VALUE rollup via [[stagedCumOffsets]] — no
    * single-partition global window anywhere (`events.value` is
    * continuous, so the rollup's cardinality grows with the data). */
  private def d34MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Engine.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .groupBy(CH.dec(col("value")).as("v"))
      .agg(CH.countIf(col("event_type") === "click").as("n1v"),
        CH.countIf(col("event_type") === "error").as("n2v"))
      .withColumn("cnt", col("n1v") + col("n2v"))
    val (staged, _) = stagedCumOffsets(spark, dir, "d34_ranked", byVal, "v", Seq("cnt"))
    val w = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cntd = col("cnt").cast("decimal(38,0)")
    val s = staged
      .withColumn("off", col("__off_cnt") + coalesce(sum("cnt").over(w), lit(0L)))
      .agg(
        sum("n1v").as("n1"), sum("n2v").as("n2"),
        sum(col("n1v").cast("decimal(38,0)") *
          (lit(2) * col("off") + col("cnt") + 1).cast("decimal(38,0)")).as("r1x2"),
        sum(cntd * cntd * cntd - cntd).as("tie"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val nd = n1d + n2d
    val u1 = (col("r1x2").cast("double") - n1d * (n1d + 1)) / 2
    val sigma = sqrt(n1d * n2d / 12 *
      ((nd + 1) - col("tie").cast("double") / (nd * (nd - 1))))
    s.select(
      col("n1").cast("long").as("n_click"),
      col("n2").cast("long").as("n_error"),
      round(u1, 4).as("u1"),
      round(n1d * n2d - u1, 4).as("u2"),
      round((u1 - n1d * n2d / 2) / sigma, 4).as("z_stat"))
  }

  /** D29 (CH `kolmogorovSmirnovTest`): two-sample KS distance between
    * the click and error value distributions. The supremum
    * D = max |F₁(v) − F₂(v)| is computed EXACTLY in integers:
    * numerator(v) = |c₁(v)·n₂ − c₂(v)·n₁| over the cumulative counts,
    * so D = max(numerator)/(n₁·n₂) involves no per-row floating point
    * at all — both engines agree bit-for-bit before the two final
    * double divisions. Cumulative counts come from [[stagedCumOffsets]]
    * like d34's ranks (per-partition window + broadcast offsets — no
    * global window); the grand totals n₁/n₂ are the offset collect's
    * column sums, injected as literals. */
  private def d35KsTest(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Engine.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .groupBy(CH.dec(col("value")).as("v"))
      .agg(CH.countIf(col("event_type") === "click").as("n1v"),
        CH.countIf(col("event_type") === "error").as("n2v"))
    val (staged, totals) =
      stagedCumOffsets(spark, dir, "d35_ranked", byVal, "v", Seq("n1v", "n2v"))
    val wc = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val s = staged
      .withColumn("c1", col("__off_n1v") + sum("n1v").over(wc))
      .withColumn("c2", col("__off_n2v") + sum("n2v").over(wc))
      .agg(
        max(abs(col("c1").cast("decimal(38,0)") * lit(totals("n2v")).cast("decimal(38,0)") -
          col("c2").cast("decimal(38,0)") * lit(totals("n1v")).cast("decimal(38,0)"))).as("dnum"))
    val n1d = lit(totals("n1v")).cast("double"); val n2d = lit(totals("n2v")).cast("double")
    val dRaw = col("dnum").cast("double") / (n1d * n2d)
    s.select(
      lit(totals("n1v")).as("n_click"),
      lit(totals("n2v")).as("n_error"),
      col("dnum").cast("double").as("d_num"),
      round(dRaw, 6).as("d_stat"),
      round(dRaw * sqrt(n1d * n2d / (n1d + n2d)), 4).as("ks_z"))
  }

  /** D36 (CH `rankCorr`): Spearman rank correlation between
    * `l_quantity` and `l_extendedprice`, ties handled by AVERAGE
    * ranks. All rank arithmetic is exact: the doubled average rank of
    * a tied value is u(v) = 2·offset(v) + cnt(v) + 1 (d34's integer
    * identity), computed per DISTINCT value with [[stagedCumOffsets]]
    * — per-partition window over range-staged value groups + broadcast
    * offsets, NO global window at any scale — then joined back to the
    * rows by value (two shuffle joins, each scale-safe). Spearman rho
    * is Pearson on the ranks and is invariant under the 2r+c scaling,
    * so the five sufficient sums accumulate u directly in
    * DECIMAL(38,0) (u ≤ 2n ⇒ Σu² ≤ 4n³ — exact past 10¹² rows); only
    * the last-mile combination is floating point, with the identical
    * expression order on both engines (DuckDB mirrors the u identity
    * with flat rank()/count() windows and exits each sum through the
    * VARCHAR→DOUBLE bridge).
    *
    * Shape (r20): marginal-factored sums — su/suu aggregate from the
    * x-marginal u-map, sv/svv from the y-marginal, and the one joint
    * term factors through the per-distinct-y rollup
    * (suv = Σ_y uy·Σ_{rows with y} ux), so no joint (x, y) table is
    * ever staged and no u-map joins back to row-width data. See the
    * in-body comment for the r19→r20 diff and the exactness bounds.
    * Ref: DanielCasali/clickhouseocp pins ClickHouse v25.7
    * (`rankCorr`), Dockerfile:102-126. */
  private def d36Spearman(spark: SparkSession, dir: String): DataFrame = {
    // r20 reshape (guide §2.3/§2.4 — shuffle fewer bytes, remove the
    // join-back): the r19 form joined BOTH u-maps back to the pair
    // rollup — a distinct-pairs × distinct-y sort-merge join (600 k ×
    // 583 k at sf0.1, the dominant tail term) plus a tagged marginal
    // staging pass. The five sufficient sums never need that join:
    // su/suu are pure x-marginal sums, sv/svv pure y-marginal sums,
    // and the one joint term factors through the y-rollup —
    //   suv = Σ_rows ux·uy = Σ_y uy · (Σ_{rows with y} ux) = Σ_y uy·sxy
    // where the per-distinct-y rollup CARRIES sxy = Σ_x cnt(x,y)·ux,
    // so the staged y-pass aggregates suv directly: no join-back.
    // The x-side u-map attaches to the pair rollup by a plain
    // equi-join (value-bounded here — 50 quantity levels — so AQE
    // broadcasts it; stays a scale-safe shuffle join for a continuous
    // x). Every sum is the same exact DECIMAL(38,0) integer as the
    // r19 form (u ≤ 2n, sxy ≤ 2n², suv ≤ 4n³ — exact past 10¹² rows)
    // and the last-mile double expression is unchanged, so the oracle
    // hash pins equivalence.
    // The corpus is read ONCE into the pair rollup (the sf100 lesson
    // of this round: at 12 GB+ the scan is DISK-bound at ~120 s/pass
    // on this host, so corpus pass count dominates everything
    // downstream — a first marginal-factored form read the corpus
    // twice, once per marginal, and measured 245 s vs 150 s
    // head-to-head at the sf100 replica); all downstream algebra runs
    // over the rollup (≤ distinct-pair rows).
    val pairPath = Engine.scratch(spark, dir, "d36_pairs")
    Engine.t(spark, dir, "lineitem")
      .select(CH.dec(col("l_quantity")).as("x"),
        CH.dec(col("l_extendedprice")).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(pairPath)
    val pairs = spark.read.parquet(pairPath)
    val wOff = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    def uCol = (lit(2) * (col("__off_cnt") + coalesce(sum("cnt").over(wOff), lit(0L)))
      + col("cnt") + 1).cast("decimal(19,0)")
    // x marginal: distinct-value rollup → staged cumulative offsets →
    // exact doubled average rank u(v)
    val xVal = pairs.groupBy(col("x").as("v")).agg(sum(col("cnt")).as("cnt"))
    val (xStaged, _) = stagedCumOffsets(spark, dir, "d36_xrank", xVal, "v", Seq("cnt"))
    val xMap = xStaged.withColumn("ux", uCol)
    // su/suu from the x marginal alone (value-count-sized aggregate)
    val cxd = col("cnt").cast("decimal(19,0)")
    val sx = xMap.agg(
      sum(cxd * col("ux")).as("su"),
      sum(cxd * col("ux") * col("ux")).as("suu"))
    // y rollup over the ux-attached PAIR rollup: cnt + the joint term
    // sxy = Σ_x cnt(x,y)·ux — the same exact integer as the
    // per-occurrence Σ ux
    val byY = pairs.join(xMap.select(col("v").as("x"), col("ux")), "x")
      .groupBy(col("y").as("v"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("cnt").cast("decimal(19,0)") * col("ux")).as("sxy"))
    val (yStaged, _) = stagedCumOffsets(spark, dir, "d36_yrank", byY, "v", Seq("cnt"))
    val cyd = col("cnt").cast("decimal(19,0)")
    val s = yStaged.withColumn("uy", uCol)
      .agg(
        sum(col("cnt")).as("n"),
        sum(cyd * col("uy")).as("sv"),
        sum(cyd * col("uy") * col("uy")).as("svv"),
        sum(col("uy") * col("sxy")).as("suv"))
      .crossJoin(sx)
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nd * d("suv") - d("su") * d("sv")
    val den = sqrt(nd * d("suu") - d("su") * d("su")) *
      sqrt(nd * d("svv") - d("sv") * d("sv"))
    s.select(col("n").cast("long").as("n"), round(num / den, 6).as("rho"))
  }

  /** D24: `-Resample` combinator (`sumResample(start,end,step)(x,key)`)
    * — the aggregate splits into key-range bands and emits one value
    * per band. Spark-native: band = floor(key/step) as a second group
    * key, re-assembled into the banded vector per group (string-joined,
    * driver hash discipline). Two one-row-per-group shuffles. */
  private def d24Resample(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .withColumn("band", floor(col("l_quantity") / 10).cast("int"))
      .groupBy("l_returnflag", "band")
      .agg(sum(CH.dec(col("l_quantity"))).as("s"))
      .groupBy("l_returnflag")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(band, s))), " +
        "x -> concat(cast(x.band as string), ':', cast(x.s as string))), ',')").as("resampled"))
      .orderBy("l_returnflag")

  /** D26: minMap / maxMap — the pointwise map-combinator family next
    * to d10's sumMap: per-key minimum and maximum folded across rows
    * (exploded relational agg underneath, canonical sorted k:v form). */
  private def d26MinMaxMap(spark: SparkSession, dir: String): DataFrame =
    Engine.events(spark, dir)
      .groupBy("event_type")
      .agg(min(CH.dec(col("value"))).as("mn"), max(CH.dec(col("value"))).as("mx"))
      .select(
        concat(col("event_type"), lit(":"), col("mn").cast("string")).as("kvn"),
        concat(col("event_type"), lit(":"), col("mx").cast("string")).as("kvx"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("kvn")))).as("minmap"),
        concat_ws(",", sort_array(collect_list(col("kvx")))).as("maxmap"))

  /** D27: `GROUP BY ALL` — the modern grouping sugar (CH 25.x and
    * DuckDB both speak it): every non-aggregate select item becomes a
    * group key at ANALYSIS time, so the plan is identical to the
    * explicit form. Declared through the SQL front door since the
    * sugar is syntax, not semantics. */
  private def d27GroupByAll(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** I4b: equi-HEIGHT histogram — the other histogram CH (and every
    * CBO) keeps: ntile splits the value distribution into equal-count
    * buckets, each summarized by (lo, hi, n). Total-order tiebreak on
    * the row key makes bucket edges deterministic; the global sort
    * runs at the grouped cardinality. Complements i4's equi-width
    * exact-bucket form. */
  /** I4b: equi-height histogram = `ntile(10)` over the (o_totalprice,
    * o_orderkey) total order — but a bare global ntile window is a
    * SINGLE-TASK sort of the whole table (the sf10 rehearsal measured
    * 30 s sorting 15 M rows on one core). Distributed equivalent:
    * range-repartition on the sort key and persist once (so both
    * passes see identical partitions), take per-partition counts (≤
    * one row per partition — KB-scale driver state, the d6 pattern),
    * convert each partition's local row_number to a global rank with
    * broadcast offsets, and apply ntile's exact bucket arithmetic
    * (first n mod k buckets get ⌈n/k⌉ rows) in closed form. Output is
    * bit-identical to the builtin ntile (same total order, same
    * remainder rule — `ntile ≡ builtin` case in `SketchSpec`). */
  private def i4bEquiheight(spark: SparkSession, dir: String): DataFrame = {
    val sortCols = Seq(col("o_totalprice"), col("o_orderkey"))
    val stagedPath = Engine.scratch(spark, dir, "i4b_ranked")
    Engine.t(spark, dir, "orders")
      .select("o_totalprice", "o_orderkey")
      .repartitionByRange(Engine.stagingWidth(spark), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .write.mode("overwrite").parquet(stagedPath)
    val staged = spark.read.parquet(stagedPath)
    val pidCounts = staged.groupBy("pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = pidCounts.scanLeft(0L)(_ + _._2).zip(pidCounts)
      .map { case (off, (pid, _)) => (pid, off) }
    val n = pidCounts.map(_._2).sum
    val q = n / 10
    val r = n % 10
    val offDf = staged.sparkSession.createDataFrame(offsets).toDF("pid", "off")
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(sortCols: _*)
    val rank = (col("off") + row_number().over(wp)).as("rank")
    val bucket =
      if (q == 0) col("rank") // fewer rows than buckets: bucket = rank
      else when(col("rank") <= lit(r * (q + 1)),
          (col("rank") - 1) / lit(q + 1) + 1)
        .otherwise(lit(r) + (col("rank") - lit(r * (q + 1)) - 1) / lit(q) + 1)
    staged.join(broadcast(offDf), "pid")
      .select(col("o_totalprice"), rank)
      .withColumn("bucket", floor(bucket).cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")
  }

  /** D31: `cramersV` — CH's categorical-association family: χ² over
    * the exact contingency table of two columns, normalized to [0,1].
    * All counts are exact integers; the χ² fold is +,×,/ double
    * arithmetic over 15 cells (rounded 6 dp both engines). Shape:
    * one (r×c)-row aggregation, then a broadcast of the marginals —
    * scan-bound at any scale. */
  private def d31CramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Engine.t(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
    val withMarginals = cells
      .withColumn("rt", sum("c").over(w.partitionBy("o_orderstatus")))
      .withColumn("ct", sum("c").over(w.partitionBy("o_orderpriority")))
      .withColumn("n", sum("c").over(w.partitionBy()))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double")
    withMarginals
      .withColumn("chi", (col("c").cast("double") - e) * (col("c").cast("double") - e) / e)
      .agg(
        sum(col("chi")).as("chi2"),
        first(col("n")).as("n"),
        count_distinct(col("o_orderstatus")).as("r"),
        count_distinct(col("o_orderpriority")).as("cc"))
      .select(
        round(col("chi2"), 6).as("chi2"),
        col("n"),
        round(sqrt(col("chi2") /
          (col("n").cast("double") * least(col("r") - 1, col("cc") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** D32: `-State` / `-Merge` through STORAGE — the AggregatingMergeTree
    * pattern: partial aggregate states persist as a table and merge on
    * read. Spark-native: `hll_sketch_agg` (Datasketches HLL) emits one
    * BINARY sketch per (source × chunk) to parquet; the read side
    * `hll_union_agg`s the stored states per source. The sketch is a
    * deterministic mergeable summary, but the estimator differs by
    * build path (Datasketches HIP for update-built, composite after
    * unions), so the invariant is a tolerance band, not bit equality:
    * both estimates must sit within the lgK=12 HLL error envelope of
    * the exact count (3× rsd ≈ 4.9%; we gate at 5%) — declared as a
    * per-source invariant (`state_merge_ok`) next to the oracle-checked
    * exact count. At 100 TB this is the incremental-rollup contract: each
    * ingest writes KB-sized states, never re-reading history; a
    * refresh is a union of states, not a rescan. */
  private def d32AggStateStorage(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = Engine.scratch(spark, dir, "d32_states")
    val docs = Engine.t(spark, dir, "documents")
    // 4 ingest chunks, each writing its partial HLL state per source
    docs.withColumn("chunk", pmod(col("doc_id"), lit(4)))
      .groupBy("source", "chunk")
      .agg(hll_sketch_agg(col("doc_id")).as("state"))
      .write.mode("overwrite").parquet(stateDir)
    val merged = spark.read.parquet(stateDir)
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_union_agg(col("state"))).as("est_merged"))
    val direct = docs.groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("est_direct"),
        count_distinct(col("doc_id")).as("n_exact"))
    val tol = greatest(lit(1.0), col("n_exact").cast("double") * lit(0.05))
    merged.join(direct, "source")
      .select(col("source"), col("n_exact"),
        (abs(col("est_merged") - col("n_exact")) <= tol &&
          abs(col("est_direct") - col("n_exact")) <= tol).as("state_merge_ok"))
      .orderBy("source")
  }

  /** D33: `uniqUpTo(N)` — exact distinct count capped at N+1 (the
    * reference's "exact until it stops mattering" cardinality probe).
    * Declarative form: `least(uniqExact, N+1)` — the cap is a
    * post-aggregation clamp, so the plan is d4's exact-distinct. */
  private def d33UniqUpTo(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        least(count_distinct(col("l_suppkey")), lit(11L)).as("uniq_upto_10"),
        least(count_distinct(col("l_linestatus")), lit(11L)).as("uniq_upto_10_small"))
      .orderBy("l_returnflag")

  val queries: Map[String, Q] = Map(
    "d32_agg_state_storage" -> (d32AggStateStorage _),
    "d33_uniq_upto" -> (d33UniqUpTo _),
    "d31_cramers_v" -> (d31CramersV _),
    "i4b_equiheight_histogram" -> (i4bEquiheight _),
    "d27_group_by_all" -> (d27GroupByAll _),
    "d26_minmax_map" -> (d26MinMaxMap _),
    "d24_resample" -> (d24Resample _),
    "d8b_topk_weighted" -> (d8bTopKWeighted _),
    "d25_welch_ttest" -> (d25WelchTtest _),
    "d34_mann_whitney" -> (d34MannWhitney _),
    "d35_ks_test" -> (d35KsTest _),
    "d36_spearman" -> (d36Spearman _),
    "i2b_tdigest_custom" -> (i2bTdigestCustom _),
    "i2c_tdigest_verdict" -> (i2cTdigestVerdict _),
    "d22_array_combinators" -> (d22ArrayCombinators _),
    "d19_entropy" -> (d19Entropy _),
    "d20_delta_sum" -> (d20DeltaSum _),
    "d21_sum_foreach" -> (d21SumForEach _),
    "d18_weighted_quantile" -> (d18WeightedQuantile _),
    "i6_countmin" -> (i6CountMin _),
    "i6b_countmin_verdict" -> (i6bCountMinVerdict _),
    "i1b_hll_verdict" -> (i1bHllVerdict _),
    "i8_theta_overlap" -> (i8ThetaOverlap _),
    "i8b_theta_exact" -> (i8bThetaExact _),
    "d1_groupby_agg" -> (d1GroupBy _),
    "d2_min_max_avg" -> (d2MinMax _),
    "d3_agg_if" -> (d3AggIf _),
    "d4_uniq_exact" -> (d4UniqExact _),
    "d5_approx_uniq" -> (d5ApproxUniq _),
    "d6_quantiles" -> (d6Quantiles _),
    "d6_approx_quantiles" -> (d6ApproxQuantiles _),
    "i1_hll_distinct" -> (i1HllDistinct _),
    "i2_tdigest_quantiles" -> (i2TdigestQuantiles _),
    "d7_argmax" -> (d7ArgMax _),
    "d8_topk" -> (d8TopK _),
    "d9_group_array" -> (d9GroupArray _),
    "d10_summap" -> (d10SumMap _),
    "d11_stats" -> (d11Stats _),
    "d13_any_deterministic" -> (d13Any _),
    "d14_rollup" -> (d14Rollup _),
    "d14_cube" -> (d14Cube _),
    "d14_grouping_sets" -> (d14GroupingSets _),
    "d15_with_totals" -> (d15WithTotals _),
    "d15b_with_totals_sql" -> (d15bWithTotalsSql _),
    "d16_having" -> (d16Having _),
    "d17_distinct" -> (d17Distinct _),
    "i4_histogram" -> (i4Histogram _))

  val oracles: Map[String, String] = Map(
    // Brute-force replay of i6b: identical md5 grid (d=4 × w=256,
    // power-of-two width so UBIGINT mod == signed pmod on low bits),
    // cell counts, min-over-rows estimates.
    "i6b_countmin_verdict" ->
      """WITH ev AS (SELECT event_type FROM events WHERE event_id < 100000),
        |cells AS (SELECT j,
        |    md5_number_upper('cm' || CAST(j AS VARCHAR) || ':' || event_type) % 256 AS b,
        |    count(*) AS c
        |  FROM ev CROSS JOIN range(4) t(j) GROUP BY 1, 2),
        |keys AS (SELECT event_type, count(*) AS exact_count FROM ev GROUP BY 1),
        |probes AS (SELECT k.event_type, k.exact_count, t.j,
        |    md5_number_upper('cm' || CAST(t.j AS VARCHAR) || ':' || k.event_type) % 256 AS b
        |  FROM keys k CROSS JOIN range(4) t(j))
        |SELECT p.event_type, min(c.c) AS est_count, p.exact_count,
        |  min(c.c) - p.exact_count AS overcount
        |FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
        |GROUP BY p.event_type, p.exact_count ORDER BY p.event_type""".stripMargin,
    // Step-for-step replay of i2c: the greedy size-bounded centroid
    // merge of TDigestAgg.compress as a recursive CTE over the 400
    // mean-sorted integer-quantized values (one state row per insert,
    // the merge/emit decision written with the IDENTICAL IEEE double
    // op sequence as TDigest.scala — qMid = (cum + (cw+w)/2)/total,
    // bound = max(1, 4·total·qMid·(1−qMid)/δ)), then the same
    // centroid-midpoint interpolation finish() uses. Hashes every
    // centroid plus the four quantile reads.
    "i2c_tdigest_verdict" ->
      """WITH RECURSIVE
        |vals AS (SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM events WHERE event_id < 400 AND value IS NOT NULL),
        |srt AS (SELECT CAST(v AS DOUBLE) AS v, row_number() OVER (ORDER BY v) AS i FROM vals),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS total, count(*) AS n FROM vals),
        |g AS (
        |  SELECT CAST(1 AS BIGINT) AS i, s.v AS cm, CAST(1.0 AS DOUBLE) AS cw,
        |         CAST(0.0 AS DOUBLE) AS cum,
        |         CAST([] AS DOUBLE[]) AS om, CAST([] AS DOUBLE[]) AS ow
        |  FROM srt s WHERE s.i = 1
        |  UNION ALL
        |  SELECT s.i,
        |    CASE WHEN g.cw + 1.0 <= greatest(CAST(1.0 AS DOUBLE),
        |        4.0 * nn.total * ((g.cum + (g.cw + 1.0) / 2) / nn.total)
        |          * (1 - (g.cum + (g.cw + 1.0) / 2) / nn.total) / 100)
        |      THEN (g.cm * g.cw + s.v * 1.0) / (g.cw + 1.0) ELSE s.v END,
        |    CASE WHEN g.cw + 1.0 <= greatest(CAST(1.0 AS DOUBLE),
        |        4.0 * nn.total * ((g.cum + (g.cw + 1.0) / 2) / nn.total)
        |          * (1 - (g.cum + (g.cw + 1.0) / 2) / nn.total) / 100)
        |      THEN g.cw + 1.0 ELSE 1.0 END,
        |    CASE WHEN g.cw + 1.0 <= greatest(CAST(1.0 AS DOUBLE),
        |        4.0 * nn.total * ((g.cum + (g.cw + 1.0) / 2) / nn.total)
        |          * (1 - (g.cum + (g.cw + 1.0) / 2) / nn.total) / 100)
        |      THEN g.cum ELSE g.cum + g.cw END,
        |    CASE WHEN g.cw + 1.0 <= greatest(CAST(1.0 AS DOUBLE),
        |        4.0 * nn.total * ((g.cum + (g.cw + 1.0) / 2) / nn.total)
        |          * (1 - (g.cum + (g.cw + 1.0) / 2) / nn.total) / 100)
        |      THEN g.om ELSE list_append(g.om, g.cm) END,
        |    CASE WHEN g.cw + 1.0 <= greatest(CAST(1.0 AS DOUBLE),
        |        4.0 * nn.total * ((g.cum + (g.cw + 1.0) / 2) / nn.total)
        |          * (1 - (g.cum + (g.cw + 1.0) / 2) / nn.total) / 100)
        |      THEN g.ow ELSE list_append(g.ow, g.cw) END
        |  FROM g JOIN srt s ON s.i = g.i + 1 CROSS JOIN nn),
        |fin AS (SELECT list_append(om, cm) AS om, list_append(ow, cw) AS ow
        |  FROM g CROSS JOIN nn WHERE g.i = nn.n),
        |cl AS (SELECT u.m, u.w, u.j,
        |    sum(u.w) OVER (ORDER BY u.j ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - u.w / 2 AS mid
        |  FROM (SELECT unnest(om) AS m, unnest(ow) AS w,
        |          generate_subscripts(om, 1) AS j FROM fin) u),
        |tot AS (SELECT sum(w) AS tw, count(*) AS nc FROM cl),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.25), (0.5), (0.9), (0.99)) t(q)),
        |est AS (
        |  SELECT qs.q,
        |    CASE
        |      WHEN qs.q * tot.tw <= (SELECT min(mid) FROM cl) THEN (SELECT m FROM cl ORDER BY j LIMIT 1)
        |      WHEN qs.q * tot.tw >= (SELECT max(mid) FROM cl) THEN (SELECT m FROM cl ORDER BY j DESC LIMIT 1)
        |      ELSE (
        |        SELECT lo.m + (qs.q * tot.tw - lo.mid) / (hi.mid - lo.mid) * (hi.m - lo.m)
        |        FROM (SELECT m, mid FROM cl WHERE mid >= qs.q * tot.tw ORDER BY j LIMIT 1) hi
        |        JOIN (SELECT m, mid FROM cl WHERE mid < qs.q * tot.tw ORDER BY j DESC LIMIT 1) lo ON true)
        |    END AS est
        |  FROM qs CROSS JOIN tot)
        |SELECT (SELECT n FROM nn) AS n, (SELECT nc FROM tot) AS n_centroids,
        |  (SELECT string_agg(CAST(CAST(round(m * 10000) AS BIGINT) AS VARCHAR) || ':' ||
        |      CAST(CAST(w AS BIGINT) AS VARCHAR), ',' ORDER BY j) FROM cl) AS centroids,
        |  round(max(CASE WHEN q = 0.25 THEN est END), 4) AS p25,
        |  round(max(CASE WHEN q = 0.5 THEN est END), 4) AS p50,
        |  round(max(CASE WHEN q = 0.9 THEN est END), 4) AS p90,
        |  round(max(CASE WHEN q = 0.99 THEN est END), 4) AS p99
        |FROM est""".stripMargin,
    // Brute-force replay of i1b: md5-derived registers (idx = low 8
    // bits, rho = 57 - bitlen of the upper 56 bits via exact 2^p
    // threshold joins), Z folded in register-index order, both
    // estimator branches.
    "i1b_hll_verdict" ->
      """WITH h AS (SELECT md5_number_upper('hll:' || CAST(user_id AS VARCHAR)) AS hv
        |  FROM events WHERE user_id IS NOT NULL AND event_id < 100000),
        |parts AS (SELECT CAST(hv % 256 AS BIGINT) AS idx, hv >> 8 AS w FROM h),
        |bl AS (SELECT idx, w,
        |    (SELECT count(*) FROM range(56) t(p)
        |     WHERE w >= (CAST(1 AS UBIGINT) << p)) AS bitlen FROM parts),
        |rho AS (SELECT idx, max(57 - bitlen) AS r FROM bl GROUP BY idx),
        |regs AS (SELECT ri.i AS idx, coalesce(rh.r, 0) AS r
        |  FROM range(256) ri(i) LEFT JOIN rho rh ON rh.idx = ri.i),
        |zl AS (SELECT list(r ORDER BY idx) AS rs FROM regs),
        |fin AS (SELECT
        |    CAST(len(list_filter(rs, x -> x = 0)) AS BIGINT) AS v_zeros,
        |    list_sum(list_transform(rs, x -> pow(2.0, -CAST(x AS DOUBLE)))) AS z
        |  FROM zl),
        |ex AS (SELECT count(DISTINCT user_id) AS exact_users FROM events
        |  WHERE user_id IS NOT NULL AND event_id < 100000)
        |SELECT f.v_zeros, round(f.z, 6) AS z6,
        |  round((0.7213 / (1 + 1.079 / 256.0)) * 65536.0 / f.z, 4) AS est_raw,
        |  round(CASE WHEN (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 / f.z <= 640.0
        |        AND f.v_zeros > 0
        |      THEN 256.0 * ln(256.0 / CAST(f.v_zeros AS DOUBLE))
        |      ELSE (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 / f.z END, 2) AS est,
        |  e.exact_users
        |FROM fin f CROSS JOIN ex e""".stripMargin,
    "d24_resample" ->
      """WITH b AS (SELECT l_returnflag, CAST(floor(l_quantity / 10) AS INT) AS band,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS s
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  array_to_string(list(CAST(band AS VARCHAR) || ':' || s ORDER BY band), ',') AS resampled
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "d8b_topk_weighted" ->
      """SELECT o_custkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS weight
        |FROM orders GROUP BY 1
        |ORDER BY sum(CAST(o_totalprice AS DECIMAL(12,2))) DESC, o_custkey LIMIT 5""".stripMargin,
    "d25_welch_ttest" ->
      """WITH s AS (SELECT
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE) AS n1,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) FILTER (WHERE event_type = 'click') AS VARCHAR) AS DOUBLE) AS sx1,
        |    CAST(CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) AS DECIMAL(24,4))) FILTER (WHERE event_type = 'click') AS VARCHAR) AS DOUBLE) AS sxx1,
        |    CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE) AS n2,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) FILTER (WHERE event_type = 'error') AS VARCHAR) AS DOUBLE) AS sx2,
        |    CAST(CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) AS DECIMAL(24,4))) FILTER (WHERE event_type = 'error') AS VARCHAR) AS DOUBLE) AS sxx2
        |  FROM events WHERE event_type IN ('click', 'error'))
        |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_error,
        |  round((sx1 / n1 - sx2 / n2) /
        |    sqrt((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 +
        |         (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2), 4) AS t_stat,
        |  round(((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2)
        |      * ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2) /
        |    ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 * ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1) / (n1 - 1)
        |     + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2 * ((sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2) / (n2 - 1)), 2) AS dof
        |FROM s""".stripMargin,
    "d34_mann_whitney" ->
      """WITH byval AS (
        |  SELECT CAST(value AS DECIMAL(12,2)) AS v,
        |    count(*) FILTER (WHERE event_type = 'click') AS n1v,
        |    count(*) FILTER (WHERE event_type = 'error') AS n2v
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1),
        |r AS (
        |  SELECT n1v, n2v, n1v + n2v AS cnt,
        |    COALESCE(CAST(sum(n1v + n2v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM byval),
        |s AS (
        |  SELECT CAST(sum(n1v) AS BIGINT) AS n1, CAST(sum(n2v) AS BIGINT) AS n2,
        |    sum(CAST(n1v AS DECIMAL(38,0)) * CAST(2 * off + cnt + 1 AS DECIMAL(38,0))) AS r1x2,
        |    sum(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)) - CAST(cnt AS DECIMAL(38,0))) AS tie
        |  FROM r)
        |SELECT n1 AS n_click, n2 AS n_error,
        |  round((CAST(CAST(r1x2 AS VARCHAR) AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2, 4) AS u1,
        |  round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) -
        |    (CAST(CAST(r1x2 AS VARCHAR) AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2, 4) AS u2,
        |  round(((CAST(CAST(r1x2 AS VARCHAR) AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2) /
        |    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12 *
        |      (((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1) -
        |       CAST(CAST(tie AS VARCHAR) AS DOUBLE) /
        |         ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1)))), 4) AS z_stat
        |FROM s""".stripMargin,
    "d35_ks_test" ->
      """WITH byval AS (
        |  SELECT CAST(value AS DECIMAL(12,2)) AS v,
        |    count(*) FILTER (WHERE event_type = 'click') AS n1v,
        |    count(*) FILTER (WHERE event_type = 'error') AS n2v
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1),
        |c AS (
        |  SELECT
        |    CAST(sum(n1v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
        |    CAST(sum(n2v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2,
        |    CAST(sum(n1v) OVER () AS BIGINT) AS n1t,
        |    CAST(sum(n2v) OVER () AS BIGINT) AS n2t
        |  FROM byval),
        |s AS (
        |  SELECT max(abs(CAST(c1 AS DECIMAL(38,0)) * CAST(n2t AS DECIMAL(38,0)) -
        |      CAST(c2 AS DECIMAL(38,0)) * CAST(n1t AS DECIMAL(38,0)))) AS dnum,
        |    max(n1t) AS n1, max(n2t) AS n2
        |  FROM c)
        |SELECT n1 AS n_click, n2 AS n_error,
        |  CAST(CAST(dnum AS VARCHAR) AS DOUBLE) AS d_num,
        |  round(CAST(CAST(dnum AS VARCHAR) AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
        |  round(CAST(CAST(dnum AS VARCHAR) AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) *
        |    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 4) AS ks_z
        |FROM s""".stripMargin,
    "d36_spearman" ->
      """WITH r AS (
        |  SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y
        |  FROM lineitem),
        |u AS (
        |  SELECT
        |    CAST(2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1 AS DECIMAL(19,0)) AS ux,
        |    CAST(2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1 AS DECIMAL(19,0)) AS uy
        |  FROM r),
        |s AS (
        |  SELECT count(*) AS n,
        |    CAST(CAST(sum(ux) AS VARCHAR) AS DOUBLE) AS su,
        |    CAST(CAST(sum(uy) AS VARCHAR) AS DOUBLE) AS sv,
        |    CAST(CAST(sum(ux * ux) AS VARCHAR) AS DOUBLE) AS suu,
        |    CAST(CAST(sum(uy * uy) AS VARCHAR) AS DOUBLE) AS svv,
        |    CAST(CAST(sum(ux * uy) AS VARCHAR) AS DOUBLE) AS suv
        |  FROM u)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * suv - su * sv) /
        |    (sqrt(CAST(n AS DOUBLE) * suu - su * su) * sqrt(CAST(n AS DOUBLE) * svv - sv * sv)), 6) AS rho
        |FROM s""".stripMargin,
    "d22_array_combinators" ->
      """WITH t AS (SELECT p_brand, p_size,
        |    list_transform(string_split(p_name, ' '), w -> CAST(length(w) AS INT)) AS lens
        |  FROM part)
        |SELECT p_brand,
        |  CAST(sum(list_sum(lens)) AS BIGINT) AS sum_array,
        |  CAST(min(list_min(lens)) AS INT) AS min_array,
        |  CAST(max(list_max(lens)) AS INT) AS max_array,
        |  CAST(sum(DISTINCT p_size) AS BIGINT) AS sum_distinct_size,
        |  count(*) AS n
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "d19_entropy" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy,
        |  CAST(sum(c) AS BIGINT) AS n
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "d20_delta_sum" ->
      """WITH d AS (SELECT user_id,
        |    value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS d
        |  FROM events)
        |SELECT user_id,
        |  round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 4) AS delta_sum,
        |  count(*) AS n
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "d21_sum_foreach" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS i,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS v
        |  FROM embeddings),
        |s AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv FROM e GROUP BY 1, 2)
        |SELECT label,
        |  array_to_string(list(sv ORDER BY i), ',') AS vsum_csv,
        |  (SELECT count(*) FROM embeddings x WHERE x.label = s.label) AS n
        |FROM s GROUP BY label ORDER BY label""".stripMargin,
    "d18_weighted_quantile" ->
      """WITH bv AS (SELECT l_returnflag, l_quantity AS v,
        |    CAST(sum(l_linenumber) AS BIGINT) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |rk AS (SELECT l_returnflag, v,
        |    CAST(sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |    CAST(sum(wsum) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        |  FROM bv)
        |SELECT m.l_returnflag, m.wmedian, p.wp90 FROM
        |  (SELECT l_returnflag, min(v) AS wmedian FROM rk WHERE cw * 2 >= tw GROUP BY 1) m
        |  JOIN (SELECT l_returnflag, min(v) AS wp90 FROM rk WHERE cw * 10 >= tw * 9 GROUP BY 1) p
        |  ON m.l_returnflag = p.l_returnflag
        |ORDER BY m.l_returnflag""".stripMargin,
    "d1_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "d2_min_max_avg" ->
      """SELECT p_brand, min(p_size) AS min_size, max(p_size) AS max_size,
        |  min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
        |  CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
        |  count(*) AS n
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "d3_agg_if" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS VARCHAR) AS DOUBLE) AS sum_urgent,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "d4_uniq_exact" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "d6_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "d7_argmax" ->
      """SELECT s_nationkey, arg_max(s_name, s_acctbal) AS richest,
        |  arg_min(s_name, s_acctbal) AS poorest, count(*) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "d8_topk" ->
      """SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, p_brand ASC LIMIT 10""".stripMargin,
    "d9_group_array" ->
      """SELECT n_regionkey, nations, k2, uniq_prios FROM
        |(SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        | FROM nation GROUP BY n_regionkey) a
        |CROSS JOIN
        |(SELECT o_orderstatus AS k2, string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS uniq_prios
        | FROM orders GROUP BY o_orderstatus) b
        |ORDER BY n_regionkey, k2""".stripMargin,
    "d10_summap" ->
      """SELECT string_agg(kv, ',' ORDER BY kv) AS summap FROM
        |(SELECT event_type || ':' || CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS kv
        | FROM events GROUP BY event_type)""".stripMargin,
    "i8b_theta_exact" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events
        |           WHERE user_id < 3000)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_overlap
        |FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "i8_theta_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_exact_overlap, true AS est_within_10pct
        |FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d32_agg_state_storage" ->
      """SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_exact,
        |  true AS state_merge_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "d33_uniq_upto" ->
      """SELECT l_returnflag,
        |  least(count(DISTINCT l_suppkey), 11) AS uniq_upto_10,
        |  least(count(DISTINCT l_linestatus), 11) AS uniq_upto_10_small
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "d31_cramers_v" ->
      """WITH cells AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT c,
        |    CAST(sum(c) OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS rt,
        |    CAST(sum(c) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS ct,
        |    CAST(sum(c) OVER () AS DOUBLE) AS n,
        |    o_orderstatus, o_orderpriority
        |  FROM cells),
        |chi AS (SELECT
        |    sum((CAST(c AS DOUBLE) - rt * ct / n) * (CAST(c AS DOUBLE) - rt * ct / n) / (rt * ct / n)) AS chi2,
        |    CAST(max(n) AS BIGINT) AS n,
        |    count(DISTINCT o_orderstatus) AS r,
        |    count(DISTINCT o_orderpriority) AS cc
        |  FROM m)
        |SELECT round(chi2, 6) AS chi2, n,
        |  round(sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r - 1, cc - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM chi""".stripMargin,
    "i4b_equiheight_histogram" ->
      """WITH b AS (SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT CAST(bucket AS INT) AS bucket, count(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "d27_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "d26_minmax_map" ->
      """SELECT string_agg(kvn, ',' ORDER BY kvn) AS minmap,
        |  string_agg(kvx, ',' ORDER BY kvx) AS maxmap FROM
        |(SELECT event_type || ':' || CAST(min(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS kvn,
        |   event_type || ':' || CAST(max(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS kvx
        | FROM events GROUP BY event_type)""".stripMargin,
    "d11_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    avg(l_quantity) AS e1, avg(l_quantity*l_quantity) AS e2,
        |    avg(l_quantity*l_quantity*l_quantity) AS e3,
        |    avg(l_quantity*l_quantity*l_quantity*l_quantity) AS e4,
        |    round(stddev_samp(l_quantity), 4) AS sd_qty,
        |    round(var_pop(l_quantity), 4) AS var_qty,
        |    round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |    round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, sd_qty, var_qty, corr_qp, covar_qp,
        |  round((e3 - 3*e1*e2 + 2*e1*e1*e1) / pow(e2 - e1*e1, 1.5), 4) AS skew_qty,
        |  round((e4 - 4*e1*e3 + 6*e1*e1*e2 - 3*e1*e1*e1*e1) / pow(e2 - e1*e1, 2) - 3, 4) AS kurt_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "d13_any_deterministic" ->
      """SELECT o_orderstatus, arg_min(o_orderpriority, o_orderkey) AS any_prio,
        |  arg_max(o_orderpriority, o_orderkey) AS anylast_prio
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "d14_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio""".stripMargin,
    "d14_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio""".stripMargin,
    "d14_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, prio""".stripMargin,
    "d15_with_totals" ->
      """SELECT coalesce(o_orderstatus, 'TOTALS') AS status, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus) ORDER BY status""".stripMargin,
    "d15b_with_totals_sql" ->
      """SELECT coalesce(o_orderstatus, 'TOTALS') AS status, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ()) ORDER BY status""".stripMargin,
    "d16_having" ->
      """SELECT o_custkey, count(*) AS n FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin,
    "d17_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "i4_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)
}
