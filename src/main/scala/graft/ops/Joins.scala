package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Join surface (SURVEY §2.C). The reference's engine offers hash /
  * partial-merge / direct(dictionary) / cross / ASOF joins with
  * ANY/ALL strictness and GLOBAL distribution; Spark-native mapping is
  * one `join` API whose physical strategy (broadcast-hash, shuffled
  * hash, sort-merge, nested-loop) Catalyst+AQE pick from stats.
  *
  * Scale notes (100 TB): dimension sides (region/nation/part subsets)
  * are explicitly `broadcast()` so fact tables never shuffle for them
  * — the Spark-native form of the reference's dictionary/direct join
  * (reference `Dockerfile:231`) and GLOBAL JOIN. Fact-fact joins shuffle
  * on the join key and AQE handles skew at runtime.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  /** C1: INNER equi join, fact⋈dim, then aggregate. */
  private def c1Inner(spark: SparkSession, dir: String): DataFrame = {
    val o = Engine.t(spark, dir, "orders")
    val c = Engine.t(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(CH.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** C2: LEFT OUTER — unmatched left rows keep null right side. */
  private def c2Left(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val big = Engine.t(spark, dir, "orders").filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_big"))
      .orderBy("c_custkey")
  }

  /** C2: RIGHT OUTER (mirror). */
  private def c2Right(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val big = Engine.t(spark, dir, "orders").filter(col("o_totalprice") > 450000)
    big.join(c, big("o_custkey") === c("c_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_big"))
      .orderBy("c_custkey")
  }

  /** C2: FULL OUTER over two differently-filtered per-nation rollups so
    * both sides contribute unmatched keys. */
  private def c2Full(spark: SparkSession, dir: String): DataFrame = {
    val s = Engine.t(spark, dir, "supplier").filter(col("s_acctbal") > 8000)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_sup"))
    val c = Engine.t(spark, dir, "customer").filter(col("c_acctbal") > 9000)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    s.join(c, s("s_nationkey") === c("c_nationkey"), "full")
      .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        col("n_sup"), col("n_cust"))
      .orderBy("nationkey")
  }

  /** C3: LEFT SEMI — customers with at least one order. */
  private def c3Semi(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val o = Engine.t(spark, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** C3: LEFT ANTI — customers with no orders. */
  private def c3Anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val o = Engine.t(spark, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** C4: CROSS JOIN of two tiny dims. */
  private def c4Cross(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "region").crossJoin(Engine.t(spark, dir, "nation"))
      .select("r_name", "n_name").orderBy("r_name", "n_name")

  /** C5: theta (inequality) join on top of an equi key. */
  /** C5: theta join (equi-key + inequality), declared as the per-key
    * PAIR COUNT — which a real theta join materializes as O(n·m) rows
    * per key (the sf10 rehearsal enumerated ~6×10⁹ pairs for 40 s).
    * Same resolution as c6's ASOF (VERDICT r7 #1): join-free rank
    * sweep. Suppliers and customers union into one per-nation stream
    * ordered by acctbal with suppliers FIRST at ties (strict `>` must
    * not count equal balances); a running sum of the customer flag
    * over [unbounded, -1] gives each supplier its
    * customers-strictly-below count in one pass, and the per-nation
    * total is the pair count. One shuffle on nationkey, O(n log n),
    * no pair ever materializes. Nations with zero qualifying pairs
    * produce no row (inner-join semantics). Parallelism is bounded by
    * the key cardinality (25 nations) — at cluster scale a two-pass
    * range-salted variant removes that bound; here the per-key stream
    * is the bottleneck-free shape. DuckDB's oracle still runs the
    * literal theta join. */
  private def c5Theta(spark: SparkSession, dir: String): DataFrame = {
    val s = Engine.t(spark, dir, "supplier")
      .select(col("s_nationkey").as("nk"), col("s_acctbal").as("bal"), lit(0).as("is_c"))
    val c = Engine.t(spark, dir, "customer")
      .select(col("c_nationkey").as("nk"), col("c_acctbal").as("bal"), lit(1).as("is_c"))
    val w = Window.partitionBy("nk").orderBy(col("bal").asc, col("is_c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    s.unionAll(c)
      .withColumn("n_below", coalesce(sum("is_c").over(w), lit(0L)))
      .filter(col("is_c") === 0)
      .groupBy(col("nk").as("s_nationkey"))
      .agg(sum("n_below").as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy("s_nationkey")
  }

  /** C6: ASOF JOIN — for each purchase event, the latest click by the
    * same user at or before the purchase (ties break to the larger
    * click id). No native Spark join type: rewritten JOIN-FREE as a
    * union + carry-forward window. Clicks (pre-deduped to max
    * event_id per (user, ts) — DuckDB's native ASOF picks an
    * implementation-defined row among tied timestamps, so the
    * tie-break must be explicit on BOTH engines, ADVICE r2) and
    * purchases union into one per-user stream ordered by (ts, kind)
    * with clicks sorting before purchases at equal ts (ASOF `>=`
    * includes equality); `last(click_id) IGNORE NULLS` over
    * rows-unbounded-preceding carries the latest click forward, and
    * only purchase rows with a match survive (inner ASOF). Each event
    * is touched exactly once — no (purchase × preceding-click) pair
    * ever materializes, unlike the previous equi+range join whose
    * intermediate was O(clicks·purchases) per skewed user (VERDICT r7
    * #1). One shuffle on user_id; window state is one value. DuckDB's
    * native ASOF JOIN (>= default) is the oracle. */
  private def c6Asof(spark: SparkSession, dir: String): DataFrame = {
    val e = Engine.events(spark, dir)
    val k = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("c_id"))
      .select(col("user_id"), col("ts"), col("c_id"),
        lit(null).cast("long").as("p_id"), lit(0).as("kind"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("c_id"),
        col("event_id").as("p_id"), lit(1).as("kind"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    k.unionByName(p)
      .withColumn("click_id", last(col("c_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("click_id").isNotNull)
      .select(col("p_id"), col("user_id"), col("click_id"))
      .orderBy("p_id")
  }

  /** C7: ANY-strictness join — dedupe the build side to its first row
    * per key (deterministic: earliest o_orderdate, then o_orderkey). */
  private def c7Any(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val firstOrder = Engine.t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"))
    c.join(firstOrder, c("c_custkey") === firstOrder("o_custkey"), "inner")
      .select("c_custkey", "c_name", "first_orderkey")
      .orderBy("c_custkey")
  }

  /** C8: direct/dictionary join — broadcast the dim (reference
    * `Dockerfile:231` external dictionaries). Also covers A10 dictGet. */
  private def c8BroadcastDict(spark: SparkSession, dir: String): DataFrame = {
    val l = Engine.t(spark, dir, "lineitem")
    val p = Engine.t(spark, dir, "part")
    val price = CH.dec(col("l_extendedprice"))
    val oneMinusDisc = CH.dec(lit(1) - CH.dec(col("l_discount"), 8, 4), 8, 4)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(price * oneMinusDisc).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** C9: GLOBAL JOIN ≡ ship the build side everywhere = broadcast().
    * Two chained broadcast dims, zero fact shuffles before the agg. */
  private def c9Global(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
    val n = Engine.t(spark, dir, "nation")
    val r = Engine.t(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"),
        (sum(CH.dec(col("c_acctbal"))).cast("double") / count(lit(1)).cast("double")).as("avg_bal"))
      .orderBy("r_name")
  }

  /** A10: dictGet(dim, attr, key) ≡ broadcast-join lookup projecting one
    * attribute. */
  private def a10DictGet(spark: SparkSession, dir: String): DataFrame = {
    val n = Engine.t(spark, dir, "nation")
    val r = Engine.t(spark, dir, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name").as("region_name"))
      .orderBy("n_nationkey")
  }

  /** C11 (beyond-survey scale demo): salted skew join. `documents.lang`
    * is a pathologically skewed join key (a handful of values over the
    * whole corpus), so an unsalted shuffle join lands each language on
    * ONE reducer. The classic mitigation when AQE's skew-join split
    * isn't available (e.g. the skewed side feeds a co-partitioned
    * downstream op): replicate the dim across S salt values and spread
    * the fact side by `hash(pk) mod S`, so each hot key fans out over
    * S reducers. The oracle proves result equivalence with the
    * unsalted join. */
  private def c11SaltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = 8
    val docs = Engine.t(spark, dir, "documents")
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(s.toLong)).cast("int"))
    val langDim = Engine.t(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("lang_total"))
    val saltedDim = langDim
      .withColumn("salt", explode(sequence(lit(0), lit(s - 1))))
    docs.join(saltedDim, Seq("lang", "salt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), max(col("lang_total")).as("lang_total"))
      .orderBy("lang")
  }

  /** C12: PASTE JOIN — the reference's positional join: zip two result
    * sets row-by-row, truncating to the shorter. Position only exists
    * relative to a TOTAL ORDER, so both sides take a row_number over
    * their declared ordering and equi-join on it. Declared over
    * dimension-sized inputs (positional zip of 100 TB streams is
    * semantically order-coupled and belongs to dims/exports; for big
    * already-sorted data the rank can come from a two-level
    * per-partition count + offset instead of one global window). */
  private def c12PasteJoin(spark: SparkSession, dir: String): DataFrame = {
    val wa = Window.orderBy("n_nationkey")
    val wb = Window.orderBy("c_custkey")
    val a = Engine.t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), row_number().over(wa).as("rn"))
    val b = Engine.t(spark, dir, "customer")
      .orderBy("c_custkey").limit(25)
      .select(col("c_custkey"), col("c_name"), row_number().over(wb).as("rn"))
    a.join(b, Seq("rn"))
      .select(col("rn"), col("n_nationkey"), col("n_name"), col("c_custkey"), col("c_name"))
      .orderBy("rn")
  }

  /** C13: null-safe equi join (CH joins match NULL keys when
    * `join_use_nulls`-style semantics are asked for; ANSI spells it
    * IS NOT DISTINCT FROM, Spark `<=>`). `<=>` is a first-class
    * equi-join key for Spark's hash joins — no fallback to a
    * theta-join nested loop — so the shape shuffles/broadcasts exactly
    * like c1.
    *
    * Scale shape: null-safe semantics make NULL a single join-key
    * VALUE, so the NULL block is the textbook hot key — here 1/7 of
    * EACH side, and materializing the block is quadratic (the sf10
    * rehearsal measured 81 s enumerating ~3×10⁹ null×null pairs). The
    * declared per-key stats don't need the enumeration: the supplier
    * side pre-aggregates to one row per key and the pair count is the
    * product `count_c(k) × count_s(k)` — the join output is then
    * customer-sized (linear) while `<=>` remains the join condition
    * with NULLs live on both sides. */
  private def c13NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Engine.t(spark, dir, "customer")
      .select(col("c_custkey"), nullif(pmod(col("c_nationkey"), lit(7)), lit(3)).as("k"))
    val s = Engine.t(spark, dir, "supplier")
      .select(col("s_suppkey"), nullif(pmod(col("s_nationkey"), lit(7)), lit(3)).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_s"), count_distinct(col("s_suppkey")).as("n_supp_k"))
    c.join(broadcast(s), c("k") <=> s("k"))
      .groupBy(c("k").as("key"))
      .agg(sum(col("n_s")).as("n_pairs"),
        max(col("n_supp_k")).as("n_supp"))
      .orderBy(asc_nulls_first("key"))
  }

  /** C14: join-algorithm selection — the reference's `join_algorithm`
    * setting (hash / partial_merge / grace_hash) maps onto Spark's
    * physical join hints: SHUFFLE_HASH (build a hash table per
    * partition), MERGE (sort-merge, the spill-safe grace path),
    * BROADCAST. The ALGORITHM is a physical choice and must never
    * change the ANSWER — the declared op runs the same join under all
    * three hints and diffs them pairwise (0 mismatches), with the
    * result itself oracle-checked; `PlanShapeSpec` asserts each hint
    * actually selects its operator. */
  def c14JoinWithHint(spark: SparkSession, dir: String, hint: String): DataFrame = {
    val o = Engine.t(spark, dir, "orders")
    val c = Engine.t(spark, dir, "customer").hint(hint)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(CH.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("c_mktsegment")
  }

  private def c14JoinAlgorithms(spark: SparkSession, dir: String): DataFrame = {
    val hash = c14JoinWithHint(spark, dir, "shuffle_hash")
    val merge = c14JoinWithHint(spark, dir, "merge")
    val bcast = c14JoinWithHint(spark, dir, "broadcast")
    // r20 (guide §1.2 — don't compute things twice): the pairwise
    // `exceptAll(...).count()` form ran FOUR separate actions, each
    // re-executing two of the hinted joins — 8 join executions for the
    // comparison alone. For same-size multisets the pairwise diff count
    // is Σ_rows |count_a − count_b|, so ONE tagged union + one rollup
    // computes the identical number with each hinted join executed
    // exactly once (hash.exceptAll(merge).count() = Σ max(ch−cm, 0)
    // and its mirror sum to Σ|ch−cm|).
    val tagged = hash.withColumn("algo", lit("h"))
      .unionAll(merge.withColumn("algo", lit("m")))
      .unionAll(bcast.withColumn("algo", lit("b")))
    val diffs = tagged.groupBy("c_mktsegment", "n", "sum_price")
      .agg(
        CH.countIf(col("algo") === "h").as("ch"),
        CH.countIf(col("algo") === "m").as("cm"),
        CH.countIf(col("algo") === "b").as("cb"))
      .agg(coalesce(sum(abs(col("ch") - col("cm")) + abs(col("ch") - col("cb"))),
        lit(0L)).as("d"))
      .first().getLong(0)
    hash.withColumn("algo_mismatches", lit(diffs))
  }

  /** C15: banded range join — the interval-join scale pattern: a
    * BETWEEN join would plan as a nested loop (no equi key), so each
    * interval EXPLODES into the 1-hour bands it covers and each event
    * carries its single band; the join becomes a hash equi-join on
    * band with the BETWEEN as a residual filter. Band fan-out is
    * ⌈len/band⌉+1 per interval (≤3 here: intervals up to 5400 s are
    * unaligned to the 3600 s grid) — the exchange carries bands,
    * never the cross product. Left join keeps empty intervals. */
  private def c15BandedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val baseS = 1704067200L // 2024-01-01T00:00:00Z
    val iv = spark.range(0, 50).select(
      col("id").as("interval_id"),
      (lit(baseS) + col("id") * 13600).as("s"),
      (lit(baseS) + col("id") * 13600 + (col("id") % 3 + 1) * 1800).as("e"))
    val ivBanded = iv.withColumn("band",
      explode(sequence(CH.intDiv(col("s"), lit(3600L)), CH.intDiv(col("e"), lit(3600L)))))
    val ev = Engine.events(spark, dir)
      .select(CH.intDiv(unix_micros(col("ts")), lit(1000000L)).as("ts_s"))
      .withColumn("band", CH.intDiv(col("ts_s"), lit(3600L)))
    val matched = ivBanded.join(ev, Seq("band"))
      .filter(col("ts_s").between(col("s"), col("e")))
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n"))
    iv.join(matched, Seq("interval_id"), "left")
      .select(col("interval_id"), coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("interval_id")
  }

  val queries: Map[String, Q] = Map(
    "c15_banded_range_join" -> (c15BandedRangeJoin _),
    "c14_join_algorithms" -> (c14JoinAlgorithms _),
    "c13_null_safe_join" -> (c13NullSafeJoin _),
    "c12_paste_join" -> (c12PasteJoin _),
    "c11_salted_skew_join" -> (c11SaltedSkewJoin _),
    "c1_inner_join" -> (c1Inner _),
    "c2_left_join" -> (c2Left _),
    "c2_right_join" -> (c2Right _),
    "c2_full_outer" -> (c2Full _),
    "c3_semi_join" -> (c3Semi _),
    "c3_anti_join" -> (c3Anti _),
    "c4_cross_join" -> (c4Cross _),
    "c5_theta_join" -> (c5Theta _),
    "c6_asof_join" -> (c6Asof _),
    "c7_any_join" -> (c7Any _),
    "c8_broadcast_dict_join" -> (c8BroadcastDict _),
    "c9_global_join" -> (c9Global _),
    "a10_dict_lookup" -> (a10DictGet _))

  val oracles: Map[String, String] = Map(
    "c15_banded_range_join" ->
      """WITH iv AS (SELECT range AS interval_id,
        |    1704067200 + range * 13600 AS s,
        |    1704067200 + range * 13600 + (range % 3 + 1) * 1800 AS e
        |  FROM range(0, 50)),
        |ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
        |SELECT interval_id, CAST(count(ev.ts_s) AS BIGINT) AS n_events
        |FROM iv LEFT JOIN ev ON ev.ts_s BETWEEN iv.s AND iv.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c14_join_algorithms" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  CAST(0 AS BIGINT) AS algo_mismatches
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c13_null_safe_join" ->
      """WITH c AS (SELECT c_custkey, nullif(c_nationkey % 7, 3) AS k FROM customer),
        |s AS (SELECT s_suppkey, nullif(s_nationkey % 7, 3) AS k FROM supplier)
        |SELECT c.k AS key, count(*) AS n_pairs,
        |  count(DISTINCT s.s_suppkey) AS n_supp
        |FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "c12_paste_join" ->
      """WITH a AS (SELECT n_nationkey, n_name,
        |    CAST(row_number() OVER (ORDER BY n_nationkey) AS INT) AS rn FROM nation),
        |b AS (SELECT c_custkey, c_name,
        |    CAST(row_number() OVER (ORDER BY c_custkey) AS INT) AS rn
        |  FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 25))
        |SELECT a.rn, a.n_nationkey, a.n_name, b.c_custkey, b.c_name
        |FROM a JOIN b ON a.rn = b.rn ORDER BY a.rn""".stripMargin,
    // the salted join must produce exactly the unsalted join's result
    "c11_salted_skew_join" ->
      """SELECT lang, count(*) AS n_docs, count(*) AS lang_total
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "c1_inner_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "c2_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |  ON c_custkey = o.o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "c2_right_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o RIGHT JOIN customer
        |  ON o.o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "c2_full_outer" ->
      """SELECT coalesce(s.s_nationkey, c.c_nationkey) AS nationkey, n_sup, n_cust
        |FROM (SELECT s_nationkey, count(*) AS n_sup FROM supplier WHERE s_acctbal > 8000 GROUP BY s_nationkey) s
        |FULL OUTER JOIN (SELECT c_nationkey, count(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        |  ON s.s_nationkey = c.c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "c3_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "c3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "c4_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "c5_theta_join" ->
      """SELECT s_nationkey, count(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "c6_asof_join" ->
      """SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |           FROM events WHERE event_type = 'click' GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p_id""".stripMargin,
    "c7_any_join" ->
      """SELECT c_custkey, c_name, first_orderkey
        |FROM customer JOIN (
        |  SELECT o_custkey, o_orderkey AS first_orderkey FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        |) o ON c_custkey = o.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "c8_broadcast_dict_join" ->
      """SELECT p_brand,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "c9_global_join" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "a10_dict_lookup" ->
      """SELECT n_nationkey, n_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin)
}
