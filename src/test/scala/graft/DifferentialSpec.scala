package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.PlanGen

/** Randomized differential testing over the relational surface
  * (VERDICT r8 #2): every seed generates one plan rendered three ways
  * (DataFrame API, Spark SQL, DuckDB SQL — `PlanGen`). Here the first
  * two renderings run against sf0.001 and must agree row-for-row —
  * catching API/SQL translation drift, optimizer edge cases, and the
  * pitfall classes (null sorts, tie order, join-filter placement) that
  * 224 curated queries can miss. The third rendering is exercised
  * cross-engine by the driver through the frozen `fz*` rows declared
  * in [[graft.fuzz.Differential]].
  *
  * On failure the seed, shape, and both SQL texts print — rerun with
  * `PlanGen.generate(seed)` to reproduce.
  */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("200 random plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    var shapes = Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 200L) {
      val gen = PlanGen.generate(seed)
      shapes += gen.shape -> (shapes(gen.shape) + 1)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    // every shape family must actually occur in the sweep
    assert(shapes.keySet == Set("agg", "window", "setop", "sortlimit", "semi", "anti"),
      s"shape coverage hole: $shapes")
  }

  test("50 composite window→agg plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 50L) {
      val gen = PlanGen.generateComposite(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 join-surface plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    var shapes = Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateJoin(seed)
      shapes += gen.shape -> (shapes(gen.shape) + 1)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("aggjoin_inner", "aggjoin_left", "aggjoin_full",
      "rightagg", "joinwindow").subsetOf(shapes.keySet),
      s"join shape coverage hole: $shapes")
  }

  test("100 scalar-expression plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateScalar(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 ROWS-frame window plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    var shapes = Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateFrame(seed)
      shapes += gen.shape -> (shapes(gen.shape) + 1)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("frame_rsum", "frame_rmin", "frame_lag", "frame_lead")
      .subsetOf(shapes.keySet), s"frame shape coverage hole: $shapes")
  }

  test("100 RANGE-frame window plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateRangeFrame(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    // all four value-based frame functions must occur in the sweep
    assert(Set("rframe_rsum", "rframe_rmin", "rframe_rmax", "rframe_rcnt")
      .subsetOf(shapes.keySet), s"rframe shape coverage hole: $shapes")
  }

  test("100 extended-aggregate plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateAggFns(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 rollup/cube plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateRollup(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 correlated-subquery plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateSubq(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    // the SQL leg must exercise every subquery kind incl. both polarities
    assert(Set("subq_in", "subq_notin", "subq_theta", "subq_ntheta", "subq_scalar")
      .subsetOf(shapes.keySet), s"subq shape coverage hole: $shapes")
  }

  test("100 mixed-join 3-table chains: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateChain3(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(shapes.keySet.exists(_.startsWith("chain3_path")) &&
      shapes.keySet.exists(_.startsWith("chain3_star")), s"chain3 coverage hole: $shapes")
  }

  test("100 multi-DISTINCT aggregate plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateDistinct(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 GROUPING SETS plans: DataFrame groupingSets API equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateGroupingSets(seed)
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
  }

  test("100 explicit null-ordering plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateNullOrder(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("nullord_sort", "nullord_window").subsetOf(shapes.keySet),
      s"nullord shape coverage hole: $shapes")
  }

  test("100 ASOF-join plans: DataFrame window rewrite equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateAsof(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    // all four semantic corners (inner/left × ≥/>) must occur
    assert(Set("asof_inner_ge", "asof_inner_gt", "asof_left_ge", "asof_left_gt")
      .subsetOf(shapes.keySet), s"asof shape coverage hole: $shapes")
  }

  test("100 LIMIT BY plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateLimitBy(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("limitby_cat", "limitby_mod").subsetOf(shapes.keySet),
      s"limitby shape coverage hole: $shapes")
  }

  test("100 WITH FILL plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateWithFill(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("fill_zero", "fill_null").subsetOf(shapes.keySet),
      s"fill shape coverage hole: $shapes")
  }

  test("100 QUALIFY plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateQualify(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("qualify_rank", "qualify_cnt", "qualify_lag")
      .subsetOf(shapes.keySet), s"qualify shape coverage hole: $shapes")
    // a degenerate generator (thresholds that filter everything away)
    // would pass trivially on empty == empty; require a real majority
    // of seeds to exercise non-empty qualifying sets
    assert(nonEmpty >= 50, s"only $nonEmpty/100 qualify seeds non-empty")
  }

  test("100 distribution-window plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateDistWin(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("dist_ntile", "dist_prank", "dist_cume")
      .subsetOf(shapes.keySet), s"distwin shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 distwin seeds non-empty")
  }

  test("100 time-bucket plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateTimeBucket(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("tb_trunc", "tb_parts", "tb_dom")
      .subsetOf(shapes.keySet), s"timebucket shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 timebucket seeds non-empty")
  }

  test("100 array-aggregation plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateArrAgg(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("arr_prefix", "arr_distinct", "arr_nth")
      .subsetOf(shapes.keySet), s"arragg shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 arragg seeds non-empty")
  }

  test("100 PIVOT plans: RelationalGroupedDataset.pivot equals PIVOT-clause sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generatePivot(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("pivot_sum", "pivot_cnt").subsetOf(shapes.keySet),
      s"pivot shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 pivot seeds non-empty")
  }

  test("100 explode/unnest plans: DataFrame Generate equals LATERAL VIEW sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateExplode(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("expl_seq", "expl_split").subsetOf(shapes.keySet),
      s"explode shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 explode seeds non-empty")
  }

  test("100 date-arithmetic plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateDateArith(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("da_shift", "da_diff", "da_last").subsetOf(shapes.keySet),
      s"datearith shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 datearith seeds non-empty")
  }

  test("100 JOIN USING plans: usingColumns build equals USING-clause sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateUsing(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("using_inner", "using_left", "using_multi").subsetOf(shapes.keySet),
      s"using shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 using seeds non-empty")
  }

  test("100 FILTER-clause aggregate plans: CASE-folded build equals FILTER sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateFilterAgg(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("fa_grouped", "fa_global").subsetOf(shapes.keySet),
      s"filteragg shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 filteragg seeds non-empty")
  }

  test("100 ordered string-agg plans: sorted collect build equals listagg sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateStrAgg(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("sg_cat", "sg_int", "sg_distinct").subsetOf(shapes.keySet),
      s"stragg shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 stragg seeds non-empty")
  }

  test("100 VALUES inline-table plans: createDataFrame build equals VALUES sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateValues(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("vl_inner", "vl_left").subsetOf(shapes.keySet),
      s"values shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 values seeds non-empty")
  }

  test("100 SELECT-sugar plans: desugared build equals lateral-alias/ordinal sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateSugar(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("su_lateral", "su_ordinal").subsetOf(shapes.keySet),
      s"sugar shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 sugar seeds non-empty")
  }

  test("100 conditional-function plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateCondFn(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("cf_clamp", "cf_nullif", "cf_chain").subsetOf(shapes.keySet),
      s"condfn shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 condfn seeds non-empty")
  }

  test("100 ChSql-dialect plans: desugared build equals ChSql text rewrite (r17)") {
    // The chsql family's sparkSql is CH-dialect TEXT — not Spark-
    // parseable — so the differential runs it through the ChSql
    // pre-parse rewriter and pins rewriter(text) ≡ the independently
    // spelled DataFrame desugar, across random tables, predicates,
    // group spellings (category vs aliased modulus) and fill grids.
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateChSql(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaCh = rows(graft.ChSql.sql(spark, gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaCh,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} chsql rows=${viaCh.size}" +
          s"\n  chText: ${gen.sparkSql}\n  duckSql: ${gen.duckSql}")
    }
    assert(Set("ch_prewhere", "ch_limitby", "ch_fill").subsetOf(shapes.keySet),
      s"chsql shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 chsql seeds non-empty")
  }

  test("100 NESTED-ChSql plans: subquery PREWHERE rewrite equals the desugar (r18)") {
    // VERDICT r17 #6: PREWHERE inside subqueries — the scope-aware
    // scanner must merge each PREWHERE with its OWN clause's WHERE
    // (chn_both) or terminate at the subquery's closing parenthesis
    // (chn_solo), across random tables, predicates and groupings.
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateChNested(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaCh = rows(graft.ChSql.sql(spark, gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaCh,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} chsql rows=${viaCh.size}" +
          s"\n  chText: ${gen.sparkSql}\n  duckSql: ${gen.duckSql}")
    }
    assert(Set("chn_both", "chn_solo") == shapes.keySet.toSet,
      s"chnested shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 chnested seeds non-empty")
  }

  test("100 array-function plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateArrFn(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("ar_elem", "ar_contains", "ar_minmax", "ar_sortjoin")
      .subsetOf(shapes.keySet), s"arrfn shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 arrfn seeds non-empty")
  }

  test("100 UNPIVOT plans: Dataset.unpivot build equals UNPIVOT-clause sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateUnpivot(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("up_rollup", "up_incl", "up_row").subsetOf(shapes.keySet),
      s"unpivot shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 unpivot seeds non-empty")
  }

  test("100 LATERAL plans: Dataset.lateralJoin build equals LATERAL-clause sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateLateral(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("lt_agg", "lt_topn", "lt_left").subsetOf(shapes.keySet),
      s"lateral shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 lateral seeds non-empty")
  }

  test("100 set-operation plans: exceptAll/intersectAll build equals set-op sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateSetOp(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("so_prec", "so_exc", "so_int", "so_mix").subsetOf(shapes.keySet),
      s"setop shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 setop seeds non-empty")
  }

  test("100 IGNORE-NULLS window plans: ignoreNulls build equals postfix sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateIgnoreNulls(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("in_first", "in_last", "in_lag", "in_nth").subsetOf(shapes.keySet),
      s"ignul shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 ignul seeds non-empty")
  }

  test("100 TRY-arithmetic plans: try_* build equals try_* sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateTryArith(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("ta_mul", "ta_add", "ta_sub", "ta_div").subsetOf(shapes.keySet),
      s"tryar shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 tryar seeds non-empty")
  }

  test("100 storage-roundtrip plans: write->read build equals pure sql") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateStorage(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED (storage NOT invisible)" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("st_part", "st_csv", "st_app").subsetOf(shapes.keySet),
      s"storage shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 storage seeds non-empty")
  }

  test("100 map-function plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateMapFn(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("mp_get", "mp_card", "mp_keys", "mp_vals").subsetOf(shapes.keySet),
      s"mapfn shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 mapfn seeds non-empty")
  }

  test("100 string-function plans: DataFrame build equals spark.sql rendering") {
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateStrFn(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaSql = rows(spark.sql(gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaSql,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} sql rows=${viaSql.size}" +
          s"\n  sparkSql: ${gen.sparkSql}\n  duckSql:  ${gen.duckSql}")
    }
    assert(Set("sf_split", "sf_pad", "sf_rep", "sf_trans").subsetOf(shapes.keySet),
      s"strfn shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 strfn seeds non-empty")
  }

  test("frozen round-16 filteragg/stragg/values seeds: pinned literals match the search") {
    val fa = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.filterAggQuota, s => PlanGen.generateFilterAgg(s).shape)
    assert(fa.sorted == graft.fuzz.Differential.frozenFilterAggSeeds,
      s"generator moved the frozen filteragg seeds: search=$fa — re-pin AND rename fzfa* rows")
    val sg = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.strAggQuota, s => PlanGen.generateStrAgg(s).shape)
    assert(sg.sorted == graft.fuzz.Differential.frozenStrAggSeeds,
      s"generator moved the frozen stragg seeds: search=$sg — re-pin AND rename fzsg* rows")
    val vl = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.valuesQuota, s => PlanGen.generateValues(s).shape)
    assert(vl.sorted == graft.fuzz.Differential.frozenValuesSeeds,
      s"generator moved the frozen values seeds: search=$vl — re-pin AND rename fzvl* rows")
    val su = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.sugarQuota, s => PlanGen.generateSugar(s).shape)
    assert(su.sorted == graft.fuzz.Differential.frozenSugarSeeds,
      s"generator moved the frozen sugar seeds: search=$su — re-pin AND rename fzsu* rows")
    val cf = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.condFnQuota, s => PlanGen.generateCondFn(s).shape)
    assert(cf.sorted == graft.fuzz.Differential.frozenCondFnSeeds,
      s"generator moved the frozen condfn seeds: search=$cf — re-pin AND rename fzcf* rows")
    val ar = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.arrFnQuota, s => PlanGen.generateArrFn(s).shape)
    assert(ar.sorted == graft.fuzz.Differential.frozenArrFnSeeds,
      s"generator moved the frozen arrfn seeds: search=$ar — re-pin AND rename fzar* rows")
    val up = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.unpivotQuota, s => PlanGen.generateUnpivot(s).shape)
    assert(up.sorted == graft.fuzz.Differential.frozenUnpivotSeeds,
      s"generator moved the frozen unpivot seeds: search=$up — re-pin AND rename fzup* rows")
    val lt = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.lateralQuota, s => PlanGen.generateLateral(s).shape)
    assert(lt.sorted == graft.fuzz.Differential.frozenLateralSeeds,
      s"generator moved the frozen lateral seeds: search=$lt — re-pin AND rename fzlt* rows")
    val so = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.setOpQuota, s => PlanGen.generateSetOp(s).shape)
    assert(so.sorted == graft.fuzz.Differential.frozenSetOpSeeds,
      s"generator moved the frozen setop seeds: search=$so — re-pin AND rename fzso* rows")
    val in = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.ignulQuota, s => PlanGen.generateIgnoreNulls(s).shape)
    assert(in.sorted == graft.fuzz.Differential.frozenIgnulSeeds,
      s"generator moved the frozen ignul seeds: search=$in — re-pin AND rename fzin* rows")
    val ta = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.tryArithQuota, s => PlanGen.generateTryArith(s).shape)
    assert(ta.sorted == graft.fuzz.Differential.frozenTryArithSeeds,
      s"generator moved the frozen tryar seeds: search=$ta — re-pin AND rename fzta* rows")
    val st = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.storageQuota, s => PlanGen.generateStorage(s).shape)
    assert(st.sorted == graft.fuzz.Differential.frozenStorageSeeds,
      s"generator moved the frozen storage seeds: search=$st — re-pin AND rename fzst* rows")
    val mp = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.mapFnQuota, s => PlanGen.generateMapFn(s).shape)
    assert(mp.sorted == graft.fuzz.Differential.frozenMapFnSeeds,
      s"generator moved the frozen mapfn seeds: search=$mp — re-pin AND rename fzmp* rows")
    val sfn = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.strFnQuota, s => PlanGen.generateStrFn(s).shape)
    assert(sfn.sorted == graft.fuzz.Differential.frozenStrFnSeeds,
      s"generator moved the frozen strfn seeds: search=$sfn — re-pin AND rename fzsf* rows")
    val ch = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.chSqlQuota, s => PlanGen.generateChSql(s).shape)
    assert(ch.sorted == graft.fuzz.Differential.frozenChSqlSeeds,
      s"generator moved the frozen chsql seeds: search=$ch — re-pin AND rename fzch* rows")
    val chn = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.chNestedQuota, s => PlanGen.generateChNested(s).shape)
    assert(chn.sorted == graft.fuzz.Differential.frozenChNestedSeeds,
      s"generator moved the frozen chnested seeds: search=$chn — re-pin AND rename fzchn* rows")
    val chf = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.chFnQuota, s => PlanGen.generateChFns(s).shape)
    assert(chf.sorted == graft.fuzz.Differential.frozenChFnSeeds,
      s"generator moved the frozen chfn seeds: search=$chf — re-pin AND rename fzchf* rows")
    val chf2 = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.chFn2Quota, s => PlanGen.generateChFns2(s).shape)
    assert(chf2.sorted == graft.fuzz.Differential.frozenChFn2Seeds,
      s"generator moved the frozen chfn2 seeds: search=$chf2 — re-pin AND rename fzchf2x* rows")
  }

  test("60 CH-function-name-2 plans: r20 widening text equals the Spark desugar") {
    // VERDICT r19 next #5: the r20 ChNames widening (ISO calendar,
    // countDistinct spelling, format/countMatches/reverseUTF8/
    // appendTrailingCharIfAbsent) — CH-spelled text through ChSql must
    // equal an independently spelled Spark-function build.
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 60L) {
      val gen = PlanGen.generateChFns2(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaCh = rows(graft.ChSql.sql(spark, gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaCh,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} chsql rows=${viaCh.size}" +
          s"\n  chText: ${gen.sparkSql}\n  duckSql: ${gen.duckSql}")
    }
    assert(Set("chf2_cal", "chf2_str") == shapes.keySet.toSet,
      s"chfn2 shape coverage hole: $shapes")
    assert(nonEmpty >= 30, s"only $nonEmpty/60 chfn2 seeds non-empty")
  }

  test("100 CH-function-name plans: CH-spelled text equals the Spark desugar (r19)") {
    // VERDICT r18 next #1: the CH NAME surface (ChNames registrations
    // + the parametric-aggregate rewrite) — CH-spelled text through
    // ChSql must equal an independently spelled Spark-function build,
    // across tables, predicates, date extractors, parametric
    // quantiles, and the string family.
    Engine.registerAll(spark, sf)
    val shapes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nonEmpty = 0
    for (seed <- 1L to 100L) {
      val gen = PlanGen.generateChFns(seed)
      shapes(gen.shape) += 1
      val viaApi = rows(gen.build(spark, sf))
      val viaCh = rows(graft.ChSql.sql(spark, gen.sparkSql))
      if (viaApi.nonEmpty) nonEmpty += 1
      assert(viaApi == viaCh,
        s"\nseed=${gen.seed} shape=${gen.shape} DIVERGED" +
          s"\n  api rows=${viaApi.size} chsql rows=${viaCh.size}" +
          s"\n  chText: ${gen.sparkSql}\n  duckSql: ${gen.duckSql}")
    }
    assert(Set("chf_date", "chf_cond", "chf_agg", "chf_str") == shapes.keySet.toSet,
      s"chfn shape coverage hole: $shapes")
    assert(nonEmpty >= 50, s"only $nonEmpty/100 chfn seeds non-empty")
  }

  test("frozen round-15 pivot/explode seeds: pinned literals match the search") {
    // the ADVICE r14 pinning contract: the literals in Differential
    // must equal the first-seeds-that-fill search result, re-run here
    val pv = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.pivotQuota, s => PlanGen.generatePivot(s).shape)
    assert(pv.sorted == graft.fuzz.Differential.frozenPivotSeeds,
      s"generator moved the frozen pivot seeds: search=$pv — re-pin AND rename fzpv* rows")
    val ex = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.explodeQuota, s => PlanGen.generateExplode(s).shape)
    assert(ex.sorted == graft.fuzz.Differential.frozenExplodeSeeds,
      s"generator moved the frozen explode seeds: search=$ex — re-pin AND rename fzex* rows")
    val da = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.dateArithQuota, s => PlanGen.generateDateArith(s).shape)
    assert(da.sorted == graft.fuzz.Differential.frozenDateArithSeeds,
      s"generator moved the frozen datearith seeds: search=$da — re-pin AND rename fzda* rows")
    val us = graft.fuzz.Differential.searchQuota(
      graft.fuzz.Differential.usingQuota, s => PlanGen.generateUsing(s).shape)
    assert(us.sorted == graft.fuzz.Differential.frozenUsingSeeds,
      s"generator moved the frozen using seeds: search=$us — re-pin AND rename fzus* rows")
  }

  test("frozen fz* queries build and their SQL renderings stay stable") {
    // the driver's correctness gate replays these against DuckDB; this
    // test pins that each frozen seed still builds, returns rows, and
    // renders the same oracle SQL text as the declared oracle map
    for ((name, q) <- graft.fuzz.Differential.queries) {
      val out = q(spark, sf)
      assert(out.columns.nonEmpty, s"$name produced no columns")
      assert(graft.fuzz.Differential.oracles.contains(name), s"$name missing oracle")
    }
    assert(graft.fuzz.Differential.queries.keySet ==
      graft.fuzz.Differential.oracles.keySet)
  }

  test("frozen GROUPING SETS seeds: pinned literals match the selection-rule search") {
    // ADVICE r14: the seeds are now pinned literals in Differential;
    // this re-runs the round-13 selection rule (first seed WITH a
    // single-column mid set, first WITHOUT) so a generator tweak that
    // moves them fails HERE with the new values instead of silently
    // renaming the committed fzgs* correctness rows at class-load.
    val withMid = (1L to 10000L).find(graft.fuzz.Differential.gsetsHasMid)
    val withoutMid = (1L to 10000L).find(s => !graft.fuzz.Differential.gsetsHasMid(s))
    assert(withMid.isDefined && withoutMid.isDefined,
      "gsets generator no longer produces both mid-set shapes in seeds 1..10000")
    assert(Seq(withMid.get, withoutMid.get).distinct.sorted ==
      graft.fuzz.Differential.frozenGsetsSeeds,
      s"generator moved the frozen gsets seeds: first withMid=$withMid, " +
        s"first withoutMid=$withoutMid — re-pin the literals AND rename the fzgs* rows")
  }

  test("frozen ROLLUP/CUBE seeds: pinned literals match the selection-rule search") {
    // VERDICT r16 #2: same fix as the gsets seeds — the class-load
    // `.find(...).get` search is replaced by pinned literals, and the
    // original selection rule (first seed of each shape in 1..100)
    // re-runs HERE so a generator tweak fails loudly with the new
    // values instead of silently renaming the committed fzg* rows.
    def shape(s: Long) = graft.fuzz.PlanGen.generateRollup(s).shape
    val firstRollup = (1L to 100L).find(shape(_) == "rollup")
    val firstCube = (1L to 100L).find(shape(_) == "cube")
    assert(firstRollup.isDefined && firstCube.isDefined,
      "rollup generator no longer produces both shapes in seeds 1..100")
    assert(Seq(firstRollup.get, firstCube.get) ==
      graft.fuzz.Differential.frozenRollupSeeds,
      s"generator moved the frozen rollup seeds: first rollup=$firstRollup, " +
        s"first cube=$firstCube — re-pin the literals AND rename the fzg* rows")
  }

  test("frozen fz* rows: SQL-text entry equals DataFrame-API build") {
    // VERDICT r11 #7: Differential.queries now routes every frozen row
    // through spark.sql(sparkSql) (parser+analyzer front door). This
    // pins the other entry — the seeded DataFrame builder — to the
    // exact same rows for each FROZEN seed specifically, so the
    // cross-engine oracle result certifies both entry points at once.
    val builders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      graft.fuzz.Differential.frozenBuilders
    for ((name, viaText) <- graft.fuzz.Differential.queries) {
      val sqlRows = rows(viaText(spark, sf))
      val apiRows = rows(builders(name)(spark, sf))
      assert(sqlRows == apiRows,
        s"$name: SQL-text entry diverged from DataFrame build " +
          s"(sql=${sqlRows.size} rows, api=${apiRows.size} rows)")
    }
  }
}
