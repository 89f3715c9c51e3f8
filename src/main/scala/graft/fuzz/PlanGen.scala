package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine

/** Seeded random relational-plan generator for differential testing
  * (VERDICT r8 #2). One seeded walk emits THREE consistent renderings
  * of the same plan: a DataFrame-API builder, Spark-SQL text, and
  * DuckDB-SQL text. `DifferentialSpec` runs hundreds of seeds
  * DataFrame-vs-`spark.sql` (catching API/SQL translation drift inside
  * the engine); a frozen pick of seeds is declared as `fz*` queries
  * whose oracle is the DuckDB rendering — true cross-engine
  * differential rows through the driver's correctness gate.
  *
  * Determinism rules baked into every shape (the
  * `duckdb-spark-oracle-pitfalls` class):
  *  - SUMs go through DECIMAL(18,2) (exact, order-independent) and
  *    exit to DOUBLE — via VARCHAR on the DuckDB side, whose
  *    decimal→double cast is lossy past 2^53;
  *  - windows/LIMITs order by a UNIQUE key suffix (total order — no
  *    tie nondeterminism at any scale);
  *  - LEFT-join right-side filters apply BEFORE the join (subquery) in
  *    both SQL renderings, matching the DataFrame build;
  *  - group keys come from the left/probe table only, so LEFT joins
  *    never group on nullable keys (engine null-group string
  *    representations differ);
  *  - no floating-point addition, no AVG, no NaN sources. */
object PlanGen {

  final case class Generated(
      seed: Long,
      shape: String,
      build: (SparkSession, String) => DataFrame,
      sparkSql: String,
      duckSql: String)

  // ---- table model --------------------------------------------------
  private final case class T(
      name: String,
      ints: Seq[String],
      nums: Seq[String],                 // doubles; aggregated via decimal
      cats: Map[String, Seq[String]],    // column -> value domain
      date: Option[String],
      unique: Seq[String])               // total-order key

  private val lineitem = T("lineitem",
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    Seq("l_quantity", "l_extendedprice"),
    Map("l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("F", "O")),
    Some("l_shipdate"), Seq("l_orderkey", "l_linenumber"))
  private val orders = T("orders",
    Seq("o_orderkey", "o_custkey"),
    Seq("o_totalprice"),
    Map("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
    Some("o_orderdate"), Seq("o_orderkey"))
  private val customer = T("customer",
    Seq("c_custkey", "c_nationkey"), Seq("c_acctbal"),
    Map("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    None, Seq("c_custkey"))
  private val part = T("part",
    Seq("p_partkey", "p_size"), Seq("p_retailprice"),
    Map("p_type" -> Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")),
    None, Seq("p_partkey"))
  private val supplier = T("supplier",
    Seq("s_suppkey", "s_nationkey"), Seq("s_acctbal"),
    Map.empty, None, Seq("s_suppkey"))

  private val singles = Seq(lineitem, orders, customer, part, supplier)

  /** (left, right, leftKey, rightKey) equi-join edges. */
  private val joinEdges = Seq(
    (lineitem, orders, "l_orderkey", "o_orderkey"),
    (lineitem, part, "l_partkey", "p_partkey"),
    (lineitem, supplier, "l_suppkey", "s_suppkey"),
    (orders, customer, "o_custkey", "c_custkey"))

  /** (probe, build, probeKey, buildKey) ASOF edges — probe AND build
    * each carry a ts column (`T.date`). Self-edges model the classic
    * "latest state as of ts" shape over differently-filtered subsets;
    * the cross edge joins lineitems to their order's timeline. */
  private val asofEdges = Seq(
    (lineitem, orders, "l_orderkey", "o_orderkey"),
    (orders, orders, "o_custkey", "o_custkey"),
    (lineitem, lineitem, "l_suppkey", "l_suppkey"),
    (lineitem, lineitem, "l_partkey", "l_partkey"))

  /** Numeric threshold domains per column (plausible selectivities). */
  private val numDomain: Map[String, (Double, Double)] = Map(
    "l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (1000.0, 90000.0),
    "o_totalprice" -> (5000.0, 350000.0), "c_acctbal" -> (-900.0, 9000.0),
    "p_retailprice" -> (900.0, 2000.0), "s_acctbal" -> (-900.0, 9000.0))

  // ---- generator ----------------------------------------------------
  def generate(seed: Long): Generated = new Gen(seed).run()

  private final class Gen(seed: Long) {
    private val rnd = new scala.util.Random(seed)
    private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    private def maybe(p: Double): Boolean = rnd.nextDouble() < p

    /** A predicate rendered identically in both SQL dialects. */
    private case class Pred(sql: String, cond: Column)

    private def numPred(t: T): Pred = {
      val c = pick(t.nums ++ t.ints.filter(numDomain.contains))
      val (lo, hi) = numDomain.getOrElse(c, (1.0, 1000.0))
      val v = math.rint((lo + rnd.nextDouble() * (hi - lo)) * 100) / 100
      pick(Seq(
        Pred(s"$c < $v", col(c) < v), Pred(s"$c <= $v", col(c) <= v),
        Pred(s"$c > $v", col(c) > v), Pred(s"$c >= $v", col(c) >= v)))
    }

    private def modPred(t: T): Pred = {
      val c = pick(t.ints)
      val m = 2 + rnd.nextInt(12)
      val r = rnd.nextInt(m)
      Pred(s"$c % $m = $r", col(c) % m === r)
    }

    private def catPred(t: T): Pred = {
      val (c, dom) = pick(t.cats.toSeq.sortBy(_._1))
      if (maybe(0.5)) {
        val v = pick(dom)
        Pred(s"$c = '$v'", col(c) === v)
      } else {
        val vs = rnd.shuffle(dom).take(1 + rnd.nextInt(dom.size)).sorted
        Pred(s"$c IN (${vs.map(v => s"'$v'").mkString(", ")})",
          col(c).isin(vs: _*))
      }
    }

    private def datePred(t: T): Pred = {
      val c = t.date.get
      val d = f"${1995 + rnd.nextInt(6)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d 00:00:00"
      if (maybe(0.5)) Pred(s"$c <= TIMESTAMP '$d'", col(c) <= to_timestamp(lit(d)))
      else Pred(s"$c > TIMESTAMP '$d'", col(c) > to_timestamp(lit(d)))
    }

    private def onePred(t: T): Pred = {
      val pool = Seq(() => numPred(t), () => modPred(t)) ++
        (if (t.cats.nonEmpty) Seq(() => catPred(t)) else Nil) ++
        (if (t.date.nonEmpty) Seq(() => datePred(t)) else Nil)
      pick(pool)()
    }

    /** 1–3 predicates combined with AND/OR, fully parenthesized. */
    private def filterFor(t: T): Pred =
      (1 + rnd.nextInt(3)) match {
        case 1 => onePred(t)
        case n =>
          Seq.fill(n)(onePred(t)).reduce { (a, b) =>
            if (maybe(0.6)) Pred(s"(${a.sql} AND ${b.sql})", a.cond && b.cond)
            else Pred(s"(${a.sql} OR ${b.sql})", a.cond || b.cond)
          }
      }

    /** An aggregate: identical Spark/Duck SQL except the decimal-sum
      * exit cast. `alias` names the column in all three renderings. */
    private case class Agg(sparkSql: String, duckSql: String, dfCol: Column)

    private def aggFor(ts: Seq[T], alias: String): Agg = {
      val nums = ts.flatMap(_.nums)
      val ints = ts.flatMap(_.ints)
      pick[() => Agg](Seq(
        () => Agg(s"count(*) AS $alias", s"count(*) AS $alias",
          count(lit(1)).as(alias)),
        () => { val c = pick(nums)
          Agg(s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS $alias",
            s"CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS $alias",
            sum(col(c).cast("decimal(18,2)")).cast("double").as(alias)) },
        () => { val c = pick(nums)
          Agg(s"min($c) AS $alias", s"min($c) AS $alias", min(col(c)).as(alias)) },
        () => { val c = pick(nums)
          Agg(s"max($c) AS $alias", s"max($c) AS $alias", max(col(c)).as(alias)) },
        () => { val c = pick(ints)
          Agg(s"count(DISTINCT $c) AS $alias", s"count(DISTINCT $c) AS $alias",
            count_distinct(col(c)).as(alias)) }))()
    }

    // ---- shapes -----------------------------------------------------

    /** filter → groupBy → aggs [→ HAVING] over a single table or an
      * equi-join chain; group keys from the probe (left) side only. */
    private def shapeAgg(): Generated = {
      val nJoin = rnd.nextInt(3) // 0, 1 or 2 join edges
      val (tables, fromSpark, fromDuck, dfFrom) = buildFrom(nJoin)
      val groupT = tables.head
      val gcols = rnd.shuffle(groupT.cats.keys.toSeq.sorted)
        .take(1 + rnd.nextInt(math.max(1, groupT.cats.size))) match {
        case Nil => Seq(groupT.unique.head) // supplier: no cats — key-group
        case cs => cs
      }
      val aggs = (0 until 1 + rnd.nextInt(3)).map(i => aggFor(tables, s"agg$i"))
      val needHaving = maybe(0.3)
      val (aggsAll, having) =
        if (needHaving) {
          val k = 1 + rnd.nextInt(20)
          (aggs :+ Agg(s"count(*) AS cnt", s"count(*) AS cnt", count(lit(1)).as("cnt")),
            Some((s"HAVING count(*) > $k", (d: DataFrame) => d.filter(col("cnt") > k))))
        } else (aggs, None)
      val gl = gcols.mkString(", ")
      def sql(duck: Boolean) = {
        val al = aggsAll.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")
        val from = if (duck) fromDuck else fromSpark
        s"SELECT $gl, $al FROM $from GROUP BY $gl ${having.map(_._1).getOrElse("")} ORDER BY $gl"
      }
      val build = (s: SparkSession, dir: String) => {
        val base = dfFrom(s, dir)
        val agged = base.groupBy(gcols.map(col): _*).agg(aggsAll.head.dfCol, aggsAll.tail.map(_.dfCol): _*)
        having.fold(agged)(_._2(agged)).orderBy(gcols.map(col): _*)
      }
      Generated(seed, "agg", build, sql(false), sql(true))
    }

    /** FROM clause over `nJoin` edges: per-side filters go in
      * subqueries so LEFT-join semantics match the DataFrame build. */
    private def buildFrom(nJoin: Int)
        : (Seq[T], String, String, (SparkSession, String) => DataFrame) = {
      if (nJoin == 0) {
        val t = pick(singles)
        val p = filterFor(t)
        // alias suffix: `orders.take(2)` would be the reserved word OR
        val f = s"(SELECT * FROM ${t.name} WHERE ${p.sql}) ${t.name.take(2)}a"
        (Seq(t), f, f, (s, dir) => Engine.t(s, dir, t.name).filter(p.cond))
      } else if (nJoin == 1) {
        val (l, r, lk, rk) = pick(joinEdges)
        val (pl, pr) = (filterFor(l), filterFor(r))
        val jt = if (maybe(0.3)) "LEFT" else ""
        val f = s"(SELECT * FROM ${l.name} WHERE ${pl.sql}) la $jt JOIN " +
          s"(SELECT * FROM ${r.name} WHERE ${pr.sql}) ra ON $lk = $rk"
        val how = if (jt == "LEFT") "left" else "inner"
        (Seq(l, r), f, f, (s, dir) => {
          val a = Engine.t(s, dir, l.name).filter(pl.cond)
          val b = Engine.t(s, dir, r.name).filter(pr.cond)
          a.join(b, a(lk) === b(rk), how)
        })
      } else {
        // fixed 3-chain: lineitem ⋈ orders ⋈ customer (inner only)
        val (pl, po, pc) = (filterFor(lineitem), filterFor(orders), filterFor(customer))
        val f = s"(SELECT * FROM lineitem WHERE ${pl.sql}) la JOIN " +
          s"(SELECT * FROM orders WHERE ${po.sql}) oa ON l_orderkey = o_orderkey JOIN " +
          s"(SELECT * FROM customer WHERE ${pc.sql}) ca ON o_custkey = c_custkey"
        (Seq(lineitem, orders, customer), f, f, (s, dir) => {
          val a = Engine.t(s, dir, "lineitem").filter(pl.cond)
          val b = Engine.t(s, dir, "orders").filter(po.cond)
          val c = Engine.t(s, dir, "customer").filter(pc.cond)
          a.join(b, a("l_orderkey") === b("o_orderkey"))
            .join(c, b("o_custkey") === c("c_custkey"))
        })
      }
    }

    /** ranking window over a unique-key total order, filtered to the
      * top-n per partition. */
    private def shapeWindow(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val partCol = pick(t.cats.keys.toSeq.sorted)
      val fn = pick(Seq("row_number", "rank", "dense_rank"))
      val desc0 = maybe(0.5)
      val n = 1 + rnd.nextInt(10)
      val ordSql = t.unique.zipWithIndex
        .map { case (c, i) => if (i == 0 && desc0) s"$c DESC" else c }.mkString(", ")
      val ordCols = t.unique.zipWithIndex
        .map { case (c, i) => if (i == 0 && desc0) col(c).desc else col(c).asc }
      val outCols = (t.unique :+ partCol).distinct
      // rk joins the final sort: the synthetic data has duplicate
      // (orderkey, linenumber) pairs, so outCols alone can tie — two
      // dup rows in one window partition get arbitrary rk assignment
      // order, and without rk in the sort the engines may interleave
      // them differently.
      val sql =
        s"SELECT ${outCols.mkString(", ")}, rk FROM (" +
          s"SELECT *, $fn() OVER (PARTITION BY $partCol ORDER BY $ordSql) AS rk " +
          s"FROM ${t.name} WHERE ${p.sql}) w WHERE rk <= $n ORDER BY ${outCols.mkString(", ")}, rk"
      val build = (s: SparkSession, dir: String) => {
        val w = Window.partitionBy(partCol).orderBy(ordCols: _*)
        val f = fn match {
          case "row_number" => row_number(); case "rank" => rank(); case _ => dense_rank()
        }
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("rk", f.over(w)).filter(col("rk") <= n)
          .select((outCols :+ "rk").map(col): _*)
          .orderBy((outCols :+ "rk").map(col): _*)
      }
      Generated(seed, "window", build, sql, sql)
    }

    /** UNION/INTERSECT/EXCEPT (±ALL) of two filtered projections. */
    private def shapeSetOp(): Generated = {
      val t = pick(singles)
      val cols0 = rnd.shuffle(t.ints ++ t.cats.keys.toSeq).take(2 + rnd.nextInt(2)).sorted
      val (p1, p2) = (filterFor(t), filterFor(t))
      val (opSql, dfOp) = pick(Seq[(String, (DataFrame, DataFrame) => DataFrame)](
        ("UNION ALL", (a, b) => a.union(b)),
        ("INTERSECT", (a, b) => a.intersect(b)),
        ("EXCEPT", (a, b) => a.except(b)),
        ("INTERSECT ALL", (a, b) => a.intersectAll(b)),
        ("EXCEPT ALL", (a, b) => a.exceptAll(b))))
      val cl = cols0.mkString(", ")
      // outer ORDER BY over every output column: row order is then
      // deterministic up to duplicate (identical) rows in the ALL forms
      val sql = s"SELECT $cl FROM ${t.name} WHERE ${p1.sql} $opSql " +
        s"SELECT $cl FROM ${t.name} WHERE ${p2.sql} ORDER BY $cl"
      val build = (s: SparkSession, dir: String) => {
        val base = Engine.t(s, dir, t.name)
        dfOp(base.filter(p1.cond).select(cols0.map(col): _*),
          base.filter(p2.cond).select(cols0.map(col): _*))
          .orderBy(cols0.map(col): _*)
      }
      Generated(seed, "setop", build, sql, sql)
    }

    /** filter → total-order sort (unique tiebreak) → LIMIT. */
    private def shapeSortLimit(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val lead = pick(t.nums ++ t.cats.keys.toSeq)
      val descLead = maybe(0.5)
      val n = 1 + rnd.nextInt(50)
      val outCols = (t.unique :+ lead).distinct
      val ordSql = (s"$lead ${if (descLead) "DESC" else "ASC"}" +:
        t.unique.filterNot(_ == lead)).mkString(", ")
      val ordCols = (if (descLead) col(lead).desc else col(lead).asc) +:
        t.unique.filterNot(_ == lead).map(col(_).asc)
      val sql = s"SELECT ${outCols.mkString(", ")} FROM ${t.name} " +
        s"WHERE ${p.sql} ORDER BY $ordSql LIMIT $n"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(outCols.map(col): _*).orderBy(ordCols: _*).limit(n)
      Generated(seed, "sortlimit", build, sql, sql)
    }

    /** EXISTS / NOT EXISTS (semi/anti join) feeding an aggregate. */
    private def shapeSemiAnti(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val anti = maybe(0.4)
      val ex = if (anti) "NOT EXISTS" else "EXISTS"
      val how = if (anti) "left_anti" else "left_semi"
      val gcol =
        if (l.cats.nonEmpty) pick(l.cats.keys.toSeq.sorted) else l.unique.head
      val agg = aggFor(Seq(l), "agg0")
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${if (duck) agg.duckSql else agg.sparkSql} FROM ${l.name} " +
          s"WHERE ${pl.sql} AND $ex (SELECT 1 FROM ${r.name} WHERE $rk = $lk AND ${pr.sql}) " +
          s"GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r.name).filter(pr.cond)
        a.join(b, a(lk) === b(rk), how)
          .groupBy(gcol).agg(agg.dfCol).orderBy(gcol)
      }
      Generated(seed, if (anti) "anti" else "semi", build, sql(false), sql(true))
    }

    def run(): Generated = rnd.nextInt(5) match {
      case 0 => shapeAgg()
      case 1 => shapeWindow()
      case 2 => shapeSetOp()
      case 3 => shapeSortLimit()
      case 4 => shapeSemiAnti()
    }

    /** Composite: window rank → filter → aggregate. Exercises the
      * window-feeds-agg composition the five base shapes never chain.
      * Kept behind its own entry point so adding it does not reshuffle
      * the seed→shape mapping of the base generator (frozen `fz*`
      * names stay stable). */
    def runComposite(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val partCol = pick(t.cats.keys.toSeq.sorted)
      val desc0 = maybe(0.5)
      val n = 1 + rnd.nextInt(8)
      val agg = aggFor(Seq(t), "agg0")
      val ordSql = t.unique.zipWithIndex
        .map { case (c, i) => if (i == 0 && desc0) s"$c DESC" else c }.mkString(", ")
      val ordCols = t.unique.zipWithIndex
        .map { case (c, i) => if (i == 0 && desc0) col(c).desc else col(c).asc }
      def sql(duck: Boolean) =
        s"SELECT $partCol, count(*) AS topn_cnt, ${if (duck) agg.duckSql else agg.sparkSql} FROM (" +
          s"SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY $partCol ORDER BY $ordSql) AS rk " +
          s"FROM ${t.name} WHERE ${p.sql}) i WHERE rk <= $n) w " +
          s"GROUP BY $partCol ORDER BY $partCol"
      val build = (s: SparkSession, dir: String) => {
        val w = Window.partitionBy(partCol).orderBy(ordCols: _*)
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
          .groupBy(partCol).agg(count(lit(1)).as("topn_cnt"), agg.dfCol)
          .orderBy(partCol)
      }
      Generated(seed, "windowagg", build, sql(false), sql(true))
    }

    // ---- join surface (ADVICE r9 #5) --------------------------------

    /** Agg-then-join: both sides pre-aggregated by their join key, then
      * INNER / LEFT / FULL OUTER equi-joined. Pre-aggregation makes the
      * keys unique and non-null on each side, so the only null source
      * is the outer join itself — exactly the semantics under test —
      * and COALESCE pins the output deterministically. */
    private def shapeAggJoin(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val jt = pick(Seq("INNER", "LEFT", "FULL"))
      val how = jt.toLowerCase match { case "inner" => "inner"; case "left" => "left"; case _ => "full" }
      val lsum = pick(l.nums)
      def sql(duck: Boolean) = {
        val sumSql =
          if (duck) s"CAST(CAST(sum(CAST($lsum AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($lsum AS DECIMAL(18,2))) AS DOUBLE)"
        s"SELECT COALESCE($lk, $rk) AS k, COALESCE(ln, 0) AS ln, COALESCE(rn, 0) AS rn, " +
          s"COALESCE(lsum, 0.0) AS lsum FROM " +
          s"(SELECT $lk, count(*) AS ln, $sumSql AS lsum FROM ${l.name} WHERE ${pl.sql} GROUP BY $lk) la " +
          s"$jt JOIN (SELECT $rk, count(*) AS rn FROM ${r.name} WHERE ${pr.sql} GROUP BY $rk) ra " +
          s"ON $lk = $rk ORDER BY k"
      }
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond).groupBy(lk)
          .agg(count(lit(1)).as("ln"),
            sum(col(lsum).cast("decimal(18,2)")).cast("double").as("lsum"))
        val b = Engine.t(s, dir, r.name).filter(pr.cond).groupBy(rk)
          .agg(count(lit(1)).as("rn"))
        a.join(b, col(lk) === col(rk), how)
          .select(coalesce(col(lk), col(rk)).as("k"),
            coalesce(col("ln"), lit(0L)).as("ln"),
            coalesce(col("rn"), lit(0L)).as("rn"),
            coalesce(col("lsum"), lit(0.0)).as("lsum"))
          .orderBy("k")
      }
      Generated(seed, s"aggjoin_${how}", build, sql(false), sql(true))
    }

    /** RIGHT OUTER join → aggregate by a right-side (never-null) group
      * key. count(*) counts unmatched-right rows too; count(left key)
      * and the null-skipping decimal SUM count only matches — the three
      * together pin the outer-join row multiplicity exactly. */
    private def shapeRightJoinAgg(): Generated = {
      val (l, r0, lk, rk) = pick(joinEdges.filter(_._2.cats.nonEmpty))
      val (pl, pr) = (filterFor(l), filterFor(r0))
      val gcol = pick(r0.cats.keys.toSeq.sorted)
      val lnum = pick(l.nums)
      def sql(duck: Boolean) = {
        val sumSql =
          if (duck) s"CAST(CAST(sum(CAST($lnum AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($lnum AS DECIMAL(18,2))) AS DOUBLE)"
        s"SELECT $gcol, count(*) AS n_all, count($lk) AS n_match, " +
          s"COALESCE($sumSql, 0.0) AS lsum FROM " +
          s"(SELECT * FROM ${l.name} WHERE ${pl.sql}) la RIGHT JOIN " +
          s"(SELECT * FROM ${r0.name} WHERE ${pr.sql}) ra ON $lk = $rk " +
          s"GROUP BY $gcol ORDER BY $gcol"
      }
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r0.name).filter(pr.cond)
        a.join(b, a(lk) === b(rk), "right")
          .groupBy(gcol)
          .agg(count(lit(1)).as("n_all"), count(col(lk)).as("n_match"),
            coalesce(sum(col(lnum).cast("decimal(18,2)")).cast("double"), lit(0.0)).as("lsum"))
          .orderBy(gcol)
      }
      Generated(seed, "rightagg", build, sql(false), sql(true))
    }

    /** Equi-join → ranking window over the joined rows → top-n filter.
      * Every join edge's right side is unique on its key, so the join
      * preserves left-row multiplicity. `l.unique` is NOT a total order
      * (e.g. lineitem carries duplicate (l_orderkey, l_linenumber)
      * facts) — determinism instead rests on ties sharing ALL output
      * columns: rows tied on `l.unique` are identical in the projected
      * (unique cols + partCol) set, so any rk permutation among them is
      * output-invariant. Projecting a non-key left column here would
      * break that invariant. */
    private def shapeJoinWindow(): Generated = {
      val (l, r0, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r0))
      val partCol =
        if (r0.cats.nonEmpty) pick(r0.cats.keys.toSeq.sorted)
        else pick(l.cats.keys.toSeq.sorted)
      val n = 1 + rnd.nextInt(8)
      val outCols = (l.unique :+ partCol).distinct
      val ordSql = l.unique.mkString(", ")
      val sql =
        s"SELECT ${outCols.mkString(", ")}, rk FROM (" +
          s"SELECT ${outCols.mkString(", ")}, row_number() OVER (PARTITION BY $partCol ORDER BY $ordSql) AS rk " +
          s"FROM (SELECT * FROM ${l.name} WHERE ${pl.sql}) la JOIN " +
          s"(SELECT * FROM ${r0.name} WHERE ${pr.sql}) ra ON $lk = $rk) w " +
          s"WHERE rk <= $n ORDER BY ${outCols.mkString(", ")}, rk"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r0.name).filter(pr.cond)
        val w = Window.partitionBy(partCol).orderBy(l.unique.map(col(_).asc): _*)
        a.join(b, a(lk) === b(rk))
          .select(outCols.map(col): _*)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
          .orderBy((outCols :+ "rk").map(col): _*)
      }
      Generated(seed, "joinwindow", build, sql, sql)
    }

    def runJoin(): Generated = rnd.nextInt(3) match {
      case 0 => shapeAggJoin()
      case 1 => shapeRightJoinAgg()
      case 2 => shapeJoinWindow()
    }

    /** Running aggregate / lag / lead over a ROWS frame. Determinism
      * under the synthetic data's duplicate rows: the window ORDER BY
      * covers the key suffix AND the operand column, so rows that
      * still tie are identical in every column the frame reads —
      * interchangeable for any ROWS-frame computation — and the final
      * ORDER BY covers every output column. */
    def runFrame(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val partCol = pick(t.cats.keys.toSeq.sorted)
      val v = pick(t.nums)
      val ordCols = (t.unique :+ v).distinct
      val ordSql = ordCols.mkString(", ")
      val w = Window.partitionBy(partCol)
        .orderBy(ordCols.map(col(_).asc): _*)
      val n = 1 + rnd.nextInt(5)
      val over = s"OVER (PARTITION BY $partCol ORDER BY $ordSql"
      val (fnName, sparkFn, duckFn, dfc) = rnd.nextInt(4) match {
        case 0 =>
          val s = s"CAST(sum(CAST($v AS DECIMAL(18,2))) $over ROWS BETWEEN $n PRECEDING AND CURRENT ROW) AS DOUBLE)"
          val d = s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) $over ROWS BETWEEN $n PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)"
          ("rsum", s, d,
            sum(col(v).cast("decimal(18,2)")).over(w.rowsBetween(-n, 0)).cast("double"))
        case 1 =>
          val s = s"min($v) $over ROWS BETWEEN $n PRECEDING AND CURRENT ROW)"
          ("rmin", s, s, min(col(v)).over(w.rowsBetween(-n, 0)))
        case 2 =>
          val s = s"COALESCE(lag($v, $n) $over), CAST(-1 AS DOUBLE))"
          ("lag", s, s, coalesce(lag(col(v), n).over(w), lit(-1.0)))
        case 3 =>
          val s = s"COALESCE(lead($v, $n) $over), CAST(-1 AS DOUBLE))"
          ("lead", s, s, coalesce(lead(col(v), n).over(w), lit(-1.0)))
      }
      val outCols = (ordCols :+ partCol).distinct
      val ordAll = outCols :+ "wv"
      def sql(duck: Boolean) =
        s"SELECT ${outCols.mkString(", ")}, ${if (duck) duckFn else sparkFn} AS wv " +
          s"FROM ${t.name} WHERE ${p.sql} ORDER BY ${ordAll.mkString(", ")}"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(outCols.map(col) :+ dfc.as("wv"): _*)
          .orderBy(ordAll.map(col): _*)
      Generated(seed, s"frame_$fnName", build, sql(false), sql(true))
    }

    /** RANGE-frame windows — VALUE-based frames over an integer ORDER
      * BY key: peers (order-key ties) enter the frame together, so the
      * window value is a pure function of (partition, order value) and
      * the plan is deterministic even where the key repeats — the
      * semantic branch ROWS frames never exercise (offset resolution
      * against the order expression's type + peer-row inclusion, a
      * classic cross-engine divergence spot). sum stays in DECIMAL:
      * value-based frames fix the SET of summed rows, not float
      * summation order. */
    def runRangeFrame(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val partCol = pick(t.cats.keys.toSeq.sorted)
      val o = pick(t.ints)
      val v = pick(t.nums)
      val k = pick(Seq(1, 2, 5, 10, 100, 1000, 10000))
      val follow = maybe(0.3)
      val w0 = Window.partitionBy(partCol).orderBy(col(o).asc)
      val w = if (follow) w0.rangeBetween(0, k) else w0.rangeBetween(-k, 0)
      val frameSql =
        if (follow) s"RANGE BETWEEN CURRENT ROW AND $k FOLLOWING"
        else s"RANGE BETWEEN $k PRECEDING AND CURRENT ROW"
      val over = s"OVER (PARTITION BY $partCol ORDER BY $o $frameSql)"
      val (fnName, sparkFn, duckFn, dfc) = rnd.nextInt(4) match {
        case 0 =>
          val s = s"CAST(sum(CAST($v AS DECIMAL(18,2))) $over AS DOUBLE)"
          val d = s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) $over AS VARCHAR) AS DOUBLE)"
          ("rsum", s, d, sum(col(v).cast("decimal(18,2)")).over(w).cast("double"))
        case 1 =>
          val s = s"min($v) $over"
          ("rmin", s, s, min(col(v)).over(w))
        case 2 =>
          val s = s"max($v) $over"
          ("rmax", s, s, max(col(v)).over(w))
        case 3 =>
          val s = s"count(*) $over"
          ("rcnt", s, s, count(lit(1)).over(w))
      }
      val outCols = (t.unique ++ Seq(partCol, o, v)).distinct
      val ordAll = outCols :+ "wv"
      def sql(duck: Boolean) =
        s"SELECT ${outCols.mkString(", ")}, ${if (duck) duckFn else sparkFn} AS wv " +
          s"FROM ${t.name} WHERE ${p.sql} ORDER BY ${ordAll.mkString(", ")}"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(outCols.map(col) :+ dfc.as("wv"): _*)
          .orderBy(ordAll.map(col): _*)
      Generated(seed, s"rframe_$fnName", build, sql(false), sql(true))
    }

    // ---- scalar-expression surface ----------------------------------

    /** A typed scalar expression rendered three ways. `sql` must parse
      * identically in Spark SQL and DuckDB unless a dialect split is
      * needed (then `duck` overrides). */
    private case class SE(sql: String, dfc: Column, duck: Option[String] = None) {
      def duckSql: String = duck.getOrElse(sql)
    }

    /** Typed, depth-bounded random expression trees over one table's
      * columns, restricted to the function set whose semantics (and,
      * for doubles, whose IEEE operation sequence) are identical in
      * Spark and DuckDB: add/sub/mul on DOUBLE, abs/greatest/least,
      * CASE, integer add and mod, upper/lower/substr/concat/replace/length,
      * year/month/day. No division (0 denominators), no round
      * (dialect rounding modes), no string ordering (collation). All
      * base columns are non-null, so null semantics never enter. */
    private def numExpr(t: T, depth: Int): SE = {
      if (depth <= 0) {
        if (maybe(0.7)) { val c = pick(t.nums); SE(c, col(c)) }
        else { val v = math.rint(rnd.nextDouble() * 200 - 100) / 10
          // bare `3.2` parses as DECIMAL in both SQL dialects while the
          // DF lit is DOUBLE — pin all three renderings to DOUBLE
          SE(s"CAST($v AS DOUBLE)", lit(v)) }
      } else pick[() => SE](Seq(
        () => { val (a, b) = (numExpr(t, depth - 1), numExpr(t, depth - 1))
          SE(s"(${a.sql} + ${b.sql})", a.dfc + b.dfc, Some(s"(${a.duckSql} + ${b.duckSql})")) },
        () => { val (a, b) = (numExpr(t, depth - 1), numExpr(t, depth - 1))
          SE(s"(${a.sql} - ${b.sql})", a.dfc - b.dfc, Some(s"(${a.duckSql} - ${b.duckSql})")) },
        () => { val a = numExpr(t, depth - 1); val k = 1 + rnd.nextInt(9)
          SE(s"(${a.sql} * $k)", a.dfc * k, Some(s"(${a.duckSql} * $k)")) },
        () => { val a = numExpr(t, depth - 1)
          SE(s"abs(${a.sql})", abs(a.dfc), Some(s"abs(${a.duckSql})")) },
        () => { val (a, b) = (numExpr(t, depth - 1), numExpr(t, depth - 1))
          val f = pick(Seq("greatest", "least"))
          SE(s"$f(${a.sql}, ${b.sql})",
            if (f == "greatest") greatest(a.dfc, b.dfc) else least(a.dfc, b.dfc),
            Some(s"$f(${a.duckSql}, ${b.duckSql})")) },
        () => { val p = onePred(t); val (a, b) = (numExpr(t, depth - 1), numExpr(t, depth - 1))
          SE(s"CASE WHEN ${p.sql} THEN ${a.sql} ELSE ${b.sql} END",
            when(p.cond, a.dfc).otherwise(b.dfc),
            Some(s"CASE WHEN ${p.sql} THEN ${a.duckSql} ELSE ${b.duckSql} END")) },
        () => { val a = intExpr(t, depth - 1)
          SE(s"CAST(${a.sql} AS DOUBLE)", a.dfc.cast("double"),
            Some(s"CAST(${a.duckSql} AS DOUBLE)")) }))()
    }

    private def intExpr(t: T, depth: Int): SE = {
      if (depth <= 0) {
        if (maybe(0.7)) { val c = pick(t.ints); SE(c, col(c)) }
        else { val v = rnd.nextInt(1000); SE(v.toString, lit(v.toLong)) }
      } else pick[() => SE](Seq(
        () => { val (a, b) = (intExpr(t, depth - 1), intExpr(t, depth - 1))
          SE(s"(${a.sql} + ${b.sql})", a.dfc + b.dfc, Some(s"(${a.duckSql} + ${b.duckSql})")) },
        () => { val a = intExpr(t, depth - 1); val m = 2 + rnd.nextInt(97)
          SE(s"(${a.sql} % $m)", a.dfc % m, Some(s"(${a.duckSql} % $m)")) },
        () => { val a = strExpr(t, depth - 1)
          SE(s"CAST(length(${a.sql}) AS BIGINT)", length(a.dfc).cast("long"),
            Some(s"CAST(length(${a.duckSql}) AS BIGINT)")) },
        () => { val a = strExpr(t, depth - 1); val sub = pick("AEIMORS".toSeq).toString
          // 1-based first-occurrence position, 0 when absent, on both
          // engines — Spark spells it instr, DuckDB strpos
          SE(s"CAST(instr(${a.sql}, '$sub') AS BIGINT)",
            instr(a.dfc, sub).cast("long"),
            Some(s"CAST(strpos(${a.duckSql}, '$sub') AS BIGINT)")) },
        () => t.date match {
          case Some(d) => val f = pick(Seq("year", "month", "day"))
            SE(s"CAST($f($d) AS BIGINT)",
              (f match { case "year" => year(col(d)); case "month" => month(col(d)); case _ => dayofmonth(col(d)) }).cast("long"),
              Some(s"CAST($f($d) AS BIGINT)"))
          case None => val c = pick(t.ints); SE(c, col(c))
        }))()
    }

    private def strExpr(t: T, depth: Int): SE = {
      val strCols = t.cats.keys.toSeq.sorted
      if (depth <= 0 || strCols.isEmpty) {
        if (strCols.nonEmpty && maybe(0.8)) { val c = pick(strCols); SE(c, col(c)) }
        else { val v = "s" + rnd.nextInt(100); SE(s"'$v'", lit(v)) }
      } else pick[() => SE](Seq(
        () => { val a = strExpr(t, depth - 1); val f = pick(Seq("upper", "lower"))
          SE(s"$f(${a.sql})", if (f == "upper") upper(a.dfc) else lower(a.dfc),
            Some(s"$f(${a.duckSql})")) },
        () => { val a = strExpr(t, depth - 1); val i = 1 + rnd.nextInt(4); val n = 1 + rnd.nextInt(6)
          SE(s"substr(${a.sql}, $i, $n)", substring(a.dfc, i, n),
            Some(s"substr(${a.duckSql}, $i, $n)")) },
        () => { val (a, b) = (strExpr(t, depth - 1), strExpr(t, depth - 1))
          SE(s"concat(${a.sql}, '|', ${b.sql})", concat(a.dfc, lit("|"), b.dfc),
            Some(s"concat(${a.duckSql}, '|', ${b.duckSql})")) },
        () => { val a = strExpr(t, depth - 1)
          SE(s"replace(${a.sql}, 'A', '_')", regexp_replace(a.dfc, "A", "_"),
            Some(s"replace(${a.duckSql}, 'A', '_')")) },
        () => { val a = strExpr(t, depth - 1)
          val f = pick(Seq("trim", "ltrim", "rtrim", "reverse"))
          val dfc = f match {
            case "trim" => trim(a.dfc); case "ltrim" => ltrim(a.dfc)
            case "rtrim" => rtrim(a.dfc); case _ => reverse(a.dfc)
          }
          SE(s"$f(${a.sql})", dfc, Some(s"$f(${a.duckSql})")) },
        () => { val a = strExpr(t, depth - 1)
          val n = 3 + rnd.nextInt(10)
          val f = pick(Seq("lpad", "rpad"))
          // both engines pad to OR truncate at n with the same rule
          SE(s"$f(${a.sql}, $n, '.')",
            if (f == "lpad") lpad(a.dfc, n, ".") else rpad(a.dfc, n, "."),
            Some(s"$f(${a.duckSql}, $n, '.')")) },
        () => { val a = strExpr(t, depth - 1); val k = 2 + rnd.nextInt(2)
          SE(s"repeat(${a.sql}, $k)", repeat(a.dfc, k),
            Some(s"repeat(${a.duckSql}, $k)")) },
        () => { val a = strExpr(t, depth - 1)
          SE(s"translate(${a.sql}, 'AEO', 'aeo')", translate(a.dfc, "AEO", "aeo"),
            Some(s"translate(${a.duckSql}, 'AEO', 'aeo')")) }))()
    }

    /** ROLLUP / CUBE subtotal semantics. The grouping columns are
      * non-null, so every NULL in the output is a subtotal marker —
      * COALESCE to a sentinel that sorts deterministically in both
      * engines (ASCII `~` — byte order agrees), sidestepping their
      * opposite NULLS FIRST/LAST defaults entirely.
      *
      * Cross-engine divergence found by the r11 sweep (seeds 56, 100):
      * on EMPTY input DuckDB emits the standard's grand-total grouping
      * set (one row, count 0), Spark emits no rows. The engine is
      * Spark, so pin the Spark behavior: `HAVING count(*) > 0` — an
      * identity on every non-empty group, and it erases the empty
      * grand-total row on the DuckDB side. */
    def runRollup(): Generated = {
      val t = pick(singles.filter(_.cats.size >= 2))
      val cs = rnd.shuffle(t.cats.keys.toSeq.sorted).take(2)
      val (c1, c2) = (cs.head, cs(1))
      val p = filterFor(t)
      val v = pick(t.nums)
      val cube = maybe(0.5)
      val kw = if (cube) "CUBE" else "ROLLUP"
      def sql(duck: Boolean) = {
        val sumSql =
          if (duck) s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($v AS DECIMAL(18,2))) AS DOUBLE)"
        s"SELECT COALESCE($c1, '~~') AS g1, COALESCE($c2, '~~') AS g2, " +
          s"count(*) AS n, $sumSql AS s FROM ${t.name} WHERE ${p.sql} " +
          s"GROUP BY $kw($c1, $c2) HAVING count(*) > 0 ORDER BY g1, g2"
      }
      val build = (s: SparkSession, dir: String) => {
        val base = Engine.t(s, dir, t.name).filter(p.cond)
        val grouped = if (cube) base.cube(c1, c2) else base.rollup(c1, c2)
        grouped.agg(count(lit(1)).as("n"),
            sum(col(v).cast("decimal(18,2)")).cast("double").as("s"))
          .filter(col("n") > 0)
          .select(coalesce(col(c1), lit("~~")).as("g1"),
            coalesce(col(c2), lit("~~")).as("g2"), col("n"), col("s"))
          .orderBy("g1", "g2")
      }
      Generated(seed, if (cube) "cube" else "rollup", build, sql(false), sql(true))
    }

    /** Aggregate-function surface beyond the base shapes' count/sum/
      * min/max: decimal-exact AVG (exit via one double division —
      * identical IEEE op both engines), string min/max (ASCII data —
      * binary collation agrees), integer SUM pinned to BIGINT (DuckDB
      * would widen to HUGEINT, a hard type mismatch), and conditional
      * COUNT(CASE WHEN … THEN 1 END). */
    def runAggFns(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val gcol = pick(t.cats.keys.toSeq.sorted)
      val aggs = (0 until 2 + rnd.nextInt(2)).map { i =>
        val alias = s"agg$i"
        rnd.nextInt(4) match {
          case 0 =>
            val c = pick(t.nums)
            Agg(s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS $alias",
              s"CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS $alias",
              (sum(col(c).cast("decimal(18,2)")).cast("double") / count(lit(1))).as(alias))
          case 1 =>
            val c = pick((t.cats.keys.toSeq ++ t.cats.keys.toSeq).sorted)
            val f = pick(Seq("min", "max"))
            Agg(s"$f($c) AS $alias", s"$f($c) AS $alias",
              (if (f == "min") min(col(c)) else max(col(c))).as(alias))
          case 2 =>
            val c = pick(t.ints)
            Agg(s"CAST(sum($c) AS BIGINT) AS $alias",
              s"CAST(sum($c) AS BIGINT) AS $alias",
              sum(col(c)).cast("long").as(alias))
          case 3 =>
            val pr = onePred(t)
            Agg(s"count(CASE WHEN ${pr.sql} THEN 1 END) AS $alias",
              s"count(CASE WHEN ${pr.sql} THEN 1 END) AS $alias",
              count(when(pr.cond, lit(1))).as(alias))
        }
      }
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .groupBy(gcol).agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
          .orderBy(gcol)
      Generated(seed, "aggfns", build, sql(false), sql(true))
    }

    /** filter → project N scalar expression trees + unique key → total
      * order → LIMIT. Pure row-parallel compute: the cross-engine leg
      * pins scalar-function semantics; the API-vs-SQL leg pins the DSL
      * translation of the same trees. */
    def runScalar(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val n = 100 + rnd.nextInt(200)
      val exprs = (0 until 2 + rnd.nextInt(2)).map { i =>
        val se = rnd.nextInt(3) match {
          case 0 => numExpr(t, 2 + rnd.nextInt(2))
          case 1 => intExpr(t, 2 + rnd.nextInt(2))
          case 2 => strExpr(t, 2 + rnd.nextInt(2))
        }
        (s"e$i", se)
      }
      val keys = t.unique
      // ORDER BY every output column, not just the key suffix: the
      // driver's synthetic lineitem has duplicate (orderkey, linenumber)
      // pairs, so the "unique" columns alone are NOT a total order —
      // with all columns in the sort, any remaining ties are fully
      // identical rows and compare equal in either order.
      val ordAll = keys ++ exprs.map(_._1)
      def sql(duck: Boolean) =
        s"SELECT ${keys.mkString(", ")}, " +
          exprs.map { case (a, se) => s"${if (duck) se.duckSql else se.sql} AS $a" }.mkString(", ") +
          s" FROM ${t.name} WHERE ${p.sql} ORDER BY ${ordAll.mkString(", ")} LIMIT $n"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(keys.map(col) ++ exprs.map { case (a, se) => se.dfc.as(a) }: _*)
          .orderBy(ordAll.map(col): _*).limit(n)
      Generated(seed, "scalar", build, sql(false), sql(true))
    }

    // ---- correlated-subquery surface (VERDICT r11 #3) ---------------

    /** IN / NOT IN subquery feeding a grouped aggregate. Join keys are
      * TPC-H-style NON-NULL, so NOT IN's null-poisoning rule cannot
      * make the ANSI renderings diverge from the DataFrame anti-join
      * build — the divergence only exists when the subquery column can
      * be null, which these keys never are. */
    private def shapeInSub(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val neg = maybe(0.4)
      val gcol = if (l.cats.nonEmpty) pick(l.cats.keys.toSeq.sorted) else l.unique.head
      val agg = aggFor(Seq(l), "agg0")
      val in = if (neg) "NOT IN" else "IN"
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${if (duck) agg.duckSql else agg.sparkSql} FROM ${l.name} " +
          s"WHERE ${pl.sql} AND $lk $in (SELECT $rk FROM ${r.name} WHERE ${pr.sql}) " +
          s"GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r.name).filter(pr.cond)
        a.join(b, a(lk) === b(rk), if (neg) "left_anti" else "left_semi")
          .groupBy(gcol).agg(agg.dfCol).orderBy(gcol)
      }
      Generated(seed, if (neg) "subq_notin" else "subq_in", build, sql(false), sql(true))
    }

    /** Correlated (NOT) EXISTS with a THETA (inequality) conjunct tying
      * an inner numeric to an outer numeric — the
      * RewritePredicateSubquery path with a non-equi correlation, which
      * plain equi-semi shapes (fz3/fz8) never exercise. */
    private def shapeExistsTheta(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val lnum = pick(l.nums)
      val rnum = pick(r.nums)
      val anti = maybe(0.4)
      val ex = if (anti) "NOT EXISTS" else "EXISTS"
      val gcol = if (l.cats.nonEmpty) pick(l.cats.keys.toSeq.sorted) else l.unique.head
      val agg = aggFor(Seq(l), "agg0")
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${if (duck) agg.duckSql else agg.sparkSql} FROM ${l.name} " +
          s"WHERE ${pl.sql} AND $ex (SELECT 1 FROM ${r.name} " +
          s"WHERE $rk = $lk AND $rnum > $lnum AND ${pr.sql}) " +
          s"GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r.name).filter(pr.cond)
        a.join(b, a(lk) === b(rk) && b(rnum) > a(lnum),
          if (anti) "left_anti" else "left_semi")
          .groupBy(gcol).agg(agg.dfCol).orderBy(gcol)
      }
      Generated(seed, if (anti) "subq_ntheta" else "subq_theta", build, sql(false), sql(true))
    }

    /** Correlated SCALAR subquery in the projection: per outer row the
      * max of a filtered inner column at the correlation key, −1 when
      * no inner row matches. DataFrame build = the left-join-aggregate
      * de-correlation Spark's own optimizer performs. The final sort
      * covers every output column (lineitem's unique suffix has
      * documented duplicates; with `sub` in the sort, remaining ties
      * are identical rows). */
    private def shapeScalarSub(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val rnum = pick(r.nums)
      val n = 20 + rnd.nextInt(60)
      val outCols = l.unique
      val ordAll = outCols :+ "sub"
      def sql(duck: Boolean) =
        s"SELECT ${outCols.mkString(", ")}, COALESCE((SELECT max($rnum) FROM ${r.name} " +
          s"WHERE $rk = $lk AND ${pr.sql}), CAST(-1 AS DOUBLE)) AS sub FROM ${l.name} " +
          s"WHERE ${pl.sql} ORDER BY ${ordAll.mkString(", ")} LIMIT $n"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, l.name).filter(pl.cond)
        val b = Engine.t(s, dir, r.name).filter(pr.cond)
          .groupBy(col(rk)).agg(max(col(rnum)).as("sub0"))
        a.join(b, a(lk) === b(rk), "left")
          .select(outCols.map(a(_)) :+ coalesce(col("sub0"), lit(-1.0)).as("sub"): _*)
          .orderBy(ordAll.map(col): _*).limit(n)
      }
      Generated(seed, "subq_scalar", build, sql(false), sql(true))
    }

    def runSubq(): Generated = rnd.nextInt(3) match {
      case 0 => shapeInSub()
      case 1 => shapeExistsTheta()
      case 2 => shapeScalarSub()
    }

    // ---- 3-table mixed-join chains (VERDICT r11 #3) -----------------

    /** Null-safe aggregate over a column that outer joins can null out:
      * every variant either skips nulls by SQL definition (count) or
      * exits through COALESCE, so engines can't differ on null display. */
    private def nullAggFor(c: String, alias: String): Agg =
      pick[() => Agg](Seq(
        () => Agg(s"count($c) AS $alias", s"count($c) AS $alias",
          count(col(c)).as(alias)),
        () => Agg(
          s"CAST(COALESCE(sum(CAST($c AS DECIMAL(18,2))), 0) AS DOUBLE) AS $alias",
          s"CAST(CAST(COALESCE(sum(CAST($c AS DECIMAL(18,2))), 0) AS VARCHAR) AS DOUBLE) AS $alias",
          coalesce(sum(col(c).cast("decimal(18,2)")), lit(0).cast("decimal(18,2)"))
            .cast("double").as(alias)),
        () => Agg(s"COALESCE(min($c), -1) AS $alias", s"COALESCE(min($c), -1) AS $alias",
          coalesce(min(col(c)), lit(-1.0)).as(alias)),
        () => Agg(s"COALESCE(max($c), -1) AS $alias", s"COALESCE(max($c), -1) AS $alias",
          coalesce(max(col(c)), lit(-1.0)).as(alias))))()

    /** At least one LEFT in every combo: the whole point is nulls
      * flowing out of the outer side into the aggregates. */
    private def jtCombo(): (String, String, String) = {
      val (a, b) = pick(Seq(("LEFT", ""), ("", "LEFT"), ("LEFT", "LEFT")))
      def tag(j: String) = if (j.isEmpty) "i" else "l"
      (a, b, tag(a) + tag(b))
    }
    private def how(jt: String): String = if (jt.isEmpty) "inner" else "left"

    /** lineitem ⋈ orders ⋈ customer PATH with mixed join types, grouped
      * on a non-null probe-side key; count(c_custkey) counts survivors
      * of BOTH hops. Per-side filters stay in subqueries so LEFT
      * semantics match the DataFrame build (the established rule). */
    private def shapeChainPath(): Generated = {
      val (jt1, jt2, tag) = jtCombo()
      val (pl, po, pc) = (filterFor(lineitem), filterFor(orders), filterFor(customer))
      val gcol = pick(lineitem.cats.keys.toSeq.sorted)
      val aggs = Seq(
        Agg("count(*) AS cnt", "count(*) AS cnt", count(lit(1)).as("cnt")),
        nullAggFor("o_totalprice", "agg1"),
        nullAggFor("c_acctbal", "agg2"),
        Agg("count(c_custkey) AS cnt_c", "count(c_custkey) AS cnt_c",
          count(col("c_custkey")).as("cnt_c")))
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
          s"FROM (SELECT * FROM lineitem WHERE ${pl.sql}) la $jt1 JOIN " +
          s"(SELECT * FROM orders WHERE ${po.sql}) oa ON l_orderkey = o_orderkey $jt2 JOIN " +
          s"(SELECT * FROM customer WHERE ${pc.sql}) ca ON o_custkey = c_custkey " +
          s"GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, "lineitem").filter(pl.cond)
        val b = Engine.t(s, dir, "orders").filter(po.cond)
        val c = Engine.t(s, dir, "customer").filter(pc.cond)
        a.join(b, a("l_orderkey") === b("o_orderkey"), how(jt1))
          .join(c, b("o_custkey") === c("c_custkey"), how(jt2))
          .groupBy(gcol).agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
          .orderBy(gcol)
      }
      Generated(seed, s"chain3_path_$tag", build, sql(false), sql(true))
    }

    /** lineitem ⋈ part + lineitem ⋈ supplier STAR with mixed join
      * types — both ON clauses bind to the fact table, so the nulls
      * from hop 1 and hop 2 are independent (unlike the path shape). */
    private def shapeChainStar(): Generated = {
      val (jt1, jt2, tag) = jtCombo()
      val (pl, pp, ps) = (filterFor(lineitem), filterFor(part), filterFor(supplier))
      val gcol = pick(lineitem.cats.keys.toSeq.sorted)
      val aggs = Seq(
        Agg("count(*) AS cnt", "count(*) AS cnt", count(lit(1)).as("cnt")),
        nullAggFor("p_retailprice", "agg1"),
        nullAggFor("s_acctbal", "agg2"),
        Agg("count(p_partkey) AS cnt_p", "count(p_partkey) AS cnt_p",
          count(col("p_partkey")).as("cnt_p")))
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
          s"FROM (SELECT * FROM lineitem WHERE ${pl.sql}) la $jt1 JOIN " +
          s"(SELECT * FROM part WHERE ${pp.sql}) pa ON l_partkey = p_partkey $jt2 JOIN " +
          s"(SELECT * FROM supplier WHERE ${ps.sql}) sa ON l_suppkey = s_suppkey " +
          s"GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) => {
        val a = Engine.t(s, dir, "lineitem").filter(pl.cond)
        val b = Engine.t(s, dir, "part").filter(pp.cond)
        val c = Engine.t(s, dir, "supplier").filter(ps.cond)
        a.join(b, a("l_partkey") === b("p_partkey"), how(jt1))
          .join(c, a("l_suppkey") === c("s_suppkey"), how(jt2))
          .groupBy(gcol).agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
          .orderBy(gcol)
      }
      Generated(seed, s"chain3_star_$tag", build, sql(false), sql(true))
    }

    // nextInt(2) on a fresh java.util.Random is nearly CONSTANT across
    // sequential seeds (the scrambler's first power-of-2 draw) — 100
    // seeds all landed on one branch; a non-power-of-2 bound mixes.
    def runChain3(): Generated =
      if (rnd.nextInt(6) < 3) shapeChainPath() else shapeChainStar()

    // ---- multi-DISTINCT aggregate surface (round 13) ----------------

    /** Two-plus DISTINCT aggregates over DIFFERENT columns mixed with
      * plain aggregates — the one aggregation form Spark cannot plan as
      * a single hash aggregate: it rewrites through an Expand (one
      * row-replica per distinct group) + double aggregation, a planning
      * path none of the other surfaces reach. All DISTINCT operands are
      * ints/strings (exact equality, no float dedup hazard); int SUMs
      * pin BIGINT on both engines (DuckDB would widen to HUGEINT). */
    def runDistinct(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val gcol = pick(t.cats.keys.toSeq.sorted)
      // two distinct operands over different columns forces Expand
      val d1 = pick(t.ints)
      val d2 = pick((t.ints.filterNot(_ == d1) ++
        t.cats.keys.toSeq.filterNot(_ == gcol)).sorted)
      val aggs = Seq(
        Agg(s"count(DISTINCT $d1) AS nd1", s"count(DISTINCT $d1) AS nd1",
          count_distinct(col(d1)).as("nd1")),
        Agg(s"count(DISTINCT $d2) AS nd2", s"count(DISTINCT $d2) AS nd2",
          count_distinct(col(d2)).as("nd2")),
        Agg(s"CAST(sum(DISTINCT $d1) AS BIGINT) AS sd1",
          s"CAST(sum(DISTINCT $d1) AS BIGINT) AS sd1",
          sum_distinct(col(d1)).cast("long").as("sd1"))) ++
        (if (maybe(0.7)) Seq(aggFor(Seq(t), "agg0")) else Nil) :+
        Agg("count(*) AS cnt", "count(*) AS cnt", count(lit(1)).as("cnt"))
      def sql(duck: Boolean) =
        s"SELECT $gcol, ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY $gcol ORDER BY $gcol"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .groupBy(gcol).agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
          .orderBy(gcol)
      Generated(seed, "distinctagg", build, sql(false), sql(true))
    }

    // ---- GROUPING SETS surface (round 13) ---------------------------

    /** Explicit GROUPING SETS with `grouping()` subtotal markers — the
      * general form behind ROLLUP/CUBE (fzg*), plus the marker function
      * those rows never project. Sentinel + empty-input rules follow
      * runRollup: COALESCE to `~~` (byte-order-stable in both engines)
      * and `HAVING count(*) > 0` to erase DuckDB's empty-input
      * grand-total row. grouping() exits through BIGINT (Spark returns
      * TINYINT, DuckDB BIGINT). The DataFrame build uses the Spark 4
      * `Dataset.groupingSets` API — a front-door the SQL text leg then
      * cross-checks. */
    def runGroupingSets(): Generated = {
      val t = pick(singles.filter(_.cats.size >= 2))
      val cs = rnd.shuffle(t.cats.keys.toSeq.sorted).take(2)
      val (c1, c2) = (cs.head, cs(1))
      val p = filterFor(t)
      val v = pick(t.nums)
      // always the full pair + grand total; each single-col set by coin
      val mids = Seq(Seq(c1), Seq(c2)).filter(_ => maybe(0.6))
      val sets: Seq[Seq[String]] = (Seq(Seq(c1, c2)) ++ mids) :+ Seq.empty
      val setsSql = sets.map(s => s"(${s.mkString(", ")})").mkString(", ")
      def sql(duck: Boolean) = {
        val sumSql =
          if (duck) s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($v AS DECIMAL(18,2))) AS DOUBLE)"
        s"SELECT COALESCE($c1, '~~') AS g1, COALESCE($c2, '~~') AS g2, " +
          s"CAST(grouping($c1) AS BIGINT) AS gi1, CAST(grouping($c2) AS BIGINT) AS gi2, " +
          s"count(*) AS n, $sumSql AS s FROM ${t.name} WHERE ${p.sql} " +
          s"GROUP BY GROUPING SETS ($setsSql) HAVING count(*) > 0 ORDER BY g1, g2, gi1, gi2"
      }
      val build = (s: SparkSession, dir: String) => {
        val base = Engine.t(s, dir, t.name).filter(p.cond)
        base.groupingSets(sets.map(_.map(col)), col(c1), col(c2))
          .agg(grouping(col(c1)).cast("long").as("gi1"),
            grouping(col(c2)).cast("long").as("gi2"),
            count(lit(1)).as("n"),
            sum(col(v).cast("decimal(18,2)")).cast("double").as("s"))
          .filter(col("n") > 0)
          .select(coalesce(col(c1), lit("~~")).as("g1"),
            coalesce(col(c2), lit("~~")).as("g2"),
            col("gi1"), col("gi2"), col("n"), col("s"))
          .orderBy("g1", "g2", "gi1", "gi2")
      }
      Generated(seed, "gsets", build, sql(false), sql(true))
    }

    // ---- explicit null-ordering surface (round 13) ------------------

    /** LEFT-join-produced NULLs flowing into an EXPLICIT `NULLS FIRST/
      * LAST` ordering — the spot where engine DEFAULTS genuinely
      * diverge (Spark sorts ASC NULLS FIRST, DuckDB ASC NULLS LAST), so
      * only the explicit form is portable and nothing else on the
      * surface exercises it. Sort sub-shape: ORDER BY covers every
      * output column (runScalar rule — remaining ties are identical
      * rows). Window sub-shape: rows tied on (rval, l.unique) share all
      * projected columns (shapeJoinWindow rule), so rk permutation
      * among ties is output-invariant. */
    def runNullOrder(): Generated = {
      val (l, r, lk, rk) = pick(joinEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val rval = pick(r.nums)
      val descOrd = maybe(0.5)
      val nullsFirst = maybe(0.5)
      val dirSql = (if (descOrd) "DESC" else "ASC") +
        (if (nullsFirst) " NULLS FIRST" else " NULLS LAST")
      val lead =
        (descOrd, nullsFirst) match {
          case (false, true) => col(rval).asc_nulls_first
          case (false, false) => col(rval).asc_nulls_last
          case (true, true) => col(rval).desc_nulls_first
          case (true, false) => col(rval).desc_nulls_last
        }
      if (maybe(0.5)) {
        // sort-limit sub-shape
        val n = 20 + rnd.nextInt(60)
        val outCols = (l.unique :+ rval).distinct
        val ordTail = l.unique.mkString(", ")
        val sql =
          s"SELECT ${outCols.mkString(", ")} FROM " +
            s"(SELECT * FROM ${l.name} WHERE ${pl.sql}) la LEFT JOIN " +
            s"(SELECT * FROM ${r.name} WHERE ${pr.sql}) ra ON $lk = $rk " +
            s"ORDER BY $rval $dirSql, $ordTail LIMIT $n"
        val build = (s: SparkSession, dir: String) => {
          val a = Engine.t(s, dir, l.name).filter(pl.cond)
          val b = Engine.t(s, dir, r.name).filter(pr.cond)
          a.join(b, a(lk) === b(rk), "left")
            .select(outCols.map(col): _*)
            .orderBy(lead +: l.unique.map(col(_).asc): _*)
            .limit(n)
        }
        Generated(seed, "nullord_sort", build, sql, sql)
      } else {
        // window sub-shape: rank over the nullable column
        val partCol = pick(l.cats.keys.toSeq.sorted match {
          case Nil => r.cats.keys.toSeq.sorted; case cs => cs
        })
        val n = 1 + rnd.nextInt(8)
        val outCols = (l.unique ++ Seq(partCol, rval)).distinct
        val ordSql = s"$rval $dirSql, ${l.unique.mkString(", ")}"
        val sql =
          s"SELECT ${outCols.mkString(", ")}, rk FROM (" +
            s"SELECT ${outCols.mkString(", ")}, row_number() OVER (PARTITION BY $partCol ORDER BY $ordSql) AS rk " +
            s"FROM (SELECT * FROM ${l.name} WHERE ${pl.sql}) la LEFT JOIN " +
            s"(SELECT * FROM ${r.name} WHERE ${pr.sql}) ra ON $lk = $rk) w " +
            s"WHERE rk <= $n ORDER BY ${outCols.mkString(", ")}, rk"
        val build = (s: SparkSession, dir: String) => {
          val a = Engine.t(s, dir, l.name).filter(pl.cond)
          val b = Engine.t(s, dir, r.name).filter(pr.cond)
          val w = Window.partitionBy(partCol)
            .orderBy(lead +: l.unique.map(col(_).asc): _*)
          a.join(b, a(lk) === b(rk), "left")
            .select(outCols.map(col): _*)
            .withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
            .orderBy((outCols :+ "rk").map(col): _*)
        }
        Generated(seed, "nullord_window", build, sql, sql)
      }
    }

    // ---- ASOF / LIMIT BY / WITH FILL surface (round 14) -------------

    /** ASOF-join plan (SURVEY §2 C6; VERDICT r13 #6 — the hand-
      * rewritten composite operators are exactly where a seed sweep
      * finds edge mismatches the single declared query can't): for
      * each probe row, the ONE build row with the greatest build-ts
      * satisfying the ts inequality. The build side is pre-aggregated
      * UNIQUE per (key, ts), so the ASOF pick is deterministic on both
      * engines; the result rolls up per probe category so output stays
      * bounded at any sf. Renderings genuinely diverge: DuckDB runs
      * its NATIVE `ASOF [LEFT] JOIN` operator, Spark runs the
      * union + carry-forward-window rewrite — production c6's O(n)
      * shape (NO join operator: a pairwise equi+range join enumerates
      * O(probe × build) rows per key — measured 26 s at sf0.01 before
      * this form — while the union touches each row once). Strictness
      * is encoded in the union SORT: build rows order before probe
      * rows at equal ts for `>=` (kind 0 < 1) and after for `>`
      * (kind 2 > 1), so the same 1-PRECEDING carry frame implements
      * both. Sub-shape encodes join type × strictness so all four
      * paths stay quota-pinned. */
    def runAsof(): Generated = {
      val (l, r, lk, rk) = pick(asofEdges)
      val (pl, pr) = (filterFor(l), filterFor(r))
      val lts = l.date.get
      val rts = r.date.get
      val rval = pick(r.nums)
      val leftOuter = maybe(0.5)
      val strict = maybe(0.4)
      val op = if (strict) ">" else ">="
      val buildKind = if (strict) 2 else 0
      val g = pick(l.cats.keys.toSeq.sorted)
      val shape = s"asof_${if (leftOuter) "left" else "inner"}_${if (strict) "gt" else "ge"}"
      val buildSql = s"(SELECT $rk AS bk, $rts AS bts, max($rval) AS bval " +
        s"FROM ${r.name} WHERE ${pr.sql} GROUP BY $rk, $rts) ba"
      def aggSql(duck: Boolean, bcol: String) = {
        val sumS =
          if (duck) s"CAST(CAST(sum(CAST($bcol AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($bcol AS DECIMAL(18,2))) AS DOUBLE)"
        s"count(*) AS n_rows, count($bcol) AS n_hit, $sumS AS s_bval"
      }
      val duckSql =
        s"SELECT $g AS g, ${aggSql(true, "bval")} FROM (SELECT * FROM ${l.name} WHERE ${pl.sql}) pa " +
          s"${if (leftOuter) "ASOF LEFT JOIN" else "ASOF JOIN"} $buildSql " +
          s"ON pa.$lk = ba.bk AND pa.$lts $op ba.bts GROUP BY $g ORDER BY $g"
      val sparkSql =
        s"SELECT g, ${aggSql(false, "bv")} FROM (" +
          s"SELECT g, kind, last_value(bval) IGNORE NULLS OVER (" +
          s"PARTITION BY k ORDER BY ts, kind ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bv " +
          s"FROM (SELECT bk AS k, bts AS ts, $buildKind AS kind, bval, CAST(NULL AS STRING) AS g FROM $buildSql " +
          s"UNION ALL SELECT $lk AS k, $lts AS ts, 1 AS kind, CAST(NULL AS DOUBLE) AS bval, $g AS g " +
          s"FROM ${l.name} WHERE ${pl.sql}) u) m " +
          s"WHERE kind = 1${if (leftOuter) "" else " AND bv IS NOT NULL"} GROUP BY g ORDER BY g"
      val build = (s: SparkSession, dir: String) => {
        val ba = Engine.t(s, dir, r.name).filter(pr.cond)
          .groupBy(col(rk).as("k"), col(rts).as("ts"))
          .agg(max(col(rval)).as("bval"))
          .select(col("k"), col("ts"), lit(buildKind).as("kind"), col("bval"),
            lit(null).cast("string").as("g"))
        val pa = Engine.t(s, dir, l.name).filter(pl.cond)
          .select(col(lk).as("k"), col(lts).as("ts"), lit(1).as("kind"),
            lit(null).cast("double").as("bval"), col(g).as("g"))
        val w = Window.partitionBy("k").orderBy(col("ts").asc, col("kind").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carried = ba.unionByName(pa)
          .withColumn("bv", last(col("bval"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
        (if (leftOuter) carried else carried.filter(col("bv").isNotNull))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_rows"), count(col("bv")).as("n_hit"),
            sum(col("bv").cast("decimal(18,2)")).cast("double").as("s_bval"))
          .orderBy(col("g"))
      }
      Generated(seed, shape, build, sparkSql, duckSql)
    }

    /** ClickHouse `LIMIT n [OFFSET o] BY g` plan (SURVEY §2 F4):
      * per-group top-n-from-offset over a total order (value dir +
      * unique-key tiebreak — no tie nondeterminism). Spark renders the
      * row_number subquery (which Catalyst plans as WindowGroupLimit —
      * partial per-task pruning ahead of the exchange, the scale
      * path); DuckDB renders its native QUALIFY clause, so the two
      * engines reach the same row set through different planner
      * features. Group is a category column or an integer modulus
      * (cast to BIGINT in all three renderings — engines must not
      * disagree on the modulus' width). */
    def runLimitBy(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val v = pick(t.nums)
      // shape decided AFTER the filter draws: java.util.Random's FIRST
      // draw is nearly constant across sequential seeds (the scrambled
      // seed's high bits creep), so a first-draw shape selector would
      // leave one sub-shape unreachable until seed ~4096; supplier has
      // no category columns and always takes the modulus group.
      val modShape = t.cats.isEmpty || maybe(0.4)
      val descOrd = maybe(0.7)
      val n = 1 + rnd.nextInt(4)
      val off = if (maybe(0.4)) 1 + rnd.nextInt(2) else 0
      val (gSql, gCol, shape) =
        if (modShape) {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"), "limitby_mod")
        } else {
          val c = pick(t.cats.keys.toSeq.sorted)
          (c, col(c), "limitby_cat")
        }
      val dirSql = if (descOrd) "DESC" else "ASC"
      val uk = t.unique.mkString(", ")
      val outCols = (t.unique :+ v).distinct
      val lo = off + 1; val hi = off + n
      val sparkSql =
        s"SELECT g, ${outCols.mkString(", ")}, rn FROM (" +
          s"SELECT $gSql AS g, ${outCols.mkString(", ")}, " +
          s"row_number() OVER (PARTITION BY $gSql ORDER BY $v $dirSql, $uk) AS rn " +
          s"FROM ${t.name} WHERE ${p.sql}) " +
          s"WHERE rn BETWEEN $lo AND $hi ORDER BY g, rn"
      val duckSql =
        s"SELECT $gSql AS g, ${outCols.mkString(", ")}, " +
          s"row_number() OVER (PARTITION BY $gSql ORDER BY $v $dirSql, $uk) AS rn " +
          s"FROM ${t.name} WHERE ${p.sql} " +
          s"QUALIFY rn BETWEEN $lo AND $hi ORDER BY g, rn"
      val build = (s: SparkSession, dir: String) => {
        val lead = if (descOrd) col(v).desc else col(v).asc
        val w = Window.partitionBy(gCol).orderBy(lead +: t.unique.map(col(_).asc): _*)
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("g", gCol)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn").between(lo, hi))
          .select((("g" +: outCols) :+ "rn").map(col): _*)
          .orderBy(col("g"), col("rn"))
      }
      Generated(seed, shape, build, sparkSql, duckSql)
    }

    /** ClickHouse `ORDER BY … WITH FILL FROM lo TO hi STEP s` plan
      * (SURVEY §2 F5): gap-filling over an integer bucket spine —
      * missing buckets materialize as zero/NULL rows. Spark renders
      * the spine as `explode(sequence(...))` (the declared f5's
      * composite shape), DuckDB as its `generate_series` table
      * function — structurally different constructions that must agree
      * row-for-row, including the filled-vs-present boundary and the
      * STEP-skipped buckets. Bucket floors run double-division-then-
      * floor, identical IEEE arithmetic on both engines. */
    def runWithFill(): Generated = {
      val candidates = Seq(
        (lineitem, "l_quantity", Seq(5, 10)),
        (orders, "o_totalprice", Seq(25000, 50000)),
        (part, "p_size", Seq(5, 10)),
        (customer, "c_acctbal", Seq(1000, 2000)))
      val (t, c, widths) = pick(candidates)
      val p = filterFor(t)
      val v = pick(t.nums)
      val w = pick(widths)
      val (dLo, dHi) = numDomain.getOrElse(c, (1.0, 50.0))
      val bLo = math.floor(dLo / w).toLong
      val bHi = math.floor(dHi / w).toLong
      val step = if (maybe(0.25)) 2L else 1L
      val fillZero = maybe(0.6)
      val shape = if (fillZero) "fill_zero" else "fill_null"
      def aggSub(duck: Boolean) = {
        val sumS =
          if (duck) s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
          else s"CAST(sum(CAST($v AS DECIMAL(18,2))) AS DOUBLE)"
        s"(SELECT CAST(floor($c / $w) AS BIGINT) AS ab, count(*) AS an, $sumS AS asum " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1) ag"
      }
      val outSel =
        if (fillZero) "CAST(coalesce(an, 0) AS BIGINT) AS n, coalesce(asum, 0.0) AS s"
        else "an AS n, asum AS s"
      val sparkSql =
        s"SELECT sp.b AS b, $outSel FROM " +
          s"(SELECT explode(sequence(CAST($bLo AS BIGINT), CAST($bHi AS BIGINT), CAST($step AS BIGINT))) AS b) sp " +
          s"LEFT JOIN ${aggSub(false)} ON sp.b = ag.ab ORDER BY b"
      val duckSql =
        s"SELECT sp.b AS b, $outSel FROM " +
          s"(SELECT CAST(generate_series AS BIGINT) AS b FROM generate_series($bLo, $bHi, $step)) sp " +
          s"LEFT JOIN ${aggSub(true)} ON sp.b = ag.ab ORDER BY b"
      val build = (s: SparkSession, dir: String) => {
        val ag = Engine.t(s, dir, t.name).filter(p.cond)
          .groupBy(floor(col(c) / w).cast("long").as("ab"))
          .agg(count(lit(1)).as("an"),
            sum(col(v).cast("decimal(18,2)")).cast("double").as("asum"))
        val sp = s.range(bLo, bHi + 1, step).select(col("id").as("b"))
        val joined = sp.join(ag, sp("b") === ag("ab"), "left")
        val (nC, sC) =
          if (fillZero) (coalesce(col("an"), lit(0L)).as("n"), coalesce(col("asum"), lit(0.0)).as("s"))
          else (col("an").as("n"), col("asum").as("s"))
        joined.select(col("b"), nC, sC).orderBy("b")
      }
      Generated(seed, shape, build, sparkSql, duckSql)
    }

    /** Window-predicate (QUALIFY) plan — the three window-filter paths
      * the LIMIT BY family does NOT cover (that one is row_number over
      * a UNIQUE order, ties impossible by construction):
      *
      *  - `qualify_rank`: rank()/dense_rank() ≤ k over a NON-unique
      *    value order, so tie groups genuinely straddle the threshold —
      *    Catalyst's WindowGroupLimit rewrite must keep every tied row
      *    that row_number-style pruning would cut;
      *  - `qualify_cnt`: an aggregate-over-partition predicate
      *    (count(*)/decimal-sum OVER (PARTITION BY g) vs a threshold) —
      *    the unbounded-frame WindowExec path, no group-limit rewrite
      *    exists for it;
      *  - `qualify_lag`: a lag-comparison predicate (v vs lag(v) in
      *    unique-key-then-value order) — the first row of every
      *    partition has a NULL lag, so the predicate's NULL row-drop
      *    must agree. The window order appends v AFTER the "unique"
      *    key because lineitem's (l_orderkey, l_linenumber) is NOT
      *    actually unique in the synthetic data (~20% of keys
      *    duplicated — the same pitfall lines 470-475 handle by
      *    projection): with v as the final tiebreak, rows still tied
      *    are identical in (partition, order, v), so any permutation
      *    among them yields the same (v, lag(v)) pair multiset and
      *    the qualifying row set stays engine-deterministic. A
      *    150-seed sweep WITHOUT the tiebreak diverged on exactly 4
      *    seeds, all lag-shape on lineitem, all one tied pair apart.
      *
      * DuckDB renders its native QUALIFY clause; Spark renders the
      * subquery + WHERE rewrite (there is no QUALIFY in Spark SQL), so
      * the differential pins two different implementations of the same
      * semantics. Each plan ends in a per-group rollup (count + exact
      * BIGINT sum of a unique key + min/max of the value column): the
      * rollup fingerprints the qualifying ROW SET exactly while keeping
      * the output O(groups) at any scale — the qualifying set itself
      * can be a constant fraction of the table. */
    def runQualify(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val vc = pick(t.nums)
      // shape decided AFTER the table/filter/value draws (the limitby
      // first-draw-constancy pitfall: java.util.Random's first draw is
      // nearly constant across sequential seeds)
      val modShape = t.cats.isEmpty || maybe(0.4)
      val (gSql, gCol) =
        if (modShape) {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
        } else {
          val c = pick(t.cats.keys.toSeq.sorted)
          (c, col(c))
        }
      val u1 = t.unique.head
      val uk = t.unique.mkString(", ")
      val rollSparkSql =
        s"SELECT g, count(*) AS n, sum($u1) AS su, min(v) AS mn, max(v) AS mx"
      val rollDuckSql =
        s"SELECT g, count(*) AS n, CAST(sum($u1) AS BIGINT) AS su, min(v) AS mn, max(v) AS mx"
      def rollup(df: DataFrame): DataFrame =
        df.groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
          .orderBy("g")
      val base = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("g", gCol).withColumn("v", col(vc))
      rnd.nextInt(3) match {
        case 0 =>
          val dense = maybe(0.5)
          val desc = maybe(0.6)
          val k = 1 + rnd.nextInt(3)
          val fnSql = if (dense) "dense_rank()" else "rank()"
          val dirSql = if (desc) "DESC" else "ASC"
          val winSql = s"$fnSql OVER (PARTITION BY $gSql ORDER BY $vc $dirSql)"
          val sparkSql =
            s"$rollSparkSql FROM (" +
              s"SELECT g, $u1, v FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v, $winSql AS rk " +
              s"FROM ${t.name} WHERE ${p.sql}) WHERE rk <= $k) " +
              s"GROUP BY g ORDER BY g"
          val duckSql =
            s"$rollDuckSql FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v FROM ${t.name} WHERE ${p.sql} " +
              s"QUALIFY $winSql <= $k) " +
              s"GROUP BY g ORDER BY g"
          val build = (s: SparkSession, dir: String) => {
            val w = Window.partitionBy(col("g"))
              .orderBy(if (desc) col("v").desc else col("v").asc)
            val fn = if (dense) dense_rank() else rank()
            rollup(base(s, dir).withColumn("rk", fn.over(w))
              .filter(col("rk") <= k))
          }
          Generated(seed, "qualify_rank", build, sparkSql, duckSql)
        case 1 =>
          val useSum = maybe(0.4)
          val ge = maybe(0.6)
          val opSql = if (ge) ">=" else "<"
          val (winSql, winCol, thrSql) =
            if (useSum) {
              val (lo, hi) = numDomain.getOrElse(vc, (1.0, 1000.0))
              // plausible group-total threshold: mid-domain value × a
              // group-size factor, rendered with exactly 2 decimals so
              // both parsers read the same DECIMAL literal
              val thr = math.rint((lo + hi) * (5 + rnd.nextInt(200)) * 100) / 100
              (s"sum(CAST($vc AS DECIMAL(18,2))) OVER (PARTITION BY $gSql)",
                sum(col(vc).cast("decimal(18,2)"))
                  .over(Window.partitionBy(col("g"))),
                f"$thr%.2f")
            } else {
              val k = 2 + rnd.nextInt(63)
              ("count(*) OVER (PARTITION BY " + gSql + ")",
                count(lit(1)).over(Window.partitionBy(col("g"))),
                k.toString)
            }
          val sparkSql =
            s"$rollSparkSql FROM (" +
              s"SELECT g, $u1, v FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v, $winSql AS wv " +
              s"FROM ${t.name} WHERE ${p.sql}) WHERE wv $opSql $thrSql) " +
              s"GROUP BY g ORDER BY g"
          val duckSql =
            s"$rollDuckSql FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v FROM ${t.name} WHERE ${p.sql} " +
              s"QUALIFY $winSql $opSql $thrSql) " +
              s"GROUP BY g ORDER BY g"
          val build = (s: SparkSession, dir: String) => {
            val wv = winCol
            val thr = expr(thrSql)
            rollup(base(s, dir).withColumn("wv", wv)
              .filter(if (ge) col("wv") >= thr else col("wv") < thr))
          }
          Generated(seed, "qualify_cnt", build, sparkSql, duckSql)
        case _ =>
          val gt = maybe(0.5)
          val cmpSql = if (gt) ">" else "<"
          val winSql = s"lag($vc) OVER (PARTITION BY $gSql ORDER BY $uk, $vc)"
          val sparkSql =
            s"$rollSparkSql FROM (" +
              s"SELECT g, $u1, v FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v, $winSql AS pv " +
              s"FROM ${t.name} WHERE ${p.sql}) WHERE v $cmpSql pv) " +
              s"GROUP BY g ORDER BY g"
          val duckSql =
            s"$rollDuckSql FROM (" +
              s"SELECT $gSql AS g, $u1, $vc AS v FROM ${t.name} WHERE ${p.sql} " +
              s"QUALIFY $vc $cmpSql $winSql) " +
              s"GROUP BY g ORDER BY g"
          val build = (s: SparkSession, dir: String) => {
            val w = Window.partitionBy(col("g"))
              .orderBy(t.unique.map(col(_).asc) :+ col("v").asc: _*)
            val withPv = base(s, dir).withColumn("pv", lag(col("v"), 1).over(w))
            rollup(withPv.filter(
              if (gt) col("v") > col("pv") else col("v") < col("pv")))
          }
          Generated(seed, "qualify_lag", build, sparkSql, duckSql)
      }
    }

    /** Array-aggregation plan (ClickHouse groupArray/groupUniqArray
      * territory, SURVEY D9) — collect per group, then canonicalize
      * and probe the ARRAY ITSELF: sort, distinct, prefix slice,
      * positional index. collect_list order is nondeterministic by
      * contract, so every rendering canonicalizes through a full sort
      * before anything observable; presentation is the d9 precedent —
      * a comma-joined string (array_join / array_to_string) plus
      * BIGINT scalars — because the cross-engine gate has only ever
      * certified scalar cells (DuckDB lists arrive as arrow lists the
      * driver's type-sensitive hash has no precedent for). Sorted
      * element values render identically as strings on both engines
      * for INTEGER and VARCHAR payloads — the two payload pools this
      * family draws from (decimals are excluded: '5.0' vs '5.00'
      * formatting is a dialect artifact, not semantics). Per-group
      * state is O(group size) — inherent to the operator under test
      * (the reason production d9 bounds its groups); the fuzz tables'
      * group counts bound it here.
      *
      *  - `arr_prefix`: first k of the sorted value list + count;
      *  - `arr_distinct`: sorted DISTINCT prefix + distinct count
      *    (list_distinct vs array_distinct, then sort — dedup order
      *    must not leak);
      *  - `arr_nth`: the k-th smallest element as a BIGINT scalar,
      *    via try_element_at — Spark 4's ANSI element_at THROWS on
      *    out-of-bounds where DuckDB's list[k] returns NULL, so the
      *    try_ variant is the only rendering with shared semantics
      *    (groups smaller than k pin that null path). */
    def runArrAgg(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val u1 = t.unique.head
      val modShape = t.cats.isEmpty || maybe(0.4)
      val (gSql, gCol) =
        if (modShape) {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
        } else {
          val c = pick(t.cats.keys.toSeq.sorted)
          (c, col(c))
        }
      // string payload pool excludes the grouping column itself (a
      // cat-shape g over a single-cat table would otherwise leave
      // nothing to pick and crash the draw)
      val strPool = t.cats.keys.toSeq.sorted.filterNot(c => !modShape && c == gSql)
      val useStr = strPool.nonEmpty && maybe(0.4)
      val vc = if (useStr) pick(strPool) else pick(t.ints)
      val k = 2 + rnd.nextInt(3)
      def gen(shape: String, sparkAgg: String, duckAgg: String,
          build: (SparkSession, String) => DataFrame) = Generated(seed, shape,
        build,
        s"SELECT $gSql AS g, $sparkAgg, count(*) AS n FROM ${t.name} " +
          s"WHERE ${p.sql} GROUP BY $gSql ORDER BY g",
        s"SELECT $gSql AS g, $duckAgg, CAST(count(*) AS BIGINT) AS n FROM ${t.name} " +
          s"WHERE ${p.sql} GROUP BY $gSql ORDER BY g")
      val base = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond).withColumn("g", gCol)
      rnd.nextInt(3) match {
        case 0 =>
          gen("arr_prefix",
            s"array_join(slice(array_sort(collect_list($vc)), 1, $k), ',') AS s",
            s"array_to_string((list_sort(list($vc)))[1:$k], ',') AS s",
            (s, dir) => base(s, dir).groupBy("g")
              .agg(array_join(slice(array_sort(collect_list(col(vc))), 1, k), ",").as("s"),
                count(lit(1)).as("n"))
              .orderBy("g"))
        case 1 =>
          gen("arr_distinct",
            s"array_join(slice(array_sort(array_distinct(collect_list($vc))), 1, $k), ',') AS s, " +
              s"CAST(size(array_distinct(collect_list($vc))) AS BIGINT) AS nd",
            s"array_to_string((list_sort(list_distinct(list($vc))))[1:$k], ',') AS s, " +
              s"CAST(len(list_distinct(list($vc))) AS BIGINT) AS nd",
            (s, dir) => base(s, dir).groupBy("g")
              .agg(array_join(slice(array_sort(array_distinct(collect_list(col(vc)))), 1, k), ",").as("s"),
                size(array_distinct(collect_list(col(vc)))).cast("long").as("nd"),
                count(lit(1)).as("n"))
              .select("g", "s", "nd", "n")
              .orderBy("g"))
        case _ =>
          // k-th smallest of the UNIQUE key (never a string): groups
          // with fewer than k rows exercise the engine-shared
          // out-of-bounds → NULL contract
          gen("arr_nth",
            s"CAST(try_element_at(array_sort(collect_list($u1)), $k) AS BIGINT) AS nth",
            s"CAST((list_sort(list($u1)))[$k] AS BIGINT) AS nth",
            (s, dir) => base(s, dir).groupBy("g")
              .agg(call_function("try_element_at", array_sort(collect_list(col(u1))), lit(k)).cast("long").as("nth"),
                count(lit(1)).as("n"))
              .orderBy("g"))
      }
    }

    /** Time-bucketing plan — the calendar dimension every OLAP rollup
      * lives on, over the shapes whose cross-engine semantics are
      * provably stable:
      *
      *  - `tb_trunc`: GROUP BY CAST(date_trunc(part, d) AS DATE) for
      *    part ∈ {month, quarter, week} — both engines take the part
      *    argument FIRST and truncate week to Monday (ISO), and the
      *    DATE cast normalizes Spark's tz-aware timestamp vs DuckDB's
      *    naive one to the same arrow date32;
      *  - `tb_parts`: GROUP BY (EXTRACT(YEAR), EXTRACT(MONTH|QUARTER))
      *    — pure integer calendar parts, CAST to BIGINT on both sides
      *    (DuckDB extracts BIGINT, Spark INT — the driver's hash is
      *    type-sensitive);
      *  - `tb_dom`: GROUP BY EXTRACT(DAY) % m — the day-of-month
      *    modulus bucketing shape (h15's calendar sibling). Dow is
      *    deliberately EXCLUDED: Spark's dayofweek is 1=Sunday,
      *    DuckDB's 0=Sunday — a genuine dialect divergence, not a
      *    semantics bug to differential-test.
      *
      * Rollup fingerprint: count + exact BIGINT sum of the unique key
      * per bucket, O(calendar buckets) output at any scale. */
    def runTimeBucket(): Generated = {
      val withDate = singles.filter(_.date.isDefined)
      val t = pick(withDate)
      val p = filterFor(t)
      val d = t.date.get
      val u1 = t.unique.head
      def out(bSql: Seq[(String, String)], duck: Boolean) = {
        val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
        val bs = bSql.map { case (e, n) => s"$e AS $n" }.mkString(", ")
        val ns = bSql.map(_._2).mkString(", ")
        s"SELECT $bs, count(*) AS n, $sumS AS su " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY $ns ORDER BY $ns"
      }
      def build(bCols: Seq[(Column, String)]): (SparkSession, String) => DataFrame =
        (s: SparkSession, dir: String) => {
          val withB = bCols.foldLeft(Engine.t(s, dir, t.name).filter(p.cond)) {
            case (df, (c, n)) => df.withColumn(n, c)
          }
          withB.groupBy(bCols.map(b => col(b._2)): _*)
            .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
            .orderBy(bCols.map(b => col(b._2)): _*)
        }
      rnd.nextInt(3) match {
        case 0 =>
          val part = pick(Seq("month", "quarter", "week"))
          val e = s"CAST(date_trunc('$part', $d) AS DATE)"
          val c = date_trunc(part, col(d)).cast("date")
          Generated(seed, "tb_trunc", build(Seq(c -> "b")),
            out(Seq(e -> "b"), duck = false), out(Seq(e -> "b"), duck = true))
        case 1 =>
          val (sub, fn) =
            if (maybe(0.5)) ("MONTH", (x: Column) => month(x))
            else ("QUARTER", (x: Column) => quarter(x))
          val es = Seq(
            s"CAST(EXTRACT(YEAR FROM $d) AS BIGINT)" -> "y",
            s"CAST(EXTRACT($sub FROM $d) AS BIGINT)" -> "m")
          val cs = Seq(
            year(col(d)).cast("long") -> "y",
            fn(col(d)).cast("long") -> "m")
          Generated(seed, "tb_parts", build(cs),
            out(es, duck = false), out(es, duck = true))
        case _ =>
          val m = 2 + rnd.nextInt(9)
          val e = s"CAST(EXTRACT(DAY FROM $d) AS BIGINT) % $m"
          val c = (dayofmonth(col(d)).cast("long") % m)
          Generated(seed, "tb_dom", build(Seq(c -> "b")),
            out(Seq(e -> "b"), duck = false), out(Seq(e -> "b"), duck = true))
      }
    }

    /** Distribution window-function plan (ntile / percent_rank /
      * cume_dist) — the tile-assignment semantics family behind the
      * production e15 RFM quartiles and the custom DistRank operator
      * (`ops/DistRank.scala`): both engines must agree on how rows
      * land in buckets, not just on rank order.
      *
      *  - `dist_ntile`: ntile(k) over a TOTAL order (value dir, then
      *    the unique key) — the remainder rule (first `n mod k` tiles
      *    get the extra row) must match. The order appends the unique
      *    key so tile assignment is positionally deterministic; rows
      *    still tied (lineitem's duplicated keys with equal v) are
      *    identical in the rollup projection (same u1, same v), so a
      *    boundary swap between them moves identical contributions.
      *  - `dist_prank`: percent_rank bucketed by floor(pr*10) — pr is
      *    tie-AWARE ((rank-1)/(n-1), single-row partition → 0.0 on
      *    both engines, probed before this family was written), so no
      *    tiebreak is needed: every row's pr is order-independent.
      *    Both engines evaluate the same exact IEEE division, then
      *    the same multiply and floor — bucket edges cannot drift.
      *  - `dist_cume`: cume_dist bucketed by floor(cd*5) — peers
      *    share cd = peers≤v / n, same determinism argument; cd = 1.0
      *    rows land in the closed top bucket 5.
      *
      * The rollup fingerprints (g, bucket) → count + exact sum of the
      * unique key + min/max(v): O(groups × buckets) output at any
      * scale. Both engines run the SAME SQL text modulo the BIGINT
      * sum cast (DuckDB sums int32 into HUGEINT, which arrives as
      * arrow decimal128 and hard-fails the type gate). */
    def runDistWin(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val vc = pick(t.nums)
      val modShape = t.cats.isEmpty || maybe(0.4)
      val (gSql, gCol) =
        if (modShape) {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
        } else {
          val c = pick(t.cats.keys.toSeq.sorted)
          (c, col(c))
        }
      val u1 = t.unique.head
      val uk = t.unique.mkString(", ")
      val desc = maybe(0.5)
      val dirSql = if (desc) "DESC" else "ASC"
      val vOrd = if (desc) col("v").desc else col("v").asc
      def outSql(winSql: String, bSql: String, duck: Boolean) = {
        val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
        s"SELECT g, b, count(*) AS n, $sumS AS su, min(v) AS mn, max(v) AS mx " +
          s"FROM (SELECT $gSql AS g, $u1, $vc AS v, $bSql AS b " +
          s"FROM (SELECT *, $winSql AS wv FROM ${t.name} WHERE ${p.sql})) " +
          s"GROUP BY g, b ORDER BY g, b"
      }
      def rollup(df: DataFrame, b: Column): DataFrame =
        df.withColumn("b", b)
          .groupBy("g", "b")
          .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
          .orderBy("g", "b")
      val base = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("g", gCol).withColumn("v", col(vc))
      rnd.nextInt(3) match {
        case 0 =>
          val k = 2 + rnd.nextInt(7)
          val winSql = s"ntile($k) OVER (PARTITION BY $gSql ORDER BY $vc $dirSql, $uk)"
          val bSql = "wv"
          val build = (s: SparkSession, dir: String) => {
            val w = Window.partitionBy(col("g"))
              .orderBy(vOrd +: t.unique.map(col(_).asc): _*)
            rollup(base(s, dir).withColumn("wv", ntile(k).over(w)), col("wv"))
          }
          Generated(seed, "dist_ntile", build,
            outSql(winSql, bSql, duck = false), outSql(winSql, bSql, duck = true))
        case 1 =>
          val winSql = s"percent_rank() OVER (PARTITION BY $gSql ORDER BY $vc $dirSql)"
          val bSql = "CAST(floor(wv * 10) AS BIGINT)"
          val build = (s: SparkSession, dir: String) => {
            val w = Window.partitionBy(col("g")).orderBy(vOrd)
            rollup(base(s, dir).withColumn("wv", percent_rank().over(w)),
              floor(col("wv") * 10).cast("long"))
          }
          Generated(seed, "dist_prank", build,
            outSql(winSql, bSql, duck = false), outSql(winSql, bSql, duck = true))
        case _ =>
          val winSql = s"cume_dist() OVER (PARTITION BY $gSql ORDER BY $vc $dirSql)"
          val bSql = "CAST(floor(wv * 5) AS BIGINT)"
          val build = (s: SparkSession, dir: String) => {
            val w = Window.partitionBy(col("g")).orderBy(vOrd)
            rollup(base(s, dir).withColumn("wv", cume_dist().over(w)),
              floor(col("wv") * 5).cast("long"))
          }
          Generated(seed, "dist_cume", build,
            outSql(winSql, bSql, duck = false), outSql(winSql, bSql, duck = true))
      }
    }

    /** JOIN USING plan (round 15) — the duplicate-column-elimination
      * resolution path no ON-clause family touches: USING (k) emits a
      * SINGLE k column, and the DataFrame build goes through the
      * usingColumns overload (`join(b, Seq("k"), how)`), Spark SQL
      * through the parser's UsingJoin, DuckDB through its own USING —
      * three distinct front doors to the same join.
      *
      *  - `using_inner` / `using_left`: an equi-edge with both keys
      *    RENAMED to the common name in subqueries; LEFT keeps k from
      *    the non-null probe side on all three paths, and the right
      *    payload flows through the established null-safe aggregates;
      *  - `using_multi`: a lineitem self-join USING BOTH "unique"
      *    columns — the synthetic data duplicates ~20% of
      *    (l_orderkey, l_linenumber) pairs, so multi-column USING
      *    multiplicities are exercised for real. */
    def runUsing(): Generated = {
      // first-draw seed bias (the runChain3 note): maybe()'s first
      // nextDouble on a fresh Random is nearly constant across
      // sequential seeds — 100 seeds all landed on one branch. A
      // non-power-of-2 nextInt mixes.
      if (rnd.nextInt(6) < 4) {
        val (l, r, lk, rk) = pick(joinEdges)
        val (pl, pr) = (filterFor(l), filterFor(r))
        val left = maybe(0.5)
        val jt = if (left) "LEFT JOIN" else "JOIN"
        val (gSql, gCol) =
          if (l.cats.nonEmpty) { val c = pick(l.cats.keys.toSeq.sorted); (c, col(c)) }
          else { val c = pick(l.ints); val m = 3 + rnd.nextInt(8)
            (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long")) }
        val rnum = pick(r.nums)
        val agg = nullAggFor(rnum, "agg0")
        def sql(duck: Boolean) =
          s"SELECT g, count(*) AS cnt, ${if (duck) agg.duckSql else agg.sparkSql} FROM " +
            s"(SELECT $lk AS k, $gSql AS g FROM ${l.name} WHERE ${pl.sql}) la " +
            s"$jt (SELECT $rk AS k, $rnum FROM ${r.name} WHERE ${pr.sql}) ra USING (k) " +
            s"GROUP BY g ORDER BY g"
        val build = (s: SparkSession, dir: String) => {
          val la = Engine.t(s, dir, l.name).filter(pl.cond)
            .select(col(lk).as("k"), gCol.as("g"))
          val ra = Engine.t(s, dir, r.name).filter(pr.cond)
            .select(col(rk).as("k"), col(rnum))
          la.join(ra, Seq("k"), if (left) "left" else "inner")
            .groupBy("g").agg(count(lit(1)).as("cnt"), agg.dfCol)
            .orderBy("g")
        }
        Generated(seed, if (left) "using_left" else "using_inner",
          build, sql(false), sql(true))
      } else {
        val (p1, p2) = (filterFor(lineitem), filterFor(lineitem))
        val gSql = "l_returnflag"
        def sql(duck: Boolean) = {
          val sumS =
            if (duck) "CAST(CAST(sum(CAST(q2 AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
            else "CAST(sum(CAST(q2 AS DECIMAL(18,2))) AS DOUBLE)"
          s"SELECT $gSql, count(*) AS cnt, $sumS AS agg0 FROM " +
            s"(SELECT l_orderkey, l_linenumber, $gSql FROM lineitem WHERE ${p1.sql}) la " +
            s"JOIN (SELECT l_orderkey, l_linenumber, l_quantity AS q2 FROM lineitem " +
            s"WHERE ${p2.sql}) lb USING (l_orderkey, l_linenumber) " +
            s"GROUP BY $gSql ORDER BY $gSql"
        }
        val build = (s: SparkSession, dir: String) => {
          val la = Engine.t(s, dir, "lineitem").filter(p1.cond)
            .select(col("l_orderkey"), col("l_linenumber"), col(gSql))
          val lb = Engine.t(s, dir, "lineitem").filter(p2.cond)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").as("q2"))
          la.join(lb, Seq("l_orderkey", "l_linenumber"), "inner")
            .groupBy(gSql)
            .agg(count(lit(1)).as("cnt"),
              sum(col("q2").cast("decimal(18,2)")).cast("double").as("agg0"))
            .orderBy(gSql)
        }
        Generated(seed, "using_multi", build, sql(false), sql(true))
      }
    }

    /** Date-arithmetic plan (round 15) — the calendar-SHIFT surface
      * the time-bucket family never touches (it only truncates and
      * extracts the raw column). Cross-engine-stable shapes:
      *
      *  - `da_shift`: GROUP BY CAST(date_trunc('month', d + INTERVAL
      *    k DAY) AS DATE) — both engines take the part first and add
      *    day intervals identically; the DATE cast normalizes the tz
      *    story exactly as tb_trunc does;
      *  - `da_diff`: whole-day difference to a fixed anchor, shifted
      *    positive before the modulus bucket (Spark and DuckDB both
      *    truncate integer % toward the dividend's sign — keeping the
      *    operand non-negative sidesteps the question entirely);
      *    Spark datediff(end, start) ≡ DuckDB datediff('day', start,
      *    end), arguments swapped by dialect;
      *  - `da_last`: GROUP BY last_day(CAST(d AS DATE)) — month-end
      *    normalization, a DATE on both engines.
      *
      * Rollup fingerprint: count + exact BIGINT key sum per bucket,
      * O(calendar buckets) output at any scale. */
    def runDateArith(): Generated = {
      val withDate = singles.filter(_.date.isDefined)
      val t = pick(withDate)
      val p = filterFor(t)
      val d = t.date.get
      val u1 = t.unique.head
      def out(bSpark: String, bDuck: String, duck: Boolean) = {
        val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
        val b = if (duck) bDuck else bSpark
        s"SELECT $b AS bkt, count(*) AS n, $sumS AS su " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY $b ORDER BY bkt"
      }
      def build(bCol: Column): (SparkSession, String) => DataFrame =
        (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .withColumn("bkt", bCol)
            .groupBy("bkt")
            .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
            .orderBy("bkt")
      rnd.nextInt(3) match {
        case 0 =>
          val k = 1 + rnd.nextInt(45)
          val e = s"CAST(date_trunc('month', $d + INTERVAL $k DAY) AS DATE)"
          Generated(seed, "da_shift", build(
            date_trunc("month", col(d) + expr(s"INTERVAL $k DAY")).cast("date")),
            out(e, e, duck = false), out(e, e, duck = true))
        case 1 =>
          val m = 3 + rnd.nextInt(8)
          // anchor predates the data's 1992+ date domain, so the
          // difference is non-negative before the shift-free modulus
          val anchor = "1990-01-01"
          val eS = s"CAST(datediff(CAST($d AS DATE), DATE '$anchor') % $m AS BIGINT)"
          val eD = s"CAST(datediff('day', DATE '$anchor', CAST($d AS DATE)) % $m AS BIGINT)"
          Generated(seed, "da_diff", build(
            (datediff(col(d).cast("date"), lit(anchor).cast("date")) % m).cast("long")),
            out(eS, eD, duck = false), out(eS, eD, duck = true))
        case _ =>
          val e = s"last_day(CAST($d AS DATE))"
          Generated(seed, "da_last", build(last_day(col(d).cast("date"))),
            out(e, e, duck = false), out(e, e, duck = true))
      }
    }

    /** PIVOT plan (round 15) — three genuinely different constructions
      * of one contingency rollup: Spark SQL's PIVOT clause (its own
      * parser + RewritePivot path), `RelationalGroupedDataset.pivot`
      * with an EXPLICIT value list (the DataFrame path — explicit so
      * no distinct-value collect job runs, the only pivot shape that
      * survives 100 TB), and a manual CASE-per-value rollup on DuckDB.
      *
      * Cross-engine rules:
      *  - pivot values come from the clean single-token cat domains
      *    only (o_orderpriority excluded — '1-URGENT' is not
      *    identifier-safe as a pivot output column);
      *  - `pivot_sum` sums via DECIMAL(18,2) and exits DOUBLE through
      *    an OUTER cast (Spark's PIVOT clause wants a bare aggregate),
      *    VARCHAR-bridged on DuckDB as usual;
      *  - `pivot_cnt` renders the DuckDB leg as sum(CASE WHEN..1 END),
      *    NOT count(CASE..) — count gives 0 where PIVOT gives NULL for
      *    an absent (group, value) combo;
      *  - output columns are renamed v0..vk by position, so the
      *    driver's sorted-column hash never sees the engine-specific
      *    spelling of a value-derived column name. */
    def runPivot(): Generated = {
      val cands = singles.filter(t => t.cats.keys.exists(_ != "o_orderpriority"))
      val t = pick(cands)
      val p = filterFor(t)
      val pc = pick(t.cats.keys.toSeq.filter(_ != "o_orderpriority").sorted)
      val dom = t.cats(pc)
      val nVals = 2 + rnd.nextInt(math.min(3, dom.size - 1))
      val vals = rnd.shuffle(dom).take(nVals).sorted
      val otherCats = t.cats.keys.toSeq.filterNot(_ == pc).sorted
      val modShape = otherCats.isEmpty || maybe(0.5)
      val (gSql, gCol) =
        if (modShape) {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
        } else {
          val c = pick(otherCats)
          (c, col(c))
        }
      val vc = pick(t.nums)
      val doSum = maybe(0.5)
      val inList = vals.map(v => s"'$v'").mkString(", ")
      val (shape, pivotAgg, outCast, duckAgg, dfAgg, dfCast) =
        if (doSum) ("pivot_sum",
          "sum(v)", "DOUBLE",
          (v: String) => s"CAST(CAST(sum(CASE WHEN $pc = '$v' THEN CAST($vc AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)",
          sum(col("v")), "double")
        else ("pivot_cnt",
          "count(v)", "BIGINT",
          (v: String) => s"CAST(sum(CASE WHEN $pc = '$v' THEN 1 END) AS BIGINT)",
          count(col("v")), "long")
      val outCols = vals.zipWithIndex
        .map { case (v, i) => s"CAST(`$v` AS $outCast) AS v$i" }.mkString(", ")
      val sparkSql =
        s"SELECT g, $outCols FROM (SELECT $gSql AS g, $pc, " +
          s"CAST($vc AS DECIMAL(18,2)) AS v FROM ${t.name} WHERE ${p.sql}) " +
          s"PIVOT ($pivotAgg FOR $pc IN ($inList)) ORDER BY g"
      val duckSql =
        s"SELECT $gSql AS g, " +
          vals.zipWithIndex.map { case (v, i) => s"${duckAgg(v)} AS v$i" }.mkString(", ") +
          s" FROM ${t.name} WHERE ${p.sql} GROUP BY $gSql ORDER BY g"
      val build = (s: SparkSession, dir: String) => {
        val pvt = Engine.t(s, dir, t.name).filter(p.cond)
          .select(gCol.as("g"), col(pc), col(vc).cast("decimal(18,2)").as("v"))
          .groupBy("g").pivot(pc, vals).agg(dfAgg)
        pvt.select(col("g") +: vals.zipWithIndex.map { case (v, i) =>
          pvt(v).cast(dfCast).as(s"v$i") }: _*)
          .orderBy("g")
      }
      Generated(seed, shape, build, sparkSql, duckSql)
    }

    /** Row-generator plan (round 15) — the explode/unnest surface, the
      * one relational shape where output cardinality EXCEEDS input.
      * Three renderings per shape: Spark's LATERAL VIEW clause (parser
      * path), the DataFrame explode/posexplode column (Generate node),
      * and DuckDB's unnest.
      *
      *  - `expl_seq`: explode(sequence(1, 1 + key % m)) re-aggregated
      *    per group — count and exact BIGINT sum of the generated
      *    element (DuckDB's generate_series is inclusive on both ends,
      *    same as Spark's sequence); the fan-out factor is bounded by
      *    m ≤ 4, so the blow-up is a constant multiple at any scale;
      *  - `expl_split`: posexplode(split(cat, 'LETTER')) — both engines
      *    keep leading AND trailing empty parts (verified: DuckDB
      *    string_split('STANDARD','D') = [STAN, AR, '']), pos is
      *    rendered 1-based on the Spark side to match
      *    generate_subscripts; row-level output under a total-order
      *    sort + LIMIT. */
    def runExplode(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      if (t.cats.isEmpty || maybe(0.5)) {
        val c = pick(t.ints)
        val m = 2 + rnd.nextInt(3)
        val modShape = t.cats.isEmpty || maybe(0.4)
        val (gSql, gCol) =
          if (modShape) {
            val gc = pick(t.ints); val gm = 3 + rnd.nextInt(8)
            (s"CAST($gc % $gm AS BIGINT)", (col(gc) % gm).cast("long"))
          } else {
            val gc = pick(t.cats.keys.toSeq.sorted)
            (gc, col(gc))
          }
        val sparkSql =
          s"SELECT g, count(*) AS n, sum(x) AS sx FROM (SELECT $gSql AS g, x " +
            s"FROM ${t.name} LATERAL VIEW explode(sequence(1, 1 + CAST($c % $m AS INT))) ex AS x " +
            s"WHERE ${p.sql}) GROUP BY g ORDER BY g"
        val duckSql =
          s"SELECT g, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM (SELECT $gSql AS g, " +
            s"unnest(generate_series(1, 1 + $c % $m)) AS x FROM ${t.name} WHERE ${p.sql}) " +
            s"GROUP BY g ORDER BY g"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .withColumn("g", gCol)
            .withColumn("x", explode(sequence(lit(1), lit(1) + (col(c) % m).cast("int"))))
            .groupBy("g")
            .agg(count(lit(1)).as("n"), sum(col("x").cast("long")).as("sx"))
            .orderBy("g")
        Generated(seed, "expl_seq", build, sparkSql, duckSql)
      } else {
        val vc = pick(t.cats.keys.toSeq.sorted)
        val sep = pick("ADEIMNORT".toSeq).toString // letters present in the cat domains
        val uk = t.unique
        val ukSql = uk.mkString(", ")
        val n = 50 + rnd.nextInt(150)
        // ORDER BY every output column, not just the key suffix + pos:
        // the synthetic lineitem has ~20% duplicate (orderkey,
        // linenumber) pairs (the fzql lesson), so rows tied on
        // (keys, p) can differ in `part` and the LIMIT cut becomes
        // engine-dependent; with `part` in the sort, remaining ties
        // are fully identical rows. The 300-seed closing sweep caught
        // exactly this (5 seeds diverged at the cut).
        val sparkSql =
          s"SELECT $ukSql, CAST(pos + 1 AS BIGINT) AS p, part FROM ${t.name} " +
            s"LATERAL VIEW posexplode(split($vc, '$sep')) ex AS pos, part " +
            s"WHERE ${p.sql} ORDER BY $ukSql, p, part LIMIT $n"
        val duckSql =
          s"SELECT $ukSql, p, part FROM (SELECT $ukSql, " +
            s"CAST(generate_subscripts(string_split($vc, '$sep'), 1) AS BIGINT) AS p, " +
            s"unnest(string_split($vc, '$sep')) AS part FROM ${t.name} WHERE ${p.sql}) " +
            s"ORDER BY $ukSql, p, part LIMIT $n"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .select(uk.map(col) :+ posexplode(split(col(vc), sep)): _*)
            .withColumn("p", (col("pos") + 1).cast("long"))
            .select(uk.map(col) :+ col("p") :+ col("col").as("part"): _*)
            .orderBy((uk ++ Seq("p", "part")).map(col): _*).limit(n)
        Generated(seed, "expl_split", build, sparkSql, duckSql)
      }
    }

    /** FILTER-clause aggregate plan (round 16) — the per-aggregate
      * predicate surface (`agg(x) FILTER (WHERE p)`), a genuinely
      * separate analyzer path from CASE-folded inputs: Spark parses
      * the clause into `AggregateExpression.filter`, while the
      * DataFrame leg builds the classical `agg(CASE WHEN p THEN x
      * END)` equivalence — the differential pins the two paths equal
      * row-for-row, and DuckDB's native FILTER is the cross-engine
      * oracle. Null discipline: a filtered sum/min over zero matching
      * rows is NULL on every engine (count is 0); sums ride the
      * DECIMAL(18,2)→(VARCHAR→)DOUBLE bridge as always.
      *
      * Shapes: `fa_grouped` (cat GROUP BY, mixed filtered + plain
      * aggs) and `fa_global` (no GROUP BY — the one-row path where
      * all-rows-excluded NULLs actually surface in output). */
    def runFilterAgg(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      def filtAgg(alias: String): Agg = {
        val fp = onePred(t)
        rnd.nextInt(3) match {
          case 0 =>
            Agg(s"count(*) FILTER (WHERE ${fp.sql}) AS $alias",
              s"count(*) FILTER (WHERE ${fp.sql}) AS $alias",
              count(when(fp.cond, lit(1))).as(alias))
          case 1 =>
            val c = pick(t.nums)
            Agg(
              s"CAST(sum(CAST($c AS DECIMAL(18,2))) FILTER (WHERE ${fp.sql}) AS DOUBLE) AS $alias",
              s"CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) FILTER (WHERE ${fp.sql}) AS VARCHAR) AS DOUBLE) AS $alias",
              sum(when(fp.cond, col(c).cast("decimal(18,2)"))).cast("double").as(alias))
          case _ =>
            val c = pick(t.ints)
            val f = pick(Seq("min", "max"))
            Agg(s"$f($c) FILTER (WHERE ${fp.sql}) AS $alias",
              s"$f($c) FILTER (WHERE ${fp.sql}) AS $alias",
              (if (f == "min") min(when(fp.cond, col(c)))
               else max(when(fp.cond, col(c)))).as(alias))
        }
      }
      val aggs = (0 until 2 + rnd.nextInt(2)).map(i => filtAgg(s"agg$i")) :+
        Agg("count(*) AS cnt", "count(*) AS cnt", count(lit(1)).as("cnt"))
      // non-power-of-2 draw (the runUsing first-draw-bias note)
      val grouped = rnd.nextInt(6) < 4
      if (grouped) {
        val gcol = pick(t.cats.keys.toSeq.sorted)
        def sql(duck: Boolean) =
          s"SELECT $gcol, ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
            s"FROM ${t.name} WHERE ${p.sql} GROUP BY $gcol ORDER BY $gcol"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .groupBy(gcol).agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
            .orderBy(gcol)
        Generated(seed, "fa_grouped", build, sql(false), sql(true))
      } else {
        def sql(duck: Boolean) =
          s"SELECT ${aggs.map(a => if (duck) a.duckSql else a.sparkSql).mkString(", ")} " +
            s"FROM ${t.name} WHERE ${p.sql}"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .agg(aggs.head.dfCol, aggs.tail.map(_.dfCol): _*)
        Generated(seed, "fa_global", build, sql(false), sql(true))
      }
    }

    /** Ordered string-aggregation plan (round 16) — the LISTAGG /
      * string_agg surface through three genuinely different front
      * doors: Spark SQL's `listagg(v, ',') WITHIN GROUP (ORDER BY v)`
      * (the 4.0 parser + ListAgg aggregate), the DataFrame leg's
      * `array_join(array_sort(collect_list(v)), ',')` (the d9
      * canonical-presentation rule), and DuckDB's `string_agg(v, ','
      * ORDER BY v)`. Ordering by the aggregated VALUE itself is what
      * makes the concatenation deterministic at any scale: rows tied
      * on v are interchangeable in the output string, so no unique-key
      * tiebreak is needed — a total order on the multiset, not the
      * rows.
      *
      * Shapes: `sg_cat` (category values), `sg_int` (ints cast to
      * VARCHAR — lexicographic on BOTH engines, same strings same
      * order), `sg_distinct` (DISTINCT de-dup before the ordered
      * concat — collect_set on the DataFrame leg). */
    def runStrAgg(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val gi = pick(t.ints)
      val m = 3 + rnd.nextInt(8)
      val gSql = s"CAST($gi % $m AS BIGINT)"
      val gCol = (col(gi) % m).cast("long")
      val shape = rnd.nextInt(3)
      // vSql is dialect-split: Spark spells the string type STRING,
      // DuckDB VARCHAR (a bare un-lengthed VARCHAR fails Spark's parser)
      val (vSqlSpark, vSqlDuck, vCol) = shape match {
        case 1 =>
          val c = pick(t.ints.filter(_ != gi) match {
            case Seq() => t.ints; case xs => xs })
          val mm = 5 + rnd.nextInt(95)
          (s"CAST($c % $mm AS STRING)", s"CAST($c % $mm AS VARCHAR)",
            (col(c) % mm).cast("string"))
        case _ =>
          val c = pick(t.cats.keys.toSeq.sorted)
          (c, c, col(c))
      }
      val distinct = shape == 2
      val (sparkAgg, duckAgg, dfAgg) =
        if (distinct)
          (s"listagg(DISTINCT v, ',') WITHIN GROUP (ORDER BY v) AS vs",
            s"string_agg(DISTINCT v, ',' ORDER BY v) AS vs",
            array_join(array_sort(collect_set(col("v"))), ",").as("vs"))
        else
          (s"listagg(v, ',') WITHIN GROUP (ORDER BY v) AS vs",
            s"string_agg(v, ',' ORDER BY v) AS vs",
            array_join(array_sort(collect_list(col("v"))), ",").as("vs"))
      def sql(duck: Boolean) =
        s"SELECT g, count(*) AS cnt, ${if (duck) duckAgg else sparkAgg} FROM " +
          s"(SELECT $gSql AS g, ${if (duck) vSqlDuck else vSqlSpark} AS v " +
          s"FROM ${t.name} WHERE ${p.sql}) GROUP BY g ORDER BY g"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(gCol.as("g"), vCol.as("v"))
          .groupBy("g").agg(count(lit(1)).as("cnt"), dfAgg)
          .orderBy("g")
      Generated(seed,
        shape match { case 1 => "sg_int"; case 2 => "sg_distinct"; case _ => "sg_cat" },
        build, sql(false), sql(true))
    }

    /** VALUES inline-table plan (round 16) — the literal-relation
      * front door: a seeded inline dimension (residue → label) joined
      * to a fact table on a modulus key. Three constructions: Spark
      * SQL's `(VALUES (…), (…)) AS d(k, lbl)` (parser inline-table →
      * LocalRelation), the DataFrame leg's `createDataFrame` local
      * relation, and DuckDB's `(VALUES …) d(k, lbl)`. The scale note
      * IS the point: a literal relation broadcasts — the fact side
      * never shuffles for the lookup, the same shape as c8's dictGet.
      *
      * Shapes: `vl_inner` (labels partition the matched residues),
      * `vl_left` (LEFT FROM THE VALUES SIDE — dim keys drawn past the
      * modulus range produce unmatched labels whose count(k) is 0 and
      * whose sum is NULL on every engine). */
    def runValues(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val kc = pick(t.ints)
      val u1 = t.unique.head
      val m = 4 + rnd.nextInt(6)
      val nDim = 2 + rnd.nextInt(m)
      // draw residues from [0, m+2): values ≥ m never match — the
      // LEFT shape's null-producing rows
      val residues = rnd.shuffle((0 until m + 2).toList).take(nDim).sorted
      val dimRows = residues.map(r => (r, s"d$r"))
      val valuesSql = dimRows.map { case (k, l) => s"($k, '$l')" }.mkString(", ")
      val left = rnd.nextInt(6) < 3
      val sumS = (duck: Boolean) => s"CAST(sum($u1) AS BIGINT) AS su"
      def sql(duck: Boolean) = {
        val dim = s"(VALUES $valuesSql) AS d(k, lbl)"
        val dimDuck = s"(VALUES $valuesSql) d(k, lbl)"
        val fact = s"(SELECT $u1, CAST($kc % $m AS BIGINT) AS k FROM ${t.name} WHERE ${p.sql}) f"
        if (left)
          s"SELECT lbl, count($u1) AS cnt, ${sumS(duck)} FROM ${if (duck) dimDuck else dim} " +
            s"LEFT JOIN $fact ON d.k = f.k GROUP BY lbl ORDER BY lbl"
        else
          s"SELECT lbl, count(*) AS cnt, ${sumS(duck)} FROM $fact " +
            s"JOIN ${if (duck) dimDuck else dim} ON f.k = d.k GROUP BY lbl ORDER BY lbl"
      }
      val build = (s: SparkSession, dir: String) => {
        val dim = s.createDataFrame(dimRows).toDF("k", "lbl")
          .select(col("k").cast("long").as("k"), col("lbl"))
        val fact = Engine.t(s, dir, t.name).filter(p.cond)
          .select(col(u1), (col(kc) % m).cast("long").as("k"))
        val joined =
          if (left) dim.join(fact, Seq("k"), "left")
          else fact.join(dim, Seq("k"), "inner")
        joined.groupBy("lbl")
          .agg((if (left) count(col(u1)) else count(lit(1))).as("cnt"),
            sum(col(u1)).cast("long").as("su"))
          .orderBy("lbl")
      }
      Generated(seed, if (left) "vl_left" else "vl_inner",
        build, sql(false), sql(true))
    }

    /** SELECT-sugar plan (round 16) — two resolution paths that are
      * pure analyzer/parser surface, with no DataFrame spelling at
      * all (the API can't even express them, so the build leg is the
      * desugared form and the differential pins the sugar ≡ desugar):
      *
      *  - `su_lateral`: lateral column aliases — a SELECT item
      *    referencing a PRIOR item's alias (`a + 1 AS b, b * 2 AS c`).
      *    Spark resolves via LateralColumnAliasReference (3.4+),
      *    DuckDB binds select aliases natively; the DataFrame leg is
      *    the chained-withColumn desugar. Exact integer arithmetic
      *    only; ORDER BY the unique key, LIMIT for a bounded row set.
      *  - `su_ordinal`: GROUP BY 1, 2 + ORDER BY ordinals — the
      *    positional-reference parser rule (spark.sql.groupByOrdinal,
      *    on by default) vs DuckDB's native ordinals; the DataFrame
      *    leg groups by the named columns. */
    def runSugar(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      if (rnd.nextInt(6) < 3) {
        val c = pick(t.ints)
        val k1 = 1 + rnd.nextInt(9)
        val k2 = 2 + rnd.nextInt(5)
        val uks = t.unique
        val n = 40 + rnd.nextInt(160)
        val ukSql = uks.mkString(", ")
        // ORDER BY every output column, not just t.unique: the
        // synthetic lineitem's (l_orderkey, l_linenumber) is NOT
        // unique (~20% duplicates), so a key-only sort before LIMIT
        // left tied rows with different c-derived a/b/d free to cut
        // differently per engine — the lt_agg tie-cut class (ADVICE
        // r16). a/b/d are all functions of c, so appending them makes
        // the cut output-invariant (runScalar rule, :823).
        val ordSql = (uks ++ Seq("a", "b", "d")).mkString(", ")
        val sql =
          s"SELECT $ukSql, $c + $k1 AS a, a * $k2 AS b, b - $c AS d " +
            s"FROM ${t.name} WHERE ${p.sql} ORDER BY $ordSql LIMIT $n"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .withColumn("a", col(c) + k1)
            .withColumn("b", col("a") * k2)
            .withColumn("d", col("b") - col(c))
            .select((uks ++ Seq("a", "b", "d")).map(col): _*)
            .orderBy((uks ++ Seq("a", "b", "d")).map(col): _*).limit(n)
        Generated(seed, "su_lateral", build, sql, sql)
      } else {
        val gc = pick(t.cats.keys.toSeq.sorted)
        val gi = pick(t.ints)
        val m = 3 + rnd.nextInt(8)
        val u1 = t.unique.head
        def sql(duck: Boolean) = {
          val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
          s"SELECT $gc, CAST($gi % $m AS BIGINT) AS g2, count(*) AS n, $sumS AS su " +
            s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1, 2 ORDER BY 1, 2"
        }
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond)
            .withColumn("g2", (col(gi) % m).cast("long"))
            .groupBy(gc, "g2")
            .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
            .orderBy(gc, "g2")
        Generated(seed, "su_ordinal", build, sql(false), sql(true))
      }
    }

    /** ClickHouse-DIALECT text plan (round 17) — fuzzes the
      * [[graft.ChSql]] pre-parse rewriter itself: `sparkSql` here is
      * CH-dialect TEXT (not Spark-parseable), the build leg is the
      * independently-spelled DataFrame desugar, and the differential
      * pins rewriter(text) ≡ desugar across random tables, predicates
      * and parameters. Three sub-shapes, one per rewritten clause:
      *
      *  - `ch_prewhere`: PREWHERE p WHERE w over a grouped rollup —
      *    must behave exactly like the conjunction;
      *  - `ch_limitby`: ORDER BY v dir, uk LIMIT n BY g (g either a
      *    category column or an aliased integer modulus — the alias
      *    path exercises PARTITION BY over a base OUTPUT column).
      *    Output rows never include the row number, so duplicated
      *    (uk) rows in the synthetic lineitem are interchangeable and
      *    the cut is tie-safe by construction;
      *  - `ch_fill`: integer bucket rollup + WITH FILL FROM lo TO hi
      *    STEP s — exclusive TO per CH, full-outer fill (off-grid
      *    base rows kept), numeric defaults 0/0.0;
      *  - `ch_sample` (r17): `FROM t SAMPLE n/d WHERE p` — the
      *    registered-key md5-prefix rewrite; registration always uses
      *    the table's FULL unique key so concurrent generators are
      *    idempotent, and the duck leg spells the predicate out;
      *  - `ch_arrayjoin` (r17): `[LEFT] ARRAY JOIN split(cat, '-') AS
      *    w` vs an explode build leg and a DuckDB unnest; ORDER BY
      *    every output column before the LIMIT cut (tie-safe);
      *  - `ch_global` (r17): `k GLOBAL IN (subquery)` — the GLOBAL
      *    strip; duck leg is the plain IN, build leg a left-semi. */
    def runChSql(): Generated = {
      val t = pick(singles)
      val p = filterFor(t)
      val u1 = t.unique.head
      val uk = t.unique.mkString(", ")
      rnd.nextInt(6) match {
        case 0 =>
          val p2 = onePred(t)
          val (gSql, gCol) =
            if (t.cats.nonEmpty && maybe(0.6)) {
              val c = pick(t.cats.keys.toSeq.sorted); (c, col(c))
            } else {
              val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
              (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
            }
          val chText =
            s"SELECT $gSql AS g, count(*) AS n, sum($u1) AS su FROM ${t.name} " +
              s"PREWHERE ${p.sql} WHERE ${p2.sql} GROUP BY $gSql ORDER BY g"
          val duckSql =
            s"SELECT $gSql AS g, count(*) AS n, CAST(sum($u1) AS BIGINT) AS su " +
              s"FROM ${t.name} WHERE (${p.sql}) AND (${p2.sql}) GROUP BY 1 ORDER BY 1"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond && p2.cond)
              .groupBy(gCol.as("g"))
              .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
              .orderBy("g")
          Generated(seed, "ch_prewhere", build, chText, duckSql)
        case 1 =>
          val v = pick(t.nums)
          val descOrd = maybe(0.6)
          val n = 1 + rnd.nextInt(4)
          val dirSql = if (descOrd) "DESC" else "ASC"
          val (gSql, gCol) =
            if (t.cats.nonEmpty && maybe(0.5)) {
              val c = pick(t.cats.keys.toSeq.sorted); (c, col(c))
            } else {
              val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
              (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
            }
          val outCols = (t.unique :+ v).distinct
          val chText =
            s"SELECT ${outCols.mkString(", ")}, $gSql AS g FROM ${t.name} " +
              s"WHERE ${p.sql} ORDER BY $v $dirSql, $uk LIMIT $n BY g"
          val duckSql =
            s"SELECT ${outCols.mkString(", ")}, g FROM (" +
              s"SELECT ${outCols.mkString(", ")}, $gSql AS g, " +
              s"row_number() OVER (PARTITION BY $gSql ORDER BY $v $dirSql, $uk) AS rn " +
              s"FROM ${t.name} WHERE ${p.sql}) " +
              s"WHERE rn <= $n ORDER BY $v $dirSql, $uk"
          val build = (s: SparkSession, dir: String) => {
            val lead = if (descOrd) col(v).desc else col(v).asc
            val w = Window.partitionBy(gCol)
              .orderBy(lead +: t.unique.map(col(_).asc): _*)
            Engine.t(s, dir, t.name).filter(p.cond)
              .withColumn("g", gCol)
              .withColumn("rn", row_number().over(w))
              .filter(col("rn") <= n)
              .select((outCols :+ "g").map(col): _*)
              .orderBy(lead +: t.unique.map(col(_).asc): _*)
          }
          Generated(seed, "ch_limitby", build, chText, duckSql)
        case 2 =>
          val candidates = Seq(
            (lineitem, "l_quantity", Seq(5, 10)),
            (orders, "o_totalprice", Seq(25000, 50000)),
            (part, "p_size", Seq(5, 10)),
            (customer, "c_acctbal", Seq(1000, 2000)))
          val (ft, c, widths) = pick(candidates)
          val fp = filterFor(ft)
          val v = pick(ft.nums)
          val w = pick(widths)
          val (dLo, dHi) = numDomain.getOrElse(c, (1.0, 50.0))
          val bLo = math.floor(dLo / w).toLong
          val toEx = math.floor(dHi / w).toLong + 1
          val step = if (maybe(0.25)) 2L else 1L
          val chText =
            s"SELECT CAST(floor($c / $w) AS BIGINT) AS b, count(*) AS n, " +
              s"CAST(sum(CAST($v AS DECIMAL(18,2))) AS DOUBLE) AS s " +
              s"FROM ${ft.name} WHERE ${fp.sql} GROUP BY CAST(floor($c / $w) AS BIGINT) " +
              s"ORDER BY b WITH FILL FROM $bLo TO $toEx STEP $step"
          val duckSql =
            s"SELECT coalesce(ag.ab, sp.b) AS b, coalesce(an, 0) AS n, coalesce(asum, 0.0) AS s FROM " +
              s"(SELECT b FROM (SELECT CAST(generate_series AS BIGINT) AS b " +
              s"FROM generate_series($bLo, $toEx, $step)) WHERE b < $toEx) sp " +
              s"FULL OUTER JOIN " +
              s"(SELECT CAST(floor($c / $w) AS BIGINT) AS ab, count(*) AS an, " +
              s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS asum " +
              s"FROM ${ft.name} WHERE ${fp.sql} GROUP BY 1) ag ON sp.b = ag.ab ORDER BY b"
          val build = (s: SparkSession, dir: String) => {
            val ag = Engine.t(s, dir, ft.name).filter(fp.cond)
              .groupBy(floor(col(c) / w).cast("long").as("ab"))
              .agg(count(lit(1)).as("an"),
                sum(col(v).cast("decimal(18,2)")).cast("double").as("asum"))
            val sp = s.range(bLo, toEx, step).select(col("id").as("b"))
            sp.join(ag, sp("b") === ag("ab"), "full_outer")
              .select(coalesce(ag("ab"), sp("b")).as("b"),
                coalesce(col("an"), lit(0L)).as("n"),
                coalesce(col("asum"), lit(0.0)).as("s"))
              .orderBy("b")
          }
          Generated(seed, "ch_fill", build, chText, duckSql)
        case 3 =>
          // SAMPLE n/d: registration is idempotent (always the table's
          // full unique key) so concurrent generator threads can't race
          // the shared registry to different keys.
          val keySql = t.unique.map(c => s"CAST($c AS STRING)")
            .mkString("concat(", ", '-', ", ")")
          graft.ChSql.registerSample(t.name, keySql)
          val num = 1 + rnd.nextInt(9)
          val den = Seq(10, 16, 32)(rnd.nextInt(3))
          val frac = num.toDouble / den
          val threshold = f"${math.floor(frac * (1 << 24)).toLong}%06x"
          val chText =
            s"SELECT count(*) AS n, sum($u1) AS su FROM ${t.name} " +
              s"SAMPLE $num/$den WHERE ${p.sql}"
          val duckSql =
            s"SELECT count(*) AS n, CAST(sum($u1) AS BIGINT) AS su FROM ${t.name} " +
              s"WHERE substring(md5($keySql), 1, 6) < '$threshold' AND (${p.sql})"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name)
              .filter(substring(md5(
                concat_ws("-", t.unique.map(col(_).cast("string")): _*)), 1, 6) < threshold
                && p.cond)
              .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
          Generated(seed, "ch_sample", build, chText, duckSql)
        case 4 =>
          val tt = pick(singles.filter(_.cats.nonEmpty))
          val pp = filterFor(tt)
          val c = pick(tt.cats.keys.toSeq.sorted)
          val fn = if (maybe(0.3)) "LEFT ARRAY JOIN" else "ARRAY JOIN"
          val uks = tt.unique
          val ukSql = uks.mkString(", ")
          // ORDER BY every output column before the LIMIT (tie-safe:
          // duplicated unique keys in lineitem are interchangeable
          // only when the sort covers the whole output row)
          val chText =
            s"SELECT $ukSql, w FROM ${tt.name} $fn split($c, '-') AS w " +
              s"WHERE ${pp.sql} ORDER BY $ukSql, w LIMIT 500"
          val duckSql =
            s"SELECT $ukSql, w FROM (SELECT $ukSql, " +
              s"unnest(string_split($c, '-')) AS w FROM ${tt.name} WHERE ${pp.sql}) " +
              s"ORDER BY $ukSql, w LIMIT 500"
          val gen = if (fn.startsWith("LEFT")) explode_outer(split(col(c), "-"))
            else explode(split(col(c), "-"))
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, tt.name).filter(pp.cond)
              .select(uks.map(col) :+ gen.as("w"): _*)
              .orderBy((uks :+ "w").map(col): _*).limit(500)
          Generated(seed, "ch_arrayjoin", build, chText, duckSql)
        case _ =>
          val (lt, rt, lk, rk) = pick(joinEdges)
          val lp = filterFor(lt)
          val rp = filterFor(rt)
          val lu = lt.unique.head
          val chText =
            s"SELECT count(*) AS n, sum($lu) AS su FROM ${lt.name} " +
              s"WHERE ${lp.sql} AND $lk GLOBAL IN " +
              s"(SELECT $rk FROM ${rt.name} WHERE ${rp.sql})"
          val duckSql =
            s"SELECT count(*) AS n, CAST(sum($lu) AS BIGINT) AS su FROM ${lt.name} " +
              s"WHERE ${lp.sql} AND $lk IN " +
              s"(SELECT $rk FROM ${rt.name} WHERE ${rp.sql})"
          val build = (s: SparkSession, dir: String) => {
            val r = Engine.t(s, dir, rt.name).filter(rp.cond).select(col(rk))
            Engine.t(s, dir, lt.name).filter(lp.cond)
              .join(r, col(lk) === col(rk), "left_semi")
              .agg(count(lit(1)).as("n"), sum(col(lu)).as("su"))
          }
          Generated(seed, "ch_global", build, chText, duckSql)
      }
    }

    /** NESTED ClickHouse-dialect text (round 18, VERDICT r17 #6) — a
      * separate family (not a new runChSql branch) so the round-17
      * frozen ChSql seed streams stay bit-stable. Fuzzes the
      * scope-aware PREWHERE scanner: the clause sits INSIDE a
      * subquery, where the old flat regex either failed to parse or
      * captured across the boundary. Two sub-shapes:
      *
      *  - `chn_both`: inner `PREWHERE p1 WHERE p2` + an OUTER WHERE —
      *    the scanner must merge p1 with p2 (its own clause) and leave
      *    the outer predicate alone;
      *  - `chn_solo`: inner `PREWHERE p1` terminated by the subquery's
      *    closing parenthesis (no WHERE in scope) + outer grouped
      *    rollup — the scanner's depth-drop terminator. */
    def runChNested(): Generated = {
      val t = pick(singles)
      val p1 = filterFor(t)
      val u1 = t.unique.head
      val (gSql, gCol) =
        if (t.cats.nonEmpty && maybe(0.6)) {
          val c = pick(t.cats.keys.toSeq.sorted); (c, col(c))
        } else {
          val c = pick(t.ints); val m = 3 + rnd.nextInt(8)
          (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
        }
      if (maybe(0.5)) {
        val p2 = onePred(t)
        val p3 = onePred(t)
        val chText =
          s"SELECT $gSql AS g, count(*) AS n, sum($u1) AS su FROM (" +
            s"SELECT * FROM ${t.name} PREWHERE ${p1.sql} WHERE ${p2.sql}" +
            s") WHERE ${p3.sql} GROUP BY $gSql ORDER BY g"
        val duckSql =
          s"SELECT $gSql AS g, count(*) AS n, CAST(sum($u1) AS BIGINT) AS su " +
            s"FROM ${t.name} WHERE (${p1.sql}) AND (${p2.sql}) AND (${p3.sql}) " +
            s"GROUP BY 1 ORDER BY 1"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p1.cond && p2.cond && p3.cond)
            .groupBy(gCol.as("g"))
            .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
            .orderBy("g")
        Generated(seed, "chn_both", build, chText, duckSql)
      } else {
        val chText =
          s"SELECT $gSql AS g, count(*) AS n, sum($u1) AS su FROM (" +
            s"SELECT * FROM ${t.name} PREWHERE ${p1.sql}" +
            s") GROUP BY $gSql ORDER BY g"
        val duckSql =
          s"SELECT $gSql AS g, count(*) AS n, CAST(sum($u1) AS BIGINT) AS su " +
            s"FROM ${t.name} WHERE ${p1.sql} GROUP BY 1 ORDER BY 1"
        val build = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p1.cond)
            .groupBy(gCol.as("g"))
            .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
            .orderBy("g")
        Generated(seed, "chn_solo", build, chText, duckSql)
      }
    }

    /** CH FUNCTION-NAME plan (round 19, VERDICT r18 next #1): the
      * query body is spelled with ClickHouse function names
      * (toYYYYMM/countIf/uniqExact/multiIf/intDiv/quantile(q)(x)/
      * argMax/string family) that resolve only through the engine's
      * [[graft.ChNames]] registrations + the [[graft.ChSql]]
      * parametric-syntax rewrite; `build` is the independently spelled
      * Spark-function desugar and `duckSql` the DuckDB spelling — the
      * three-legged contract of the other ch* families, now for the
      * NAME surface rather than clause grammar. */
    def runChFns(): Generated = {
      // non-power-of-two draw: nextInt(2^k) takes the top bits of the
      // first scrambled word, which are near-constant across
      // SEQUENTIAL seeds — every seed 1..255 landed on one shape
      rnd.nextInt(997) % 4 match {
        case 0 => // date rollup: toYYYYMM/toYear/toStartOfMonth + countIf + uniqExact
          val t = pick(Seq(lineitem, orders))
          val d = t.date.get
          val p = filterFor(t)
          val p2 = onePred(t)
          val ik = pick(t.ints)
          val (gCh, gCol, gDuck) = rnd.nextInt(3) match {
            case 0 => (s"toYYYYMM($d)",
              (year(col(d)) * 100 + month(col(d))).cast("int"),
              s"CAST(year($d) * 100 + month($d) AS INT)")
            case 1 => (s"toYear($d)", year(col(d)), s"CAST(year($d) AS INT)")
            case _ => (s"toStartOfMonth($d)",
              date_trunc("month", col(d)).cast("date"),
              s"CAST(date_trunc('month', $d) AS DATE)")
          }
          val chText =
            s"SELECT $gCh AS g, count(*) AS n, countIf(${p2.sql}) AS ci, " +
              s"uniqExact($ik) AS ue FROM ${t.name} WHERE ${p.sql} " +
              s"GROUP BY g ORDER BY g"
          val duckSql =
            s"SELECT $gDuck AS g, count(*) AS n, " +
              s"count(*) FILTER (WHERE ${p2.sql}) AS ci, " +
              s"count(DISTINCT $ik) AS ue FROM ${t.name} WHERE ${p.sql} " +
              s"GROUP BY 1 ORDER BY 1"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .groupBy(gCol.as("g"))
              .agg(count(lit(1)).as("n"),
                count(when(p2.cond, lit(1))).as("ci"),
                count_distinct(col(ik)).as("ue"))
              .orderBy("g")
          Generated(seed, "chf_date", build, chText, duckSql)
        case 1 => // conditionals: multiIf band + intDiv bucket, row-level
          val t = pick(singles.filter(_.ints.size >= 2))
          val p = filterFor(t)
          val p1 = onePred(t)
          val p2 = onePred(t)
          val ik = pick(t.ints)
          val m = 3 + rnd.nextInt(9)
          val lim = 30 + rnd.nextInt(40)
          val uk = t.unique.mkString(", ")
          val chText =
            s"SELECT $uk, multiIf(${p1.sql}, 'a', ${p2.sql}, 'b', 'z') AS band, " +
              s"intDiv($ik, $m) AS q FROM ${t.name} WHERE ${p.sql} " +
              s"ORDER BY $uk LIMIT $lim"
          val duckSql =
            s"SELECT $uk, CASE WHEN ${p1.sql} THEN 'a' WHEN ${p2.sql} THEN 'b' " +
              s"ELSE 'z' END AS band, CAST(floor($ik / $m) AS BIGINT) AS q " +
              s"FROM ${t.name} WHERE ${p.sql} ORDER BY $uk LIMIT $lim"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .select(t.unique.map(col) ++ Seq(
                when(p1.cond, "a").when(p2.cond, "b").otherwise("z").as("band"),
                call_function("div", col(ik), lit(m)).as("q")): _*)
              .orderBy(t.unique.map(col): _*)
              .limit(lim)
          Generated(seed, "chf_cond", build, chText, duckSql)
        case 2 => // aggregates: quantile(q)(x) parametric + argMax + sumIf
          val t = pick(singles.filter(_.cats.nonEmpty))
          val p = filterFor(t)
          val p2 = onePred(t)
          val g = pick(t.cats.keys.toSeq.sorted)
          val v = pick(t.nums)
          // argMax's ordering arg must be UNIQUE or engines pick
          // different tie rows — fold the composite key into one value
          // (lineitem: l_linenumber ∈ 1..7, so ×10 keeps it injective)
          val (uk, ukCol) =
            if (t.unique.size == 1) (t.unique.head, col(t.unique.head))
            else (s"${t.unique.head} * 10 + ${t.unique(1)}",
              col(t.unique.head) * 10 + col(t.unique(1)))
          val q = Seq(0.25, 0.5, 0.75, 0.9)(rnd.nextInt(4))
          val chText =
            s"SELECT $g AS g, CAST(round(quantile($q)($v), 6) AS DOUBLE) AS med, " +
              s"argMax($v, $uk) AS am, " +
              s"CAST(sumIf(CAST($v AS DECIMAL(18,2)), ${p2.sql}) AS DOUBLE) AS si " +
              s"FROM ${t.name} WHERE ${p.sql} GROUP BY g ORDER BY g"
          val duckSql =
            s"SELECT $g AS g, round(quantile_cont($v, $q), 6) AS med, " +
              s"arg_max($v, $uk) AS am, " +
              s"CAST(CAST(sum(CAST($v AS DECIMAL(18,2))) FILTER (WHERE ${p2.sql}) " +
              s"AS VARCHAR) AS DOUBLE) AS si " +
              s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1 ORDER BY 1"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .groupBy(col(g).as("g"))
              .agg(round(percentile(col(v), lit(q)), 6).cast("double").as("med"),
                max_by(col(v), ukCol).as("am"),
                sum(when(p2.cond, col(v).cast("decimal(18,2)"))).cast("double").as("si"))
              .orderBy("g")
          Generated(seed, "chf_agg", build, chText, duckSql)
        case _ => // strings: lowerUTF8/replaceAll/positionUTF8/countSubstrings
          val t = pick(singles.filter(_.cats.nonEmpty))
          val p = filterFor(t)
          val c = pick(t.cats.keys.toSeq.sorted)
          // needle from the domain's actual letters so hits occur
          val needle = pick(t.cats(c).flatMap(_.split("")).filter(_.matches("[A-Z]")).distinct.sorted)
          val lim = 30 + rnd.nextInt(30)
          val uk = t.unique.mkString(", ")
          val chText =
            s"SELECT $uk, lowerUTF8($c) AS lo, replaceAll($c, '$needle', '_') AS rep, " +
              s"CAST(positionUTF8($c, '$needle') AS BIGINT) AS pos, " +
              s"CAST(countSubstrings($c, '$needle') AS BIGINT) AS cs " +
              s"FROM ${t.name} WHERE ${p.sql} ORDER BY $uk LIMIT $lim"
          val duckSql =
            s"SELECT $uk, lower($c) AS lo, replace($c, '$needle', '_') AS rep, " +
              s"CAST(strpos($c, '$needle') AS BIGINT) AS pos, " +
              s"CAST(length($c) - length(replace($c, '$needle', '')) AS BIGINT) AS cs " +
              s"FROM ${t.name} WHERE ${p.sql} ORDER BY $uk LIMIT $lim"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .select(t.unique.map(col) ++ Seq(
                lower(col(c)).as("lo"),
                regexp_replace(col(c), java.util.regex.Pattern.quote(needle), "_").as("rep"),
                locate(needle, col(c)).cast("long").as("pos"),
                ((length(col(c)) - length(regexp_replace(col(c),
                  java.util.regex.Pattern.quote(needle), ""))).cast("long")).as("cs")): _*)
              .orderBy(t.unique.map(col): _*)
              .limit(lim)
          Generated(seed, "chf_str", build, chText, duckSql)
      }
    }

    /** CH-FUNCTION-NAME family 2 (round 20, VERDICT r19 next #5): the
      * r20 ChNames widening exercised three-legged like [[runChFns]] —
      * CH-spelled TEXT / independent Spark build / DuckDB oracle. A
      * SEPARATE family (not a 5th sub-shape of runChFns) so the
      * frozen chf seeds keep their shapes. Covers the ISO-calendar
      * extractors (toISOYear/toISOWeek — DuckDB's isoyear/week are
      * the cross-engine referee), toLastDayOfMonth,
      * toRelativeMonthNum, the countDistinct spelling, and the new
      * string helpers (format '{}' templates — DuckDB's fmt syntax
      * matches — appendTrailingCharIfAbsent, countMatches,
      * reverseUTF8). */
    def runChFns2(): Generated = {
      rnd.nextInt(997) % 2 match {
        case 0 => // ISO-calendar rollup + countDistinct
          val t = pick(Seq(lineitem, orders))
          val d = t.date.get
          val p = filterFor(t)
          val ik = pick(t.ints)
          val (gCh, gCol, gDuck) = rnd.nextInt(3) match {
            case 0 => (s"toISOYear($d) * 100 + toISOWeek($d)",
              (year(date_add(date_sub(col(d).cast("date"), weekday(col(d))), 3)) * 100 +
                weekofyear(col(d))),
              s"CAST(isoyear($d) * 100 + week($d) AS INT)")
            case 1 => (s"toLastDayOfMonth($d)",
              last_day(col(d)),
              s"last_day(CAST($d AS DATE))")
            case _ => (s"toRelativeMonthNum($d)",
              (year(col(d)) * 12 + month(col(d))),
              s"CAST(year($d) * 12 + month($d) AS INT)")
          }
          val chText =
            s"SELECT $gCh AS g, countDistinct($ik) AS cd, count(*) AS n " +
              s"FROM ${t.name} WHERE ${p.sql} GROUP BY g ORDER BY g"
          val duckSql =
            s"SELECT $gDuck AS g, count(DISTINCT $ik) AS cd, count(*) AS n " +
              s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1 ORDER BY 1"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .groupBy(gCol.as("g"))
              .agg(count_distinct(col(ik)).as("cd"), count(lit(1)).as("n"))
              .orderBy("g")
          Generated(seed, "chf2_cal", build, chText, duckSql)
        case _ => // string helpers, row-level
          val t = pick(singles.filter(_.cats.nonEmpty))
          val p = filterFor(t)
          val c = pick(t.cats.keys.toSeq.sorted)
          val ik = pick(t.ints)
          val needle = pick(t.cats(c).flatMap(_.split("")).filter(_.matches("[A-Z]")).distinct.sorted)
          val lim = 30 + rnd.nextInt(30)
          val uk = t.unique.mkString(", ")
          val chText =
            s"SELECT $uk, format('{}:{}', $c, $ik) AS f, " +
              s"appendTrailingCharIfAbsent($c, '$needle') AS ap, " +
              s"CAST(countMatches($c, '$needle') AS BIGINT) AS cm, " +
              s"reverseUTF8($c) AS rv " +
              s"FROM ${t.name} WHERE ${p.sql} ORDER BY $uk LIMIT $lim"
          val duckSql =
            s"SELECT $uk, format('{}:{}', $c, $ik) AS f, " +
              s"CASE WHEN $c LIKE '%$needle' THEN $c ELSE $c || '$needle' END AS ap, " +
              s"CAST(len(regexp_extract_all($c, '$needle')) AS BIGINT) AS cm, " +
              s"reverse($c) AS rv " +
              s"FROM ${t.name} WHERE ${p.sql} ORDER BY $uk LIMIT $lim"
          val build = (s: SparkSession, dir: String) =>
            Engine.t(s, dir, t.name).filter(p.cond)
              .select(t.unique.map(col) ++ Seq(
                format_string("%s:%s", col(c), col(ik)).as("f"),
                when(col(c).endsWith(needle), col(c))
                  .otherwise(concat(col(c), lit(needle))).as("ap"),
                call_function("size",
                  call_function("regexp_extract_all", col(c), lit(needle), lit(0)))
                  .cast("long").as("cm"),
                reverse(col(c)).as("rv")): _*)
              .orderBy(t.unique.map(col): _*)
              .limit(lim)
          Generated(seed, "chf2_str", build, chText, duckSql)
      }
    }

    /** Conditional-function plan (round 16) — the NULL-introducing /
      * NULL-eliminating scalar trio the CASE-based scalar family never
      * renders directly: greatest/least clamps, NULLIF, COALESCE
      * chains, grouped into a count + exact BIGINT key-sum rollup.
      * Dialect care: greatest/least receive only NON-NULL integer
      * arguments (engines have historically diverged on their NULL
      * treatment — Spark skips NULLs, older DuckDB propagated them —
      * so the generator keeps that corner out of scope and pins the
      * total-function surface instead); NULLIF/COALESCE are
      * ANSI-identical everywhere. All arithmetic stays integral. */
    def runCondFn(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val u1 = t.unique.head
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val m1 = 3 + rnd.nextInt(10)
      val m2 = 3 + rnd.nextInt(10)
      val r1 = rnd.nextInt(m1)
      val r2 = rnd.nextInt(m2)
      val (shape, bSql, bCol) = rnd.nextInt(3) match {
        case 0 =>
          val k = 1 + rnd.nextInt(5)
          (s"cf_clamp",
            s"least(greatest($c1 % $m1, $c2 % $m2), $k)",
            least(greatest(col(c1) % m1, col(c2) % m2), lit(k)))
        case 1 =>
          (s"cf_nullif",
            s"COALESCE(NULLIF($c1 % $m1, $r1), -1)",
            coalesce(nullif(col(c1) % m1, lit(r1)), lit(-1)))
        case _ =>
          (s"cf_chain",
            s"COALESCE(NULLIF($c1 % $m1, $r1), NULLIF($c2 % $m2, $r2), -1)",
            coalesce(nullif(col(c1) % m1, lit(r1)),
              nullif(col(c2) % m2, lit(r2)), lit(-1)))
      }
      def sql(duck: Boolean) = {
        val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
        s"SELECT CAST($bSql AS BIGINT) AS bkt, count(*) AS n, $sumS AS su " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1 ORDER BY bkt"
      }
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("bkt", bCol.cast("long"))
          .groupBy("bkt")
          .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
          .orderBy("bkt")
      Generated(seed, shape, build, sql(false), sql(true))
    }

    /** Array-function plan (round 16) — the scalar array surface as a
      * DIALECT-MAPPING differential: Spark's `array_*` family against
      * DuckDB's `list_*` family over a constructed 3-element integer
      * array (`array(c1 % m1, c2 % m2, k)` vs `[...]`), where the
      * names — and historically the semantics (0- vs 1-based access,
      * NULL element handling) — diverge per function. Pinned mappings:
      * `element_at` ≡ list 1-based subscript `l[i]`, `array_contains`
      * ≡ `list_contains`, `array_join∘array_sort` ≡
      * `array_to_string∘list_sort`, `array_max`/`array_min` ≡
      * `list_max`/`list_min` (DuckDB also aliases the `array_*`
      * spellings; the generator deliberately emits `list_*` so the
      * sweep pins the MAPPING, not a shared alias). All elements are
      * non-null integers (the NULL-element corner is a real dialect
      * divergence — Spark's array_sort places NULLs last, DuckDB's
      * list_sort defaults NULLS FIRST — so it stays out of scope the
      * condfn way), and every shape ends in the standard count +
      * exact BIGINT key-sum rollup keyed by the array-derived value.
      *
      * Two deliberate choices, both verified against a REAL Spark 4.1
      * codegen defect this family's first smoke run found: `ElementAt`
      * (and `TryElementAt`) with a FOLDABLE index that lands on a
      * non-nullable `CreateArray` element constant-folds `ev.isNull`
      * to the literal `false` and then emits an assignment into it —
      * janino "Expression isNull_N is not an rvalue" — which disables
      * whole-stage codegen for the entire scan→filter→agg stage and
      * drops the projection to the interpreter (correct results, big
      * perf cliff). So (a) every array element is data-dependent and
      * therefore nullable — the third is `(c1 + c2) % (k + 2)`, not a
      * bare literal — which keeps `isNull` a real variable; and (b)
      * element access goes through `try_element_at`, whose
      * NULL-on-out-of-bounds contract is what DuckDB's 1-based
      * subscript actually implements. */
    def runArrFn(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val u1 = t.unique.head
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val m1 = 3 + rnd.nextInt(8)
      val m2 = 3 + rnd.nextInt(8)
      val k = rnd.nextInt(10)
      val m3 = k + 2
      val e3S = s"($c1 + $c2) % $m3"
      val arrS = s"array($c1 % $m1, $c2 % $m2, $e3S)"
      val arrD = s"[$c1 % $m1, $c2 % $m2, $e3S]"
      val arrC = array(col(c1) % m1, col(c2) % m2,
        (col(c1) + col(c2)) % m3)
      val (shape, bS, bD, bCol) = rnd.nextInt(4) match {
        case 0 =>
          val i = 1 + rnd.nextInt(3)
          ("ar_elem", s"try_element_at($arrS, $i)", s"$arrD[$i]",
            try_element_at(arrC, lit(i)))
        case 1 =>
          val v = rnd.nextInt(10)
          ("ar_contains",
            s"CASE WHEN array_contains($arrS, $v) THEN 1 ELSE 0 END",
            s"CASE WHEN list_contains($arrD, $v) THEN 1 ELSE 0 END",
            when(array_contains(arrC, lit(v)), 1).otherwise(0))
        case 2 =>
          ("ar_minmax",
            s"array_max($arrS) - array_min($arrS)",
            s"list_max($arrD) - list_min($arrD)",
            array_max(arrC) - array_min(arrC))
        case _ =>
          ("ar_sortjoin",
            s"array_join(array_sort($arrS), ',')",
            s"array_to_string(list_sort($arrD), ',')",
            array_join(array_sort(arrC), ","))
      }
      def sql(duck: Boolean) = {
        val sumS = if (duck) s"CAST(sum($u1) AS BIGINT)" else s"sum($u1)"
        val b = if (duck) bD else bS
        val bkt = if (shape == "ar_sortjoin") s"$b AS bkt" else s"CAST($b AS BIGINT) AS bkt"
        s"SELECT $bkt, count(*) AS n, $sumS AS su " +
          s"FROM ${t.name} WHERE ${p.sql} GROUP BY 1 ORDER BY bkt"
      }
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .withColumn("bkt",
            if (shape == "ar_sortjoin") bCol else bCol.cast("long"))
          .groupBy("bkt")
          .agg(count(lit(1)).as("n"), sum(col(u1)).as("su"))
          .orderBy("bkt")
      Generated(seed, shape, build, sql(false), sql(true))
    }

    /** UNPIVOT plan (round 16) — the melt/wide-to-long relational
      * shape, the inverse of the PIVOT family, through three front
      * doors: Spark's `UNPIVOT` table clause (parser path), the
      * `Dataset.unpivot` API (Unpivot logical node), and DuckDB's
      * SQL-standard `UNPIVOT` clause. The value columns are three
      * DERIVED bigints (`c1 % m1`, `NULLIF(c2 % m2, r)` — the
      * null-bearing one — and `(c1 + c2) % m3`), built in a subquery
      * so both engines unpivot expressions, not raw columns.
      *
      * The family exists for a REAL default divergence this design
      * pins on every row: Spark's SQL `UNPIVOT` clause defaults to
      * EXCLUDE NULLS (SQL-standard, same as DuckDB), but
      * `Dataset.unpivot` KEEPS null values — the API has no
      * include/exclude knob at all. So the `up_rollup`/`up_row` build
      * legs must add `.filter($"val".isNotNull)` to match their own
      * engine's SQL rendering, and `up_incl` pins the reverse
      * equivalence: bare `Dataset.unpivot` ≡ `UNPIVOT INCLUDE NULLS`
      * ≡ DuckDB `UNPIVOT INCLUDE NULLS`, with `count(*)` vs
      * `count(val)` splitting the null rows back out. */
    def runUnpivot(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val u1 = t.unique.head
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val m1 = 3 + rnd.nextInt(8)
      val m2 = 3 + rnd.nextInt(8)
      val r = rnd.nextInt(m2)
      val m3 = 2 + rnd.nextInt(9)
      val subSql =
        s"SELECT $u1, CAST($c1 % $m1 AS BIGINT) AS a, " +
          s"CAST(NULLIF($c2 % $m2, $r) AS BIGINT) AS b, " +
          s"CAST(($c1 + $c2) % $m3 AS BIGINT) AS c " +
          s"FROM ${t.name} WHERE ${p.sql}"
      def sub(s: SparkSession, dir: String) =
        Engine.t(s, dir, t.name).filter(p.cond).select(
          col(u1),
          (col(c1) % m1).cast("long").as("a"),
          nullif(col(c2) % m2, lit(r)).cast("long").as("b"),
          ((col(c1) + col(c2)) % m3).cast("long").as("c"))
      def melted(s: SparkSession, dir: String) =
        sub(s, dir).unpivot(Array(col(u1)),
          Array(col("a"), col("b"), col("c")), "name", "val")
      val shape = rnd.nextInt(3) match {
        case 0 => "up_rollup"
        case 1 => "up_incl"
        case _ => "up_row"
      }
      val n = 40 + rnd.nextInt(160)
      val sqlText = shape match {
        case "up_rollup" =>
          s"SELECT name, count(*) AS n, CAST(sum(val) AS BIGINT) AS su " +
            s"FROM ($subSql) UNPIVOT (val FOR name IN (a, b, c)) " +
            s"GROUP BY name ORDER BY name"
        case "up_incl" =>
          s"SELECT name, count(*) AS n, count(val) AS nv, " +
            s"CAST(sum(val) AS BIGINT) AS su " +
            s"FROM ($subSql) UNPIVOT INCLUDE NULLS (val FOR name IN (a, b, c)) " +
            s"GROUP BY name ORDER BY name"
        case _ =>
          s"SELECT $u1, name, val " +
            s"FROM ($subSql) UNPIVOT (val FOR name IN (a, b, c)) " +
            s"ORDER BY $u1, name, val LIMIT $n"
      }
      val build = (s: SparkSession, dir: String) => shape match {
        case "up_rollup" =>
          melted(s, dir).filter(col("val").isNotNull)
            .groupBy("name")
            .agg(count(lit(1)).as("n"), sum("val").cast("long").as("su"))
            .orderBy("name")
        case "up_incl" =>
          melted(s, dir)
            .groupBy("name")
            .agg(count(lit(1)).as("n"), count(col("val")).as("nv"),
              sum("val").cast("long").as("su"))
            .orderBy("name")
        case _ =>
          melted(s, dir).filter(col("val").isNotNull)
            .select(col(u1), col("name"), col("val"))
            .orderBy(col(u1), col("name"), col("val")).limit(n)
      }
      Generated(seed, shape, build, sqlText, sqlText)
    }

    /** LATERAL-join plan (round 16) — the correlated-subquery-in-FROM
      * surface through three front doors: Spark's `LATERAL` table
      * clause (parser + DecorrelateInnerQuery path), the Spark 4.x
      * `Dataset.lateralJoin` API with `Column.outer()` references
      * (the LateralJoin logical node built directly), and DuckDB's
      * LATERAL join. The differential matters because LATERAL is pure
      * REWRITE machinery — Catalyst decorrelates the per-row subquery
      * into an ordinary aggregate/window + equi-join, so a bug here is
      * a silent wrong-answer across a whole query class, and the
      * DataFrame spelling exercises resolution rules (outer-reference
      * marking) the SQL path never touches.
      *
      * Three shapes over the standard `joinEdges`:
      *  - `lt_agg`: CROSS `, LATERAL (SELECT count/sum FROM s WHERE
      *    sk = outer tk AND ps)` — a correlated SCALAR aggregate; the
      *    ungrouped aggregate emits exactly one row even for an empty
      *    group (count 0 / sum NULL), so the cross lateral never drops
      *    left rows and the NULL-group corner rides every seed.
      *  - `lt_topn`: per-left-row top-k — `LATERAL (… ORDER BY sv
      *    DESC, uk LIMIT k)` — the correlated-LIMIT decorrelation
      *    (Spark rewrites through a per-key row_number). The subquery
      *    orders by a non-unique value with the build table's unique
      *    key as tiebreak, so the k-cut is total and both engines
      *    must agree row-for-row.
      *  - `lt_left`: LEFT JOIN LATERAL `… LIMIT 1` ON TRUE with an
      *    extra value predicate — the subquery CAN be empty, and the
      *    left join must null-fill rather than drop; count(val) vs
      *    count(*) in the rollup splits the null-filled rows out.
      *
      * All three end in exact-integer rollups (BIGINT casts on the
      * modulus values) or a totally-ordered LIMIT cut, the family's
      * standard determinism contract. */
    def runLateral(): Generated = {
      val (lt, st, lk, sk) = pick(joinEdges)
      val p = filterFor(lt)
      // lineitem's unique key is COMPOSITE — carry every unique column
      // so the final ORDER BY + LIMIT cut is total (the explode-family
      // lesson: a LIMIT over a non-total order diverges cross-engine).
      val uCols = lt.unique
      val su = st.unique.head
      val sc = pick(st.ints)
      val m = 3 + rnd.nextInt(10)
      val n = 40 + rnd.nextInt(160)
      val leftCols = (uCols ++ (if (uCols.contains(lk)) Nil else Seq(lk)))
      def leftDf(s: SparkSession, dir: String) =
        Engine.t(s, dir, lt.name).filter(p.cond)
          .select(leftCols.map(col): _*)
      val leftSql =
        s"SELECT ${leftCols.mkString(", ")} FROM ${lt.name} WHERE ${p.sql}"
      val uSel = uCols.mkString(", ")
      rnd.nextInt(3) match {
        case 0 =>
          val shape = "lt_agg"
          val ps = onePred(st)
          // ORDER BY must extend past `uCols` to the aggregate outputs:
          // lineitem's (l_orderkey, l_linenumber) is NOT unique in the
          // synthetic data (the qualify_lag pitfall), and tied left
          // rows carry DIFFERENT join keys, hence different (c, sv) —
          // a LIMIT cut ordered on uCols alone picked different tied
          // rows per engine (seed 8 diverged by exactly one such row).
          // With (c, sv NULLS FIRST) appended, remaining ties are
          // identical output rows, so the cut is output-invariant.
          // NULLS FIRST is explicit because sv is NULL for empty
          // groups and the engines' default null order differs.
          val sqlText =
            s"SELECT $uSel, c, sv FROM ($leftSql) t, " +
              s"LATERAL (SELECT count(*) AS c, CAST(sum($sc % $m) AS BIGINT) AS sv " +
              s"FROM ${st.name} WHERE $sk = t.$lk AND ${ps.sql}) l " +
              s"ORDER BY $uSel, c, sv NULLS FIRST LIMIT $n"
          // The scalar aggregate MUST go through `.select(count(…))`
          // (aggregate-in-project): `.agg(…)` / `.groupBy().agg(…)` on
          // a Dataset whose filter holds an un-nested outer reference
          // fails EAGER analysis with UNRESOLVED_COLUMN before
          // lateralJoin ever sees the plan — a real Spark 4.1 API
          // asymmetry this family documents (select-path defers, agg
          // path checks).
          val build = (s: SparkSession, dir: String) =>
            leftDf(s, dir).lateralJoin(
              Engine.t(s, dir, st.name)
                .filter(col(sk) === col(lk).outer() && ps.cond)
                .select(count(lit(1)).as("c"),
                  sum(col(sc) % m).cast("long").as("sv")))
              .select((uCols.map(col) ++ Seq(col("c"), col("sv"))): _*)
              .orderBy(uCols.map(col) ++
                Seq(col("c"), col("sv").asc_nulls_first): _*).limit(n)
          Generated(seed, shape, build, sqlText, sqlText)
        case 1 =>
          val shape = "lt_topn"
          val k = 1 + rnd.nextInt(3)
          val sqlText =
            s"SELECT $uSel, sv, uk FROM ($leftSql) t, " +
              s"LATERAL (SELECT CAST($sc % $m AS BIGINT) AS sv, $su AS uk " +
              s"FROM ${st.name} WHERE $sk = t.$lk " +
              s"ORDER BY sv DESC, uk LIMIT $k) l " +
              s"ORDER BY $uSel, sv DESC, uk LIMIT $n"
          val build = (s: SparkSession, dir: String) =>
            leftDf(s, dir).lateralJoin(
              Engine.t(s, dir, st.name)
                .filter(col(sk) === col(lk).outer())
                .select((col(sc) % m).cast("long").as("sv"), col(su).as("uk"))
                .orderBy(col("sv").desc, col("uk")).limit(k))
              .select((uCols.map(col) ++ Seq(col("sv"), col("uk"))): _*)
              .orderBy((uCols.map(col) :+ col("sv").desc) :+ col("uk"): _*)
              .limit(n)
          Generated(seed, shape, build, sqlText, sqlText)
        case _ =>
          val shape = "lt_left"
          val ps = numPred(st)
          val sqlText =
            s"SELECT count(*) AS n, count(sv) AS nv, CAST(sum(sv) AS BIGINT) AS su " +
              s"FROM ($leftSql) t LEFT JOIN " +
              s"LATERAL (SELECT CAST($sc % $m AS BIGINT) AS sv " +
              s"FROM ${st.name} WHERE $sk = t.$lk AND ${ps.sql} " +
              s"ORDER BY sv, $su LIMIT 1) l ON TRUE"
          val build = (s: SparkSession, dir: String) =>
            leftDf(s, dir).lateralJoin(
              Engine.t(s, dir, st.name)
                .filter(col(sk) === col(lk).outer() && ps.cond)
                .select((col(sc) % m).cast("long").as("sv"), col(su))
                .orderBy(col("sv"), col(su)).limit(1)
                .select(col("sv")),
              lit(true), "left")
              .agg(count(lit(1)).as("n"), count(col("sv")).as("nv"),
                sum("sv").cast("long").as("su"))
          Generated(seed, shape, build, sqlText, sqlText)
      }
    }

    /** Set-operation plan (round 16) — UNION/INTERSECT/EXCEPT with
      * DISTINCT and ALL variants over schema-aligned projections of
      * different base tables, pinning three independently buggy
      * surfaces at once:
      *  - PRECEDENCE: `so_prec` renders `A UNION B INTERSECT C` with
      *    NO parentheses — the SQL standard binds INTERSECT tighter,
      *    so both engines must parse it as `A ∪ (B ∩ C)`; the build
      *    leg composes that grouping explicitly, so a parser that
      *    associates left-to-right diverges immediately.
      *  - BAG SEMANTICS: `so_exc`/`so_int` use EXCEPT ALL /
      *    INTERSECT ALL (multiplicity arithmetic: max(m−n, 0) /
      *    min(m, n) per row), rendered via `Dataset.exceptAll` /
      *    `intersectAll` — Spark implements these as a replicated
      *    row_number rewrite, DuckDB natively; the per-row COUNT in
      *    the closing rollup pins the multiplicities exactly.
      *  - NULL EQUALITY: every source key runs through NULLIF, and
      *    set operations compare NULLs as EQUAL (IS NOT DISTINCT
      *    FROM semantics, unlike `=`) in both engines — the NULL
      *    group rides every seed and its multiplicity is checked
      *    like any other row's.
      * Key domains are small moduli, so results are bounded and the
      * closing `GROUP BY k, j ORDER BY k, j` rollup needs no LIMIT —
      * no tie-cut analysis at all. */
    def runSetOp(): Generated = {
      def src(): (String, (SparkSession, String) => DataFrame) = {
        val t = pick(singles.filter(_.ints.size >= 2))
        val p = filterFor(t)
        val c1 = pick(t.ints)
        val c2 = pick(t.ints.filterNot(_ == c1))
        val m1 = 3 + rnd.nextInt(5)
        val m2 = 2 + rnd.nextInt(4)
        val r = rnd.nextInt(m1)
        val sql =
          s"SELECT CAST(NULLIF($c1 % $m1, $r) AS BIGINT) AS k, " +
            s"CAST($c2 % $m2 AS BIGINT) AS j FROM ${t.name} WHERE ${p.sql}"
        val df = (s: SparkSession, dir: String) =>
          Engine.t(s, dir, t.name).filter(p.cond).select(
            nullif(col(c1) % m1, lit(r)).cast("long").as("k"),
            (col(c2) % m2).cast("long").as("j"))
        (sql, df)
      }
      val (aS, aD) = src(); val (bS, bD) = src(); val (cS, cD) = src()
      // k is nullable (NULLIF) and the engines' default null order
      // differs — the close's ORDER BY pins it explicitly, both legs.
      val close = "SELECT k, j, count(*) AS n FROM (%s) " +
        "GROUP BY k, j ORDER BY k ASC NULLS FIRST, j"
      def closeDf(df: DataFrame) =
        df.groupBy("k", "j").agg(count(lit(1)).as("n"))
          .orderBy(col("k").asc_nulls_first, col("j"))
      rnd.nextInt(4) match {
        case 0 =>
          val sqlText = close.format(s"($aS) UNION ($bS) INTERSECT ($cS)")
          val build = (s: SparkSession, dir: String) =>
            closeDf(aD(s, dir).union(bD(s, dir).intersect(cD(s, dir))).distinct())
          Generated(seed, "so_prec", build, sqlText, sqlText)
        case 1 =>
          val sqlText = close.format(s"($aS) EXCEPT ALL ($bS)")
          val build = (s: SparkSession, dir: String) =>
            closeDf(aD(s, dir).exceptAll(bD(s, dir)))
          Generated(seed, "so_exc", build, sqlText, sqlText)
        case 2 =>
          val sqlText = close.format(s"($aS) INTERSECT ALL ($bS)")
          val build = (s: SparkSession, dir: String) =>
            closeDf(aD(s, dir).intersectAll(bD(s, dir)))
          Generated(seed, "so_int", build, sqlText, sqlText)
        case _ =>
          val sqlText = close.format(s"(($aS) UNION ALL ($bS)) EXCEPT ($cS)")
          val build = (s: SparkSession, dir: String) =>
            closeDf(aD(s, dir).union(bD(s, dir)).except(cD(s, dir)))
          Generated(seed, "so_mix", build, sqlText, sqlText)
      }
    }

    /** IGNORE-NULLS window plan (round 16) — the null-skipping
      * offset/frame window functions (first_value, last_value
      * forward-fill, lag, nth_value), a surface where the DIALECTS
      * literally disagree on where the modifier goes: Spark renders
      * `f(v, k) IGNORE NULLS OVER …` (postfix), DuckDB `f(v, k
      * IGNORE NULLS) OVER …` (inside the call), and the DataFrame leg
      * passes `ignoreNulls = true` parameters — three spellings of
      * one semantic that each engine parses differently.
      *
      * The null-bearer is `NULLIF(c2 % m, r)`, the window orders by
      * (unique key, v NULLS FIRST) with the null order EXPLICIT in
      * both dialects because their ASC defaults differ (Spark NULLS
      * FIRST, DuckDB NULLS LAST). Determinism under lineitem's
      * duplicated "unique" key: tied rows are identical in the full
      * (partition, order, v) tuple, so for the frame functions the
      * skipped-null scan sees the same prefix either way, and for lag
      * the per-tie-group OUTPUT MULTISET is permutation-invariant
      * (swapping identical rows permutes which of them receives which
      * lagged value but not the multiset) — the closing ORDER BY over
      * ALL output columns incl. w then makes the LIMIT cut
      * output-invariant. */
    def runIgnoreNulls(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val uCols = t.unique
      val gc = pick(t.ints)
      val vc = pick(t.ints.filterNot(_ == gc))
      val mg = 2 + rnd.nextInt(5)
      val mv = 3 + rnd.nextInt(8)
      val r = rnd.nextInt(mv)
      val n = 40 + rnd.nextInt(160)
      val uSql = uCols.map(c => s"$c ASC").mkString(", ")
      val ordSql = s"PARTITION BY g ORDER BY $uSql, v ASC NULLS FIRST"
      val frameSql = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      val subSql =
        s"SELECT ${uCols.mkString(", ")}, CAST($gc % $mg AS BIGINT) AS g, " +
          s"CAST(NULLIF($vc % $mv, $r) AS BIGINT) AS v " +
          s"FROM ${t.name} WHERE ${p.sql}"
      val k = 1 + rnd.nextInt(3)
      // (sparkCall, duckCall, apiColumn)
      val w = Window.partitionBy(col("g"))
        .orderBy((uCols.map(col(_).asc) :+ col("v").asc_nulls_first): _*)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val (shape, sparkW, duckW, apiW) = rnd.nextInt(4) match {
        case 0 => ("in_first",
          s"first_value(v) IGNORE NULLS OVER ($ordSql$frameSql)",
          s"first_value(v IGNORE NULLS) OVER ($ordSql$frameSql)",
          first(col("v"), ignoreNulls = true).over(wf))
        case 1 => ("in_last",
          s"last_value(v) IGNORE NULLS OVER ($ordSql$frameSql)",
          s"last_value(v IGNORE NULLS) OVER ($ordSql$frameSql)",
          last(col("v"), ignoreNulls = true).over(wf))
        case 2 => ("in_lag",
          s"lag(v, $k) IGNORE NULLS OVER ($ordSql)",
          s"lag(v, $k IGNORE NULLS) OVER ($ordSql)",
          lag(col("v"), k, null, ignoreNulls = true).over(w))
        case _ => ("in_nth",
          s"nth_value(v, $k) IGNORE NULLS OVER ($ordSql$frameSql)",
          s"nth_value(v, $k IGNORE NULLS) OVER ($ordSql$frameSql)",
          nth_value(col("v"), k, ignoreNulls = true).over(wf))
      }
      val outOrd = s"${uCols.mkString(", ")}, g, v ASC NULLS FIRST, w ASC NULLS FIRST"
      def sql(duck: Boolean) =
        s"SELECT ${uCols.mkString(", ")}, g, v, ${if (duck) duckW else sparkW} AS w " +
          s"FROM ($subSql) ORDER BY $outOrd LIMIT $n"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select((uCols.map(col) ++ Seq(
            (col(gc) % mg).cast("long").as("g"),
            nullif(col(vc) % mv, lit(r)).cast("long").as("v"))): _*)
          .withColumn("w", apiW)
          .orderBy((uCols.map(col) ++ Seq(col("g"),
            col("v").asc_nulls_first, col("w").asc_nulls_first)): _*)
          .limit(n)
      Generated(seed, shape, build, sql(false), sql(true))
    }

    /** TRY-arithmetic plan (round 16) — Spark's `try_add` /
      * `try_subtract` / `try_multiply` / `try_divide` overflow→NULL
      * semantics, differentially pinned against a DuckDB oracle that
      * has NO try functions at all: DuckDB evaluates the operation in
      * HUGEINT (exact INT128), range-checks the result against the
      * BIGINT domain in a CASE, and only then casts back — so Spark's
      * checked 64-bit arithmetic is validated against genuine 128-bit
      * arithmetic, two entirely different mechanisms. (Plain BIGINT
      * overflow is a hard ERROR in DuckDB and a silent wrap in
      * non-ANSI Spark — try_* is the only spelling with comparable
      * cross-engine semantics, which is exactly why it deserves a
      * generated family.)
      *
      * Operands are scaled into overflow territory (key × 2^58..2^61
      * style constants) so that BOTH regimes — in-range results and
      * overflow NULLs — ride every seed; `count(*)` vs `count(w)` in
      * the closing rollup pins the NULL count exactly, and the summed
      * value goes through `% 9973` first so the verification sum
      * cannot itself overflow. Operands are kept non-negative to stay
      * out of the C-style negative-modulo corner (a separate dialect
      * concern, out of scope the condfn way). try_divide additionally
      * pins divide-by-zero→NULL (vs NULLIF on the DuckDB side) and
      * exits in DOUBLE (both engines do correctly-rounded int→double
      * division, so the bits agree). */
    def runTryArith(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val mg = 3 + rnd.nextInt(5)
      val lo = "-9223372036854775808"
      val hi = "9223372036854775807"
      // Operand construction MUST stay inside int64 — only the TRY op
      // may overflow (a wrapped intermediate would silently diverge:
      // non-ANSI Spark wraps plain arithmetic, DuckDB computes it
      // exactly). (c1 % 16) * 2^55..58 ≤ 15 * 2^58 ≈ 4.3e18 < 2^63.
      val sh = 55 + rnd.nextInt(4)
      val aS = s"(CAST($c1 % 16 AS BIGINT) * ${1L << sh} + $c2)"
      val aC = (col(c1) % 16).cast("long") * (1L << sh) + col(c2)
      def close(sel: String, wExpr: String) =
        (s"SELECT g, count(*) AS n, count(w) AS nw, $sel " +
          s"FROM (SELECT CAST($c2 % $mg AS BIGINT) AS g, __W__ AS w " +
          s"FROM ${t.name} WHERE ${p.sql}) GROUP BY g ORDER BY g")
          .replace("__W__", wExpr)
      val sumSel = "CAST(sum(w % 9973) AS BIGINT) AS sw"
      def closeDf(w: Column, agg: Seq[Column]) = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select((col(c2) % mg).cast("long").as("g"), w.as("w"))
          .groupBy("g")
          .agg(count(lit(1)).as("n"),
            (count(col("w")).as("nw") +: agg): _*)
          .orderBy("g")
      val sumAgg = Seq(sum(col("w") % 9973).cast("long").as("sw"))
      def duckGuard(hug: String) =
        s"(CASE WHEN $hug BETWEEN $lo AND $hi THEN CAST($hug AS BIGINT) ELSE NULL END)"
      rnd.nextInt(4) match {
        case 0 =>
          // a ≤ 4.3e18, b ∈ 2..15 → a*b straddles 2^63 on real rows
          val b = 2 + rnd.nextInt(14)
          Generated(seed, "ta_mul", closeDf(try_multiply(aC, lit(b)), sumAgg),
            close(sumSel, s"try_multiply($aS, $b)"),
            close(sumSel, duckGuard(s"CAST($aS AS HUGEINT) * $b")))
        case 1 =>
          // two 0..3 × 2^61 terms (each ≤ 6.9e18): the sum overflows
          // exactly when the quarter-weights total ≥ 4 — both regimes
          // ride every seed
          val a2S = s"(CAST($c1 % 4 AS BIGINT) * ${1L << 61} + $c2)"
          val a2C = (col(c1) % 4).cast("long") * (1L << 61) + col(c2)
          val b2S = s"(CAST($c2 % 4 AS BIGINT) * ${1L << 61})"
          val b2C = (col(c2) % 4).cast("long") * (1L << 61)
          Generated(seed, "ta_add", closeDf(try_add(a2C, b2C), sumAgg),
            close(sumSel, s"try_add($a2S, $b2S)"),
            close(sumSel, duckGuard(s"CAST($a2S AS HUGEINT) + $b2S")))
        case 2 =>
          // 0 - a2 - b2 goes below -2^63 on the same ≥4 quarter-weight
          // rows; negative results also pin the C-style `% 9973` on a
          // negative dividend, which both engines share
          val a2S = s"(CAST($c1 % 4 AS BIGINT) * ${1L << 61} + $c2)"
          val a2C = (col(c1) % 4).cast("long") * (1L << 61) + col(c2)
          val b2S = s"(CAST($c2 % 4 AS BIGINT) * ${1L << 61})"
          val b2C = (col(c2) % 4).cast("long") * (1L << 61)
          Generated(seed, "ta_sub",
            closeDf(try_subtract(b2C * -1, a2C), sumAgg),
            close(sumSel, s"try_subtract($b2S * -1, $a2S)"),
            close(sumSel, duckGuard(s"CAST($b2S AS HUGEINT) * -1 - $a2S")))
        case _ =>
          val md = 4 + rnd.nextInt(8)
          val minmax = "min(w) AS mn, max(w) AS mx"
          Generated(seed, "ta_div",
            closeDf(try_divide(aC, col(c1) % md),
              Seq(min(col("w")).as("mn"), max(col("w")).as("mx"))),
            close(minmax, s"try_divide($aS, $c1 % $md)"),
            close(minmax, s"($aS / NULLIF($c1 % $md, 0))"))
      }
    }

    /** Storage-roundtrip plan (round 16) — the first GENERATIVE
      * coverage of the write path: each seed writes a derived frame to
      * scratch through a randomized layout and reads it back, and the
      * oracle is the equivalent pure query over the BASE table — so a
      * value changed, dropped, or duplicated anywhere in
      * write→layout→read is a hash mismatch. (The declared k-family
      * pins specific layouts; this family varies them per seed.)
      *
      * Shapes:
      *  - `st_part`: parquet write `partitionBy(k)` → read back with a
      *    point filter on the partition column → rollup. Pins
      *    directory-encoding roundtrip of the partition value and
      *    partition pruning (the read's filter prunes to one
      *    directory); k is re-cast on read because partition-column
      *    type inference (dir names are strings) must not leak into
      *    the compared schema.
      *  - `st_csv`: CSV roundtrip with header through scratch,
      *    explicit read schema (no inference drift), integer + string
      *    columns — pins the text encode/decode path generatively.
      *  - `st_app`: two overlapping filtered writes, the second in
      *    append mode → read → rollup; the oracle is the UNION ALL of
      *    the same two subqueries, so dropped-or-doubled appends (and
      *    overwrite-vs-append mode bugs) surface as count drift.
      *
      * The build leg is the only one that touches storage; sparkSql /
      * duckSql render the pure relational equivalent, which is the
      * invariant the family asserts: STORAGE IS SEMANTICALLY
      * INVISIBLE. Writes go to `Engine.scratch` (per-app tree, shutdown
      * hook cleans up). */
    def runStorage(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val m = 3 + rnd.nextInt(6)
      val m2 = 3 + rnd.nextInt(8)
      val kS = s"CAST($c1 % $m AS BIGINT)"
      val jS = s"CAST($c2 % $m2 AS BIGINT)"
      def kC = (col(c1) % m).cast("long")
      def jC = (col(c2) % m2).cast("long")
      rnd.nextInt(3) match {
        case 0 =>
          val r = rnd.nextInt(m)
          val sqlText =
            s"SELECT k, count(*) AS n, CAST(sum(j) AS BIGINT) AS sj FROM " +
              s"(SELECT $kS AS k, $jS AS j FROM ${t.name} WHERE ${p.sql}) " +
              s"WHERE k = $r GROUP BY k ORDER BY k"
          val build = (s: SparkSession, dir: String) => {
            val path = Engine.scratch(s, dir, s"fzst_part_$seed")
            Engine.t(s, dir, t.name).filter(p.cond)
              .select(kC.as("k"), jC.as("j"))
              .write.mode("overwrite").partitionBy("k").parquet(path)
            // explicit schema: an empty filtered write leaves only
            // _SUCCESS and schema inference fails (found by the 300
            // sweep on 4 empty-source seeds); it also pins the
            // partition column back to LONG instead of the dir-name
            // inference's INT
            s.read.schema("j LONG, k LONG").parquet(path)
              .filter(col("k") === r)
              .select(col("k"), col("j"))
              .groupBy("k")
              .agg(count(lit(1)).as("n"), sum("j").cast("long").as("sj"))
              .orderBy("k")
          }
          Generated(seed, "st_part", build, sqlText, sqlText)
        case 1 =>
          val catOpt = if (t.cats.nonEmpty) Some(pick(t.cats.keys.toSeq.sorted)) else None
          val cSel = catOpt.map(c => s", $c AS c").getOrElse(", 'x' AS c")
          val sqlText =
            s"SELECT k, c, count(*) AS n, CAST(sum(j) AS BIGINT) AS sj FROM " +
              s"(SELECT $kS AS k, $jS AS j$cSel FROM ${t.name} WHERE ${p.sql}) " +
              s"GROUP BY k, c ORDER BY k, c"
          val build = (s: SparkSession, dir: String) => {
            val path = Engine.scratch(s, dir, s"fzst_csv_$seed")
            Engine.t(s, dir, t.name).filter(p.cond)
              .select(kC.as("k"), jC.as("j"),
                catOpt.map(col).getOrElse(lit("x")).as("c"))
              .write.mode("overwrite").option("header", "true").csv(path)
            s.read.schema("k LONG, j LONG, c STRING")
              .option("header", "true").csv(path)
              .groupBy("k", "c")
              .agg(count(lit(1)).as("n"), sum("j").cast("long").as("sj"))
              .orderBy("k", "c")
          }
          Generated(seed, "st_csv", build, sqlText, sqlText)
        case _ =>
          val p2 = filterFor(t)
          def leg(pred: Pred) = s"SELECT $kS AS k, $jS AS j FROM ${t.name} WHERE ${pred.sql}"
          val sqlText =
            s"SELECT k, count(*) AS n, CAST(sum(j) AS BIGINT) AS sj FROM " +
              s"(${leg(p)} UNION ALL ${leg(p2)}) GROUP BY k ORDER BY k"
          val build = (s: SparkSession, dir: String) => {
            val path = Engine.scratch(s, dir, s"fzst_app_$seed")
            def proj(pred: Column) = Engine.t(s, dir, t.name).filter(pred)
              .select(kC.as("k"), jC.as("j"))
            proj(p.cond).write.mode("overwrite").parquet(path)
            proj(p2.cond).write.mode("append").parquet(path)
            s.read.schema("k LONG, j LONG").parquet(path)
              .groupBy("k")
              .agg(count(lit(1)).as("n"), sum("j").cast("long").as("sj"))
              .orderBy("k")
          }
          Generated(seed, "st_app", build, sqlText, sqlText)
      }
    }

    /** Map-function plan (round 16) — the MAP scalar surface as a
      * dialect mapping with a genuinely different TYPE CONTRACT on the
      * other side: Spark's `element_at(map, k)` returns the VALUE (or
      * NULL when absent), DuckDB's map extraction `m[k]` returns a
      * LIST (empty when absent), so the oracle rendering bridges with
      * a 1-based list subscript `m[k][1]` — absent key ⇒ empty list ⇒
      * NULL, which is exactly `try_element_at`'s contract. Maps are
      * built from derived entries with STRUCTURALLY DISTINCT keys
      * (k, k+m, k+2m) because BOTH engines reject duplicate map keys
      * at runtime, and both preserve construction order in
      * `map_keys`/`map_values` (pinned by the join shape). Array
      * subscripting inside the shapes pins the 0-based (Spark) vs
      * 1-based (DuckDB) divergence explicitly.
      *
      * Shapes: `mp_get` keyed extraction incl. the absent-key NULL
      * (count(*) vs count(w) splits it), `mp_card` cardinality,
      * `mp_keys` construction-order key join, `mp_vals` positional
      * value access. All end in the standard exact rollup. */
    def runMapFn(): Generated = {
      val t = pick(singles.filter(_.ints.size >= 2))
      val p = filterFor(t)
      val c1 = pick(t.ints)
      val c2 = pick(t.ints.filterNot(_ == c1))
      val m = 3 + rnd.nextInt(6)
      val m2 = 4 + rnd.nextInt(9)
      // three distinct keys k, k+m, k+2m; values are small derived ints
      val kS = s"CAST($c1 % $m AS BIGINT)"
      val v1S = s"CAST($c2 % $m2 AS BIGINT)"
      val v2S = s"CAST(($c1 + $c2) % $m2 AS BIGINT)"
      val v3S = s"CAST($c2 % 3 AS BIGINT)"
      val mapS = s"map($kS, $v1S, $kS + $m, $v2S, $kS + ${2 * m}, $v3S)"
      val mapD = s"MAP([$kS, $kS + $m, $kS + ${2 * m}], [$v1S, $v2S, $v3S])"
      val kC = (col(c1) % m).cast("long")
      val v1C = (col(c2) % m2).cast("long")
      val v2C = ((col(c1) + col(c2)) % m2).cast("long")
      val v3C = (col(c2) % 3).cast("long")
      val mapC = map(kC, v1C, kC + m, v2C, kC + 2 * m, v3C)
      val (shape, bS, bD, bCol) = rnd.nextInt(4) match {
        case 0 =>
          // probe key drawn PAST the first key's range half the time →
          // the absent-key NULL regime rides the seed space
          val probe = rnd.nextInt(2 * m)
          ("mp_get", s"try_element_at($mapS, CAST($probe AS BIGINT))",
            s"$mapD[$probe][1]",
            try_element_at(mapC, lit(probe.toLong)))
        case 1 =>
          ("mp_card", s"cardinality($mapS)", s"cardinality($mapD)",
            size(mapC).cast("long"))
        case 2 =>
          ("mp_keys",
            s"array_join(map_keys($mapS), ',')",
            s"array_to_string(map_keys($mapD), ',')",
            array_join(map_keys(mapC).cast("array<string>"), ","))
        case _ =>
          // positional access: Spark [] is 0-based, DuckDB [] is 1-based
          val i = rnd.nextInt(3)
          ("mp_vals", s"map_values($mapS)[$i]", s"map_values($mapD)[${i + 1}]",
            map_values(mapC)(i))
      }
      def sql(duck: Boolean) = {
        val b = if (duck) bD else bS
        val cnt = if (shape == "mp_get") ", count(w) AS nw" else ""
        val (sel, grp) =
          if (shape == "mp_keys") ("w AS bkt", "bkt")
          else ("CAST(w AS BIGINT) AS bkt", "bkt")
        s"SELECT $sel, count(*) AS n$cnt FROM " +
          s"(SELECT $b AS w FROM ${t.name} WHERE ${p.sql}) " +
          s"GROUP BY w ORDER BY $grp ASC NULLS FIRST"
      }
      val build = (s: SparkSession, dir: String) => {
        val base = Engine.t(s, dir, t.name).filter(p.cond)
          .select(bCol.as("w"))
        val withBkt =
          if (shape == "mp_keys") base.withColumn("bkt", col("w"))
          else base.withColumn("bkt", col("w").cast("long"))
        val aggd =
          if (shape == "mp_get")
            withBkt.groupBy("bkt").agg(count(lit(1)).as("n"),
              count(col("w")).as("nw"))
          else withBkt.groupBy("bkt").agg(count(lit(1)).as("n"))
        aggd.orderBy(col("bkt").asc_nulls_first)
      }
      Generated(seed, shape, build, sql(false), sql(true))
    }

    /** String-function plan (round 16) — the shared-name scalar string
      * surface whose CONTRACT CORNERS are easy to get silently wrong:
      *  - `sf_split`: `split_part(s, '-', i)` where the index draw
      *    includes OUT-OF-RANGE — both engines must return the empty
      *    string, not NULL (a count(*) = count-nonempty split in the
      *    rollup would expose a NULL-returning engine);
      *  - `sf_pad`: `lpad(digits, w, '0')` where w is drawn BELOW the
      *    source length as well as above — both engines truncate, and
      *    a pad-only implementation diverges immediately;
      *  - `sf_rep`: `repeat(substring(c, 1, 2), n)` composition;
      *  - `sf_trans`: `translate(c, 'AEIOU', 'aeiou')` character
      *    mapping over the categorical domains.
      * The only dialect split is the integer→string cast spelling
      * (Spark `CAST(x AS STRING)`, DuckDB `CAST(x AS VARCHAR)` — the
      * stragg lesson: Spark rejects un-lengthed VARCHAR). Results are
      * grouped and counted (string group keys, lexicographic order —
      * both engines agree on ASCII), the family's standard exact
      * rollup. */
    def runStrFn(): Generated = {
      val t = pick(singles.filter(_.cats.nonEmpty))
      val p = filterFor(t)
      val cat = pick(t.cats.keys.toSeq.sorted)
      val c1 = pick(t.ints)
      val m = 5 + rnd.nextInt(20)
      def numStr(duck: Boolean) =
        s"CAST($c1 % $m AS ${if (duck) "VARCHAR" else "STRING"})"
      val numC = (col(c1) % m).cast("string")
      val (shape, bS: (Boolean => String), bCol) = rnd.nextInt(4) match {
        case 0 =>
          val i = 1 + rnd.nextInt(4) // parts: 3 → indices 3..4 are out-of-range sometimes
          ("sf_split",
            (d: Boolean) => s"split_part(concat($cat, '-', ${numStr(d)}, '-', $cat), '-', $i)",
            split_part(concat(col(cat), lit("-"), numC, lit("-"), col(cat)),
              lit("-"), lit(i)))
        case 1 =>
          val w = 1 + rnd.nextInt(6) // below AND above the source length
          ("sf_pad",
            (d: Boolean) => s"lpad(${numStr(d)}, $w, '0')",
            lpad(numC, w, "0"))
        case 2 =>
          val n = 1 + rnd.nextInt(3)
          ("sf_rep",
            (_: Boolean) => s"repeat(substring($cat, 1, 2), $n)",
            repeat(substring(col(cat), 1, 2), n))
        case _ =>
          ("sf_trans",
            (_: Boolean) => s"translate($cat, 'AEIOU', 'aeiou')",
            translate(col(cat), "AEIOU", "aeiou"))
      }
      def sql(duck: Boolean) =
        s"SELECT w AS bkt, count(*) AS n, " +
          s"CAST(sum(length(w)) AS BIGINT) AS sl FROM " +
          s"(SELECT ${bS(duck)} AS w FROM ${t.name} WHERE ${p.sql}) " +
          s"GROUP BY w ORDER BY bkt"
      val build = (s: SparkSession, dir: String) =>
        Engine.t(s, dir, t.name).filter(p.cond)
          .select(bCol.as("w"))
          .groupBy(col("w").as("bkt"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("w"))).cast("long").as("sl"))
          .orderBy("bkt")
      Generated(seed, shape, build, sql(false), sql(true))
    }
  }

  /** Composite window→agg plan for the same seed space — see
    * [[Gen.runComposite]]. */
  def generateComposite(seed: Long): Generated = new Gen(seed).runComposite()

  /** Join-surface plan for the same seed space — see [[Gen.runJoin]].
    * Separate entry point (like [[generateComposite]]) so the frozen
    * base-seed→shape mapping is untouched (ADVICE r9 #5: joins are
    * where silent wrong-answer bugs live). */
  def generateJoin(seed: Long): Generated = new Gen(seed).runJoin()

  /** Scalar-expression-tree plan — see [[Gen.runScalar]]. */
  def generateScalar(seed: Long): Generated = new Gen(seed).runScalar()

  /** ROWS-frame running-agg / lag / lead plan — see [[Gen.runFrame]]. */
  def generateFrame(seed: Long): Generated = new Gen(seed).runFrame()

  /** RANGE-frame (value-based) window plan — see [[Gen.runRangeFrame]]. */
  def generateRangeFrame(seed: Long): Generated = new Gen(seed).runRangeFrame()

  /** Extended aggregate-function plan — see [[Gen.runAggFns]]. */
  def generateAggFns(seed: Long): Generated = new Gen(seed).runAggFns()

  /** ROLLUP/CUBE subtotal plan — see [[Gen.runRollup]]. */
  def generateRollup(seed: Long): Generated = new Gen(seed).runRollup()

  /** Correlated-subquery plan (IN / NOT IN, theta-EXISTS, scalar) —
    * see [[Gen.runSubq]]. */
  def generateSubq(seed: Long): Generated = new Gen(seed).runSubq()

  /** 3-table mixed-join chain/star plan — see [[Gen.runChain3]]. */
  def generateChain3(seed: Long): Generated = new Gen(seed).runChain3()

  /** Multi-DISTINCT aggregate plan (Expand path) — see [[Gen.runDistinct]]. */
  def generateDistinct(seed: Long): Generated = new Gen(seed).runDistinct()

  /** GROUPING SETS + grouping() plan — see [[Gen.runGroupingSets]]. */
  def generateGroupingSets(seed: Long): Generated = new Gen(seed).runGroupingSets()

  /** Explicit NULLS FIRST/LAST ordering plan — see [[Gen.runNullOrder]]. */
  def generateNullOrder(seed: Long): Generated = new Gen(seed).runNullOrder()

  /** ASOF-join plan (native ASOF JOIN on DuckDB vs window rewrite on
    * Spark) — see [[Gen.runAsof]]. */
  def generateAsof(seed: Long): Generated = new Gen(seed).runAsof()

  /** LIMIT n OFFSET o BY g plan (QUALIFY on DuckDB vs row_number
    * subquery on Spark) — see [[Gen.runLimitBy]]. */
  def generateLimitBy(seed: Long): Generated = new Gen(seed).runLimitBy()

  /** WITH FILL gap-filling plan (generate_series vs explode(sequence))
    * — see [[Gen.runWithFill]]. */
  def generateWithFill(seed: Long): Generated = new Gen(seed).runWithFill()

  /** Window-predicate plan (native QUALIFY on DuckDB vs subquery+WHERE
    * rewrite on Spark) — see [[Gen.runQualify]]. */
  def generateQualify(seed: Long): Generated = new Gen(seed).runQualify()

  /** Distribution window-function plan (ntile / percent_rank /
    * cume_dist bucket fingerprints) — see [[Gen.runDistWin]]. */
  def generateDistWin(seed: Long): Generated = new Gen(seed).runDistWin()

  /** Calendar time-bucketing plan (date_trunc / EXTRACT rollups) —
    * see [[Gen.runTimeBucket]]. */
  def generateTimeBucket(seed: Long): Generated = new Gen(seed).runTimeBucket()

  /** Array-aggregation plan (sorted/distinct/sliced/indexed collected
    * lists, canonical string presentation) — see [[Gen.runArrAgg]]. */
  def generateArrAgg(seed: Long): Generated = new Gen(seed).runArrAgg()

  /** PIVOT plan (Spark PIVOT clause / RelationalGroupedDataset.pivot /
    * DuckDB CASE rollup) — see [[Gen.runPivot]]. */
  def generatePivot(seed: Long): Generated = new Gen(seed).runPivot()

  /** Row-generator (explode / LATERAL VIEW / unnest) plan — see
    * [[Gen.runExplode]]. */
  def generateExplode(seed: Long): Generated = new Gen(seed).runExplode()

  /** Date-arithmetic plan (interval shift / anchored datediff /
    * last_day) — see [[Gen.runDateArith]]. */
  def generateDateArith(seed: Long): Generated = new Gen(seed).runDateArith()

  /** JOIN USING plan (usingColumns / parser UsingJoin / DuckDB USING)
    * — see [[Gen.runUsing]]. */
  def generateUsing(seed: Long): Generated = new Gen(seed).runUsing()

  /** FILTER-clause aggregate plan (AggregateExpression.filter vs
    * CASE-folded inputs vs DuckDB native FILTER) — see
    * [[Gen.runFilterAgg]]. */
  def generateFilterAgg(seed: Long): Generated = new Gen(seed).runFilterAgg()

  /** Ordered string-aggregation plan (listagg WITHIN GROUP /
    * sorted collect_list / DuckDB string_agg ORDER BY) — see
    * [[Gen.runStrAgg]]. */
  def generateStrAgg(seed: Long): Generated = new Gen(seed).runStrAgg()

  /** VALUES inline-table plan (parser inline table / createDataFrame
    * LocalRelation / DuckDB VALUES) — see [[Gen.runValues]]. */
  def generateValues(seed: Long): Generated = new Gen(seed).runValues()

  /** SELECT-sugar plan (lateral column aliases / GROUP BY ordinals vs
    * their desugared DataFrame forms) — see [[Gen.runSugar]]. */
  def generateSugar(seed: Long): Generated = new Gen(seed).runSugar()

  /** Conditional-function plan (greatest/least clamps, NULLIF,
    * COALESCE chains) — see [[Gen.runCondFn]]. */
  def generateCondFn(seed: Long): Generated = new Gen(seed).runCondFn()

  /** Array-function plan (Spark `array_*` vs DuckDB `list_*` dialect
    * mapping) — see [[Gen.runArrFn]]. */
  def generateArrFn(seed: Long): Generated = new Gen(seed).runArrFn()

  /** UNPIVOT/melt plan (UNPIVOT clause / Dataset.unpivot / DuckDB
    * UNPIVOT, EXCLUDE- vs INCLUDE-NULLS defaults) — see
    * [[Gen.runUnpivot]]. */
  def generateUnpivot(seed: Long): Generated = new Gen(seed).runUnpivot()

  /** LATERAL-join plan (LATERAL clause / Dataset.lateralJoin with
    * Column.outer() / DuckDB LATERAL) — see [[Gen.runLateral]]. */
  def generateLateral(seed: Long): Generated = new Gen(seed).runLateral()

  /** Set-operation plan (UNION/INTERSECT/EXCEPT precedence, ALL-variant
    * bag semantics, set-op NULL equality) — see [[Gen.runSetOp]]. */
  def generateSetOp(seed: Long): Generated = new Gen(seed).runSetOp()

  /** IGNORE-NULLS window plan (first/last/lag/nth_value null-skipping,
    * three modifier spellings) — see [[Gen.runIgnoreNulls]]. */
  def generateIgnoreNulls(seed: Long): Generated = new Gen(seed).runIgnoreNulls()

  /** TRY-arithmetic plan (checked 64-bit overflow→NULL vs a DuckDB
    * HUGEINT range-check oracle) — see [[Gen.runTryArith]]. */
  def generateTryArith(seed: Long): Generated = new Gen(seed).runTryArith()

  /** Storage-roundtrip plan (randomized write layout → read-back ≡
    * pure query; storage is semantically invisible) — see
    * [[Gen.runStorage]]. */
  def generateStorage(seed: Long): Generated = new Gen(seed).runStorage()

  /** Map-function plan (element_at value-contract vs DuckDB's
    * list-returning extraction, 0- vs 1-based subscripts) — see
    * [[Gen.runMapFn]]. */
  def generateMapFn(seed: Long): Generated = new Gen(seed).runMapFn()

  /** String-function plan (split_part out-of-range, lpad truncation,
    * repeat/translate compositions) — see [[Gen.runStrFn]]. */
  def generateStrFn(seed: Long): Generated = new Gen(seed).runStrFn()

  /** ClickHouse-dialect TEXT plan fuzzing the [[graft.ChSql]] rewriter
    * (PREWHERE / LIMIT n BY / WITH FILL); `sparkSql` is CH text meant
    * for `ChSql.sql`, NOT `spark.sql` — see [[Gen.runChSql]]. */
  def generateChSql(seed: Long): Generated = new Gen(seed).runChSql()

  /** NESTED CH-dialect text (subquery PREWHERE) — see [[Gen.runChNested]]. */
  def generateChNested(seed: Long): Generated = new Gen(seed).runChNested()

  /** CH FUNCTION-NAME text (toYYYYMM/countIf/uniqExact/multiIf/
    * quantile(q)(x)/…) resolving through [[graft.ChNames]] — see
    * [[Gen.runChFns]]. */
  def generateChFns(seed: Long): Generated = new Gen(seed).runChFns()

  /** CH-function-name family 2 — the r20 ChNames widening; see
    * [[Gen.runChFns2]]. */
  def generateChFns2(seed: Long): Generated = new Gen(seed).runChFns2()
}
