package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{Auth, HttpSqlEndpoint}

/** Round-20 DDL-door semantics: REAL materialized views (VERDICT r19
  * next #1 — reads hit a Parquet target, maintenance is insert-driven
  * and incremental where the shape allows), the ALTER TABLE text
  * grammar (next #2), and the TRUNCATE/DROP ingest-state reset
  * (ADVICE r19: retained batch dirs resurrected truncated rows). */
class DdlMutationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String) = ChSql.sql(spark, q)
  private def insert(q: String): Long =
    HttpSqlEndpoint.ingest(spark, q).getOrElse(fail(s"not an INSERT: $q"))
  private def rows(q: String): Seq[Seq[Any]] =
    sql(q).collect().toSeq.map(_.toSeq)

  // ---- materialized views -------------------------------------------------

  test("aggregate MV: reads hit the materialized target, never the source") {
    sql("CREATE TABLE mvm_src (k String, v Int64) ENGINE = MergeTree ORDER BY k")
    sql("""CREATE MATERIALIZED VIEW mvm_agg AS
          |SELECT k, count(*) AS c, sum(v) AS s, min(v) AS lo, max(v) AS hi
          |FROM mvm_src WHERE v > 0 GROUP BY k""".stripMargin)
    // the re-aggregatable single-source GROUP BY classifies incremental
    assert(ChDdl.mvModeFor("mvm_agg").exists(_.startsWith("AggInc")))
    insert("INSERT INTO mvm_src VALUES ('a', 3), ('a', 5), ('b', 7), ('b', -1)")
    insert("INSERT INTO mvm_src VALUES ('a', 2), ('c', 9)")
    assert(rows("SELECT k, c, s, lo, hi FROM mvm_agg ORDER BY k") ==
      Seq(Seq("a", 3L, 10L, 2L, 5L), Seq("b", 1L, 7L, 7L, 7L), Seq("c", 1L, 9L, 9L, 9L)))
    // THE materialization proof: every input file of an MV read is the
    // MV's own Parquet target — zero source files in the scan
    val files = spark.table("mvm_agg").inputFiles
    assert(files.nonEmpty, "MV must be Parquet-backed")
    assert(files.forall(_.contains("/mv_mvm_agg_")), files.mkString(", "))
    // …and equals the full recompute (the J1 batch-equivalence bar)
    assert(rows("SELECT k, c, s FROM mvm_agg ORDER BY k") ==
      rows("SELECT k, count(*) AS c, sum(v) AS s FROM mvm_src WHERE v > 0 GROUP BY k ORDER BY k"))
    sql("DROP TABLE mvm_agg"); sql("DROP TABLE mvm_src")
  }

  test("projection MV appends per block; non-incrementalizable shapes recompute — both materialized") {
    sql("CREATE TABLE mvm_src2 (k String, v Int64) ENGINE = MergeTree ORDER BY k")
    sql("CREATE MATERIALIZED VIEW mvm_proj AS SELECT k, v * 2 AS v2 FROM mvm_src2 WHERE v > 0")
    assert(ChDdl.mvModeFor("mvm_proj").exists(_.startsWith("AppendInc")))
    // a CAST around the aggregate is not mergeable → eager recompute
    sql("""CREATE MATERIALIZED VIEW mvm_eager AS
          |SELECT k, CAST(sum(v) AS DOUBLE) AS s FROM mvm_src2 GROUP BY k""".stripMargin)
    assert(ChDdl.mvModeFor("mvm_eager").contains("Recompute"))
    insert("INSERT INTO mvm_src2 VALUES ('a', 1), ('b', -5)")
    insert("INSERT INTO mvm_src2 VALUES ('a', 10)")
    assert(rows("SELECT k, v2 FROM mvm_proj ORDER BY v2") ==
      Seq(Seq("a", 2L), Seq("a", 20L)))
    assert(rows("SELECT k, s FROM mvm_eager ORDER BY k") ==
      Seq(Seq("a", 11.0), Seq("b", -5.0)))
    Seq("mvm_proj", "mvm_eager").foreach { mv =>
      assert(spark.table(mv).inputFiles.forall(_.contains(s"/mv_${mv}_")))
    }
    sql("DROP TABLE mvm_proj"); sql("DROP TABLE mvm_eager"); sql("DROP TABLE mvm_src2")
  }

  // ---- TRUNCATE / DROP ingest-state reset (ADVICE r19) -------------------

  test("TRUNCATE does not resurrect rows on the next insert") {
    sql("CREATE TABLE mvm_tr (k Int64) ENGINE = MergeTree ORDER BY k")
    insert("INSERT INTO mvm_tr VALUES (1), (2)")
    sql("TRUNCATE TABLE mvm_tr")
    assert(rows("SELECT k FROM mvm_tr").isEmpty)
    insert("INSERT INTO mvm_tr VALUES (3)")
    assert(rows("SELECT k FROM mvm_tr ORDER BY k") == Seq(Seq(3L)),
      "pre-TRUNCATE batches must not re-union into the view")
    sql("DROP TABLE mvm_tr")
  }

  test("DROP + re-CREATE with a different schema starts clean") {
    sql("CREATE TABLE mvm_dr (k Int64) ENGINE = MergeTree ORDER BY k")
    insert("INSERT INTO mvm_dr VALUES (1)")
    sql("DROP TABLE mvm_dr")
    sql("CREATE TABLE mvm_dr (name String, n Int64) ENGINE = MergeTree ORDER BY name")
    insert("INSERT INTO mvm_dr VALUES ('x', 42)")
    assert(rows("SELECT name, n FROM mvm_dr") == Seq(Seq("x", 42L)))
    sql("DROP TABLE mvm_dr")
  }

  // ---- ALTER TABLE grammar (VERDICT r19 next #2) -------------------------

  test("ALTER TABLE ADD COLUMN: type default, explicit DEFAULT, inserts honor the new schema") {
    sql("CREATE TABLE mvm_al (k Int64, s String) ENGINE = MergeTree ORDER BY k")
    insert("INSERT INTO mvm_al VALUES (1, 'a')")
    sql("ALTER TABLE mvm_al ADD COLUMN n UInt32")          // type default = 0
    sql("ALTER TABLE mvm_al ADD COLUMN tag String DEFAULT 'legacy'")
    assert(rows("SELECT k, s, n, tag FROM mvm_al") == Seq(Seq(1L, "a", 0L, "legacy")))
    // IF NOT EXISTS tolerates a duplicate; bare ADD COLUMN refuses
    sql("ALTER TABLE mvm_al ADD COLUMN IF NOT EXISTS n UInt32")
    intercept[IllegalArgumentException](sql("ALTER TABLE mvm_al ADD COLUMN n UInt32"))
    insert("INSERT INTO mvm_al VALUES (2, 'b', 7, 'fresh')")
    assert(rows("SELECT k, n, tag FROM mvm_al ORDER BY k") ==
      Seq(Seq(1L, 0L, "legacy"), Seq(2L, 7L, "fresh")))
    // SHOW CREATE reflects the widened schema
    val stmt = rows("SHOW CREATE TABLE mvm_al").head.head.toString
    assert(stmt.contains("`n` Int64") && stmt.contains("`tag` String"))
    sql("DROP TABLE mvm_al")
  }

  test("ALTER TABLE DELETE/UPDATE: K11 mutation-as-rewrite semantics incl. NULL predicates") {
    sql("CREATE TABLE mvm_mu (k Int64, v Nullable(Int64)) ENGINE = MergeTree ORDER BY k")
    insert("INSERT INTO mvm_mu VALUES (1, 10), (2, 20), (3, NULL)")
    // DELETE removes only rows where the predicate is TRUE (NULL kept)
    sql("ALTER TABLE mvm_mu DELETE WHERE v > 15")
    assert(rows("SELECT k FROM mvm_mu ORDER BY k") == Seq(Seq(1L), Seq(3L)))
    // UPDATE assigns only where TRUE; NULL predicate leaves the row
    sql("ALTER TABLE mvm_mu UPDATE v = v + 1, k = k * 10 WHERE v >= 10")
    assert(rows("SELECT k, v FROM mvm_mu ORDER BY k") ==
      Seq(Seq(3L, null), Seq(10L, 11L)))
    // a later insert bases on the mutated view, not pre-ALTER batches
    insert("INSERT INTO mvm_mu VALUES (4, 40)")
    assert(rows("SELECT count(*) AS c FROM mvm_mu") == Seq(Seq(3L)))
    sql("DROP TABLE mvm_mu")
  }

  test("system.tables/columns/databases/one resolve from SQL text (all doors share ChSql)") {
    sql("CREATE TABLE mvm_sys (k Int64, s Nullable(String)) ENGINE = MergeTree ORDER BY k")
    assert(rows("SELECT 1 FROM system.one") == Seq(Seq(1)))
    assert(rows("SELECT name FROM system.databases") == Seq(Seq("default")))
    assert(rows("SELECT engine FROM system.tables WHERE name = 'mvm_sys'") ==
      Seq(Seq("MergeTree")))
    // the BI-tool shape: `table` is ANSI-reserved in Spark but must
    // work as the CH filter column; types come back as CH names
    assert(rows(
      """SELECT name, type, CAST(position AS INT) AS p FROM system.columns
        |WHERE database = 'default' AND table = 'mvm_sys' ORDER BY p""".stripMargin) ==
      Seq(Seq("k", "Int64", 1), Seq("s", "Nullable(String)", 2)))
    // the views track the LIVE catalog: ALTER widens, DROP removes
    sql("ALTER TABLE mvm_sys ADD COLUMN extra UInt32")
    assert(rows("SELECT count(*) AS c FROM system.columns WHERE table = 'mvm_sys'") ==
      Seq(Seq(3L)))
    sql("DROP TABLE mvm_sys")
    assert(rows("SELECT count(*) AS c FROM system.tables WHERE name = 'mvm_sys'") ==
      Seq(Seq(0L)))
    // a literal containing the dotted name is data, not a relation
    assert(rows("SELECT 'see system.columns docs' AS s") ==
      Seq(Seq("see system.columns docs")))
  }

  test("ALTER over the HTTP door; readonly profile rejects it with Code: 164") {
    def http(running: HttpSqlEndpoint.Running, q: String,
        headers: Map[String, String] = Map.empty): (Int, String) = {
      val conn = new java.net.URL(running.url + "/")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setDoOutput(true)
      conn.getOutputStream.write(q.getBytes("UTF-8"))
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = new String(in.readAllBytes(), "UTF-8")
      conn.disconnect()
      (code, text)
    }
    val rw = HttpSqlEndpoint.start(spark, 0, auth = None)
    try {
      http(rw, "CREATE TABLE mvm_http (k Int64, v Int64) ENGINE = MergeTree ORDER BY k")
      http(rw, "INSERT INTO mvm_http VALUES (1, 5), (2, 50)")
      assert(http(rw, "ALTER TABLE mvm_http ADD COLUMN w Int64 DEFAULT k + v")._1 == 200)
      assert(http(rw, "ALTER TABLE mvm_http DELETE WHERE v >= 50")._1 == 200)
      assert(http(rw, "SELECT k, v, w FROM mvm_http FORMAT TabSeparated")._2 == "1\t5\t6\n")
    } finally rw.stop()
    val ro = HttpSqlEndpoint.start(spark, 0, auth = Some(Auth("ro", "", readonly = true)))
    try {
      val h = Map("X-ClickHouse-User" -> "ro", "X-ClickHouse-Key" -> "")
      val (c, b) = http(ro, "ALTER TABLE mvm_http DELETE WHERE k = 1", h)
      assert(c == 403 && b.startsWith("Code: 164."))
    } finally { ro.stop(); sql("DROP TABLE mvm_http"): Unit }
  }
}
