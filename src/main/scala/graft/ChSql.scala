package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse-dialect SQL *text* front door (VERDICT r16 #7): a light
  * pre-parse rewrite so the CH-specific clauses the engine already
  * implements as DataFrame builders can be PASTED as SQL text —
  * `PREWHERE` (ops/Basics.scala b3), `FROM t FINAL` (b6),
  * `LIMIT n BY cols` (ops/SortsLimits.scala f4) and
  * `ORDER BY c WITH FILL FROM a TO b [STEP s]` (f5) — then handed to
  * `spark.sql`. Reference surface: the pinned ClickHouse 25.7 binary's
  * SELECT grammar (reference Dockerfile:102-126); semantics follow the
  * CH docs for each clause.
  *
  * Scope (documented, deliberately narrow): the rewrites are
  * top-level-clause string transforms. Queries that nest these
  * keywords inside subqueries or string literals are out of scope —
  * unrewritten CH syntax then fails loudly in Spark's parser rather
  * than being silently mis-rewritten. Everything the rewriter emits is
  * plain Spark SQL, so the result plans through Catalyst like any
  * other text query (WindowGroupLimit for LIMIT BY, partial max_by
  * aggregation for FINAL, a spine join for WITH FILL).
  */
object ChSql {

  /** ReplacingMergeTree metadata for `FINAL`: table → (sorting-key
    * columns, version column). CH gets this from the table's engine
    * DDL; here the caller registers it (the K10 DDL surface analog).
    * For deterministic results the version must be unique per key —
    * same caveat as CH's own FINAL with duplicate versions. */
  private val finalReg =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], String)]()

  def registerFinal(table: String, keyCols: Seq[String], versionCol: String): Unit =
    finalReg.put(table.toLowerCase, (keyCols, versionCol))

  /** Run CH-dialect SQL text. */
  def sql(spark: SparkSession, text: String): DataFrame =
    spark.sql(rewrite(spark, text))

  private def bq(name: String): String =
    if (name.startsWith("`")) name else "`" + name + "`"

  /** Rewrite CH-dialect text to plain Spark SQL (exposed for specs). */
  def rewrite(spark: SparkSession, text: String): String = {
    var q = text.trim.stripSuffix(";").trim
    q = rewritePrewhere(q)
    q = rewriteFinal(spark, q)
    q = rewriteWithFill(spark, q)
    q = rewriteLimitBy(spark, q)
    q
  }

  /** `PREWHERE p [WHERE w]` → `WHERE (p) AND (w)`. In CH, PREWHERE is
    * WHERE plus a column-read-ordering hint; Spark's parquet scan
    * already evaluates pushed predicates before materializing the
    * projection (PushedFilters), so the hint maps to a plain
    * conjunction — the exact equivalence b3_prewhere pins. */
  private val PrewhereWhereRe =
    "(?is)\\bPREWHERE\\s+(.+?)\\s+WHERE\\s+(.+?)(\\s+(?:GROUP\\s+BY|HAVING|ORDER\\s+BY|LIMIT)\\b.*)?$".r
  private def rewritePrewhere(q: String): String =
    PrewhereWhereRe.findFirstMatchIn(q) match {
      case Some(m) =>
        q.substring(0, m.start) +
          s"WHERE (${m.group(1).trim}) AND (${m.group(2).trim})" +
          Option(m.group(3)).getOrElse("")
      case None => q.replaceAll("(?i)\\bPREWHERE\\b", "WHERE")
    }

  /** `FROM t FINAL` → read-side ReplacingMergeTree collapse: one
    * max_by(struct(payload), version) aggregate per sorting key — the
    * same partial-aggregating shape as the b6_final builder (one
    * candidate row per key per task crosses the exchange; a window
    * rank would sort whole partitions). */
  private val FinalRe =
    "(?i)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FINAL\\b".r
  private def rewriteFinal(spark: SparkSession, q: String): String =
    FinalRe.replaceAllIn(q, m => {
      val t = m.group(1)
      val reg = finalReg.get(t.toLowerCase)
      require(reg != null,
        s"FINAL on '$t': no ReplacingMergeTree metadata — call ChSql.registerFinal(table, keyCols, versionCol) first")
      val (keys, ver) = reg
      val cols = spark.table(t).columns.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val inner = s"SELECT ${keys.map(bq).mkString(", ")}, " +
        s"max_by(struct(${nonKeys.map(bq).mkString(", ")}), ${bq(ver)}) AS __graft_r " +
        s"FROM ${bq(t)} GROUP BY ${keys.map(bq).mkString(", ")}"
      val outer = cols.map(c =>
        if (keys.contains(c)) bq(c) else s"__graft_r.${bq(c)}").mkString(", ")
      java.util.regex.Matcher.quoteReplacement(
        s"FROM (SELECT $outer FROM ($inner)) $t")
    })

  /** `ORDER BY c WITH FILL FROM a TO b [STEP s]` → generate the spine
    * with sequence+explode (distributed, no driver loop), FULL OUTER
    * join the base query on the fill column (full outer, not left:
    * CH keeps off-grid base rows AND adds grid fill rows), fill the
    * other columns with CH type defaults (0 for numerics, '' for
    * strings, NULL otherwise). TO is EXCLUSIVE, per CH. Scope: a
    * single ascending fill column with explicit FROM/TO. */
  private val WithFillRe =
    ("(?is)^(.*)\\bORDER\\s+BY\\s+(`?[A-Za-z_][A-Za-z0-9_]*`?)\\s+WITH\\s+FILL\\s+" +
      "FROM\\s+(.+?)\\s+TO\\s+(.+?)(?:\\s+STEP\\s+(.+?))?\\s*$").r
  private def rewriteWithFill(spark: SparkSession, q: String): String =
    WithFillRe.findFirstMatchIn(q) match {
      case None => q
      case Some(m) =>
        val base = m.group(1).trim
        val c = m.group(2).replace("`", "")
        val (from, to) = (m.group(3).trim, m.group(4).trim)
        val step = Option(m.group(5)).map(_.trim).getOrElse("1")
        val fields = spark.sql(base).schema.fields
        require(fields.exists(_.name == c), s"WITH FILL column '$c' not in the query output")
        def dflt(f: org.apache.spark.sql.types.StructField): String = f.dataType match {
          case _: org.apache.spark.sql.types.NumericType => s"CAST(0 AS ${f.dataType.sql})"
          case org.apache.spark.sql.types.StringType => "''"
          case dt => s"CAST(NULL AS ${dt.sql})"
        }
        val sel = fields.map { f =>
          if (f.name == c) s"coalesce(__b.${bq(c)}, __spine.${bq(c)}) AS ${bq(c)}"
          else s"coalesce(__b.${bq(f.name)}, ${dflt(f)}) AS ${bq(f.name)}"
        }.mkString(", ")
        s"SELECT $sel FROM " +
          s"(SELECT ${bq(c)} FROM (SELECT explode(sequence($from, $to, $step)) AS ${bq(c)}) WHERE ${bq(c)} < $to) __spine " +
          s"FULL OUTER JOIN ($base) __b ON __spine.${bq(c)} = __b.${bq(c)} " +
          s"ORDER BY ${bq(c)}"
    }

  /** `… ORDER BY ord LIMIT n BY cols [LIMIT m]` → row_number ≤ n over
    * (PARTITION BY cols ORDER BY ord) — the f4_limit_by rewrite, which
    * Catalyst turns into WindowGroupLimit with a PARTIAL instance
    * ahead of the exchange (each map task forwards ≤ n rows per
    * group). An explicit ORDER BY is REQUIRED: CH's LIMIT BY without
    * one takes storage order, which is nondeterministic on Spark. */
  private val LimitByRe =
    "(?is)^(.*)\\bLIMIT\\s+(\\d+)\\s+BY\\s+(.+?)(\\s+LIMIT\\s+(\\d+))?\\s*$".r
  private val OrderByRe = "(?is)^(.*)\\bORDER\\s+BY\\s+(.+)$".r
  private def rewriteLimitBy(spark: SparkSession, q: String): String =
    LimitByRe.findFirstMatchIn(q) match {
      case None => q
      case Some(m) =>
        val head = m.group(1).trim
        val n = m.group(2)
        val by = m.group(3).trim
        val trailing = Option(m.group(4)).getOrElse("")
        OrderByRe.findFirstMatchIn(head) match {
          case None =>
            throw new IllegalArgumentException(
              "LIMIT n BY without ORDER BY is storage-order-dependent (nondeterministic); add ORDER BY")
          case Some(om) =>
            val base = om.group(1).trim
            val ord = om.group(2).trim
            val cols = spark.sql(base).columns
            s"SELECT ${cols.map(bq).mkString(", ")} FROM " +
              s"(SELECT *, row_number() OVER (PARTITION BY $by ORDER BY $ord) AS __graft_rn FROM ($base)) " +
              s"WHERE __graft_rn <= $n ORDER BY $ord$trailing"
        }
    }
}
