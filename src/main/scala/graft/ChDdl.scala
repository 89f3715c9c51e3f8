package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** ClickHouse TEXT DDL for the wire doors (VERDICT r18 next #3): the
  * statements a CH init script (`/docker-entrypoint-initdb.d`,
  * reference `Dockerfile:190`) contains —
  *
  *   - `CREATE TABLE t (cols…) ENGINE = MergeTree ORDER BY … [PARTITION
  *     BY …] [SAMPLE BY …]` → an empty typed temp view + recorded
  *     layout metadata; INSERTs route through the shared ingest path,
  *     which honors the layout (sort-within-partitions by the ORDER BY
  *     key, directory partitions by the PARTITION BY expression — the
  *     K10 writer semantics, reference `Dockerfile:228`).
  *   - `ENGINE = ReplacingMergeTree(ver)` additionally registers the
  *     FINAL metadata so `SELECT … FROM t FINAL` works ([[ChSql]] b6).
  *   - `CREATE MATERIALIZED VIEW mv AS SELECT …` → recorded definition,
  *     re-materialized after every insert into any source table — the
  *     insert-driven maintenance contract of CH's incremental MVs (J1);
  *     recompute-on-insert is the batch-equivalence form the J1 spec
  *     pins (MV table == full recompute, always).
  *   - `DROP TABLE/VIEW [IF EXISTS] t`, `SHOW CREATE TABLE t`.
  *
  * The CH type grammar maps per SURVEY §1.2 (unsigned widens, Nullable
  * is the nullability flag, LowCardinality is transparent). Statements
  * this scope doesn't cover (ALTER, EXCHANGE, …) return None and fall
  * through to Spark's parser to fail loudly.
  */
object ChDdl {

  final case class TableDef(
      name: String,
      schema: StructType,
      orderBy: Seq[String],
      partitionBy: Option[String])

  private val tableDefs =
    new java.util.concurrent.ConcurrentHashMap[String, TableDef]()
  private val mvDefs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // registration order matters for MV-on-MV chains
  private val mvOrder = new java.util.concurrent.CopyOnWriteArrayList[String]()

  def tableDef(name: String): Option[TableDef] =
    Option(tableDefs.get(name.toLowerCase))

  /** CH type name → Spark type (SURVEY §1.2). Case matters in CH type
    * names, but accept any case; nullable via Nullable(…) wrapper. */
  private[graft] def chType(s0: String): (DataType, Boolean) = {
    val s = s0.trim
    val lower = s.toLowerCase
    def inner(prefix: String): String =
      s.substring(prefix.length + 1, s.length - 1) // strip name( … )
    if (lower.startsWith("nullable(")) (chType(inner("Nullable"))._1, true)
    else if (lower.startsWith("lowcardinality(")) chType(inner("LowCardinality"))
    else if (lower.startsWith("array(")) {
      val (et, en) = chType(inner("Array"))
      (ArrayType(et, en), false)
    }
    else if (lower.startsWith("decimal(")) {
      val Array(p, sc) = inner("Decimal").split(",").map(_.trim.toInt)
      (DecimalType(p, sc), false)
    }
    else if (lower.startsWith("decimal32(")) (DecimalType(9, inner("Decimal32").trim.toInt), false)
    else if (lower.startsWith("decimal64(")) (DecimalType(18, inner("Decimal64").trim.toInt), false)
    else if (lower.startsWith("datetime64(")) (TimestampType, false)
    else if (lower.startsWith("fixedstring(")) (StringType, false)
    else if (lower.startsWith("enum8(") || lower.startsWith("enum16(")) (StringType, false)
    else lower match {
      case "int8"            => (ByteType, false)
      case "int16"           => (ShortType, false)
      case "int32"           => (IntegerType, false)
      case "int64"           => (LongType, false)
      case "uint8"           => (ShortType, false)
      case "uint16"          => (IntegerType, false)
      case "uint32"          => (LongType, false)
      case "uint64"          => (DecimalType(20, 0), false)
      case "float32"         => (FloatType, false)
      case "float64"         => (DoubleType, false)
      case "string"          => (StringType, false)
      case "bool" | "boolean" => (BooleanType, false)
      case "date" | "date32" => (DateType, false)
      case "datetime"        => (TimestampType, false)
      case "uuid"            => (StringType, false)
      case other => throw new IllegalArgumentException(s"unsupported CH type: $other")
    }
  }

  /** Split `a, b(c, d), e` on top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1).trim else t
  }

  private val CreateTableRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([A-Za-z_][A-Za-z0-9_]*)`?\\s*" +
      "\\((.*)\\)\\s*ENGINE\\s*=\\s*([A-Za-z]+)(?:\\(([^)]*)\\))?\\s*(.*)$").r
  // decorations between the name and AS (ENGINE/ORDER BY/POPULATE/TO)
  // are storage hints in this model and skip via the lazy middle group
  private val CreateMvRe =
    ("(?is)^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([A-Za-z_][A-Za-z0-9_]*)`?\\b.*?\\bAS\\s+((?:SELECT|WITH)\\b.*)$").r
  private val DropRe =
    "(?is)^\\s*DROP\\s+(?:TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?`?([A-Za-z_][A-Za-z0-9_]*)`?\\s*$".r
  private val ShowCreateRe =
    "(?is)^\\s*SHOW\\s+CREATE\\s+TABLE\\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\\s*$".r
  private val TruncateRe =
    "(?is)^\\s*TRUNCATE\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?`?([A-Za-z_][A-Za-z0-9_]*)`?\\s*$".r

  /** Clause scanner over the CREATE TABLE tail: ORDER BY / PARTITION
    * BY / PRIMARY KEY / SAMPLE BY / TTL / SETTINGS, in any order. */
  private def clause(tail: String, name: String): Option[String] = {
    val kws = Seq("ORDER BY", "PARTITION BY", "PRIMARY KEY", "SAMPLE BY", "TTL", "SETTINGS")
    val up = tail.toUpperCase
    val at = up.indexOf(name)
    if (at < 0) None
    else {
      val from = at + name.length
      val next = kws.filterNot(_ == name)
        .map(k => up.indexOf(k, from)).filter(_ >= 0)
      val end = if (next.isEmpty) tail.length else next.min
      Some(tail.substring(from, end).trim)
    }
  }

  /** Try to execute `text` as CH DDL. Some(df) = handled (df is the
    * statement's result — empty for DDL proper); None = not DDL. */
  def execute(spark: SparkSession, text: String): Option[DataFrame] = {
    val t = text.trim.stripSuffix(";")
    CreateTableRe.findFirstMatchIn(t).map { m =>
      val name = m.group(1)
      val engine = m.group(3)
      val engineArgs = Option(m.group(4)).map(_.trim).getOrElse("")
      val tail = m.group(5)
      val fields = splitTop(m.group(2)).map { colDef =>
        // "name Type [DEFAULT …]" — take the first two tokens; CODEC/
        // DEFAULT/COMMENT decorations are storage hints, dropped
        val parts = colDef.trim.split("\\s+", 3)
        require(parts.length >= 2, s"CREATE TABLE: bad column def '$colDef'")
        val (dt, nullable) = chType(parts(1))
        StructField(parts(0).replace("`", ""), dt, nullable)
      }
      val schema = StructType(fields)
      val orderBy = clause(tail, "ORDER BY").map(stripParens)
        .map(s => splitTop(s)).getOrElse(Nil)
      val partitionBy = clause(tail, "PARTITION BY").map(stripParens).filter(_.nonEmpty)
      val d = TableDef(name, schema, orderBy, partitionBy)
      tableDefs.put(name.toLowerCase, d)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .createOrReplaceTempView(name)
      // ReplacingMergeTree(ver): FINAL reads collapse by the sorting key
      if (engine.equalsIgnoreCase("ReplacingMergeTree") && engineArgs.nonEmpty)
        ChSql.registerFinal(name, orderBy, engineArgs.split(",").head.trim)
      clause(tail, "SAMPLE BY").map(stripParens)
        .foreach(k => ChSql.registerSample(name, k))
      spark.emptyDataFrame
    }.orElse(CreateMvRe.findFirstMatchIn(t).map { m =>
      val name = m.group(1)
      val select = m.group(2)
      mvDefs.put(name.toLowerCase, select)
      // addIfAbsent: a re-CREATE (or an extended-protocol Describe
      // followed by Execute) must not enroll the MV twice
      mvOrder.addIfAbsent(name.toLowerCase): Unit
      materialize(spark, name, select)
      spark.emptyDataFrame
    }).orElse(DropRe.findFirstMatchIn(t).map { m =>
      val name = m.group(2)
      val existed = spark.catalog.dropTempView(name)
      require(existed || m.group(1) != null, s"DROP: no such table/view '$name'")
      tableDefs.remove(name.toLowerCase)
      if (mvDefs.remove(name.toLowerCase) != null) mvOrder.remove(name.toLowerCase): Unit
      spark.emptyDataFrame
    }).orElse(TruncateRe.findFirstMatchIn(t).map { m =>
      val name = m.group(1)
      val d = tableDefs.get(name.toLowerCase)
      require(d != null, s"TRUNCATE: '$name' is not a DDL-created table")
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), d.schema)
        .createOrReplaceTempView(name)
      refreshMvs(spark)
      spark.emptyDataFrame
    }).orElse(ShowCreateRe.findFirstMatchIn(t).map { m =>
      import spark.implicits._
      val name = m.group(1)
      val d = tableDefs.get(name.toLowerCase)
      val stmt =
        if (d != null) {
          val cols = d.schema.fields.map(f =>
            s"`${f.name}` ${chTypeName(f)}").mkString(", ")
          s"CREATE TABLE $name ($cols) ENGINE = MergeTree" +
            (if (d.orderBy.nonEmpty) s" ORDER BY (${d.orderBy.mkString(", ")})" else "") +
            d.partitionBy.map(p => s" PARTITION BY $p").getOrElse("")
        } else {
          val mv = mvDefs.get(name.toLowerCase)
          if (mv != null) s"CREATE MATERIALIZED VIEW $name AS $mv"
          else throw new IllegalArgumentException(s"SHOW CREATE TABLE: unknown table '$name'")
        }
      Seq(stmt).toDF("statement")
    })
  }

  private def chTypeName(f: StructField): String = {
    val base = graft.server.HttpSqlEndpoint.chTypeName(f.dataType, nullable = false)
    if (f.nullable) s"Nullable($base)" else base
  }

  private def materialize(spark: SparkSession, name: String, select: String): Unit =
    ChSql.sql(spark, select).createOrReplaceTempView(name)

  /** Insert-driven MV maintenance: re-materialize every registered MV
    * (in creation order, so MV-on-MV chains see fresh upstreams). The
    * result is definitionally equal to CH's query-time collapse of its
    * per-insert partial states — the J1 batch-equivalence property. */
  def refreshMvs(spark: SparkSession): Unit = {
    mvOrder.forEach { name =>
      val select = mvDefs.get(name.toLowerCase)
      if (select != null) materialize(spark, name, select)
    }
  }

  /** Layout-aware ingest write (the K10 semantics for DDL-created
    * tables): sort within partitions by the ORDER BY key; directory-
    * partition by the PARTITION BY expression via a shadow column
    * (CH's partition expression becomes the directory key, reference
    * `Dockerfile:228`). Returns the frame to append and the
    * partition column names to pass to the writer. */
  def layoutFor(df: DataFrame, table: String): (DataFrame, Seq[String]) =
    tableDef(table) match {
      case None => (df, Nil)
      case Some(d) =>
        val base = if (d.orderBy.nonEmpty)
          df.sortWithinPartitions(d.orderBy.map(col): _*) else df
        d.partitionBy match {
          case Some(p) =>
            // the expression goes through the ChSql name rewrite so CH
            // spellings (toYYYYMM…) work here too
            (base.withColumn("__graft_part", expr(rewriteExpr(p))), Seq("__graft_part"))
          case None => (base, Nil)
        }
    }

  private def rewriteExpr(e: String): String = e // names resolve via ChNames

  /** Columns to read back for a table (drops the shadow partition
    * column the layout writer added). */
  def readBack(df: DataFrame, table: String): DataFrame =
    if (df.columns.contains("__graft_part")) df.drop("__graft_part") else df
}
