package graft

import org.apache.spark.sql.DataFrame

/** Dual-entry front-door sweep (extends VERDICT r11 #7 beyond the fz*
  * rows): for EVERY declared oracle whose SQL text Spark itself can
  * parse and run, execute that text through `spark.sql` against the
  * registered views and value-compare with the declared DataFrame
  * entry. The oracle strings are written for DuckDB, so a large
  * portable-ANSI subset doubles as a Spark front-door rendering for
  * free — each one that runs certifies parser → analyzer → optimizer
  * agreement with the DataFrame build on the operator's REAL query,
  * not a synthetic shape.
  *
  * Dialect-only constructs (DuckDB list lambdas, `read_parquet`,
  * bare `VARCHAR` casts, recursive CTEs, …) fail analysis and are
  * tallied as skipped — the sweep's value is the parseable subset.
  *
  * Usage: runMain graft.SqlSweep <sfDir> [name...]
  * `SqlParitySpec` pins the sweep's result (mismatches == 0, floor on
  * the parity count) every test run at sf0.001. */
object SqlSweep {

  final case class Result(parity: Seq[String], mismatch: Seq[String], skipped: Seq[String])

  /** Normalize a collected cell for cross-plan comparison: exact for
    * everything except Decimal, which compares by value (the two
    * renderings may carry different scales for the same number). */
  private def norm(v: Any): Any = v match {
    case d: java.math.BigDecimal => d.stripTrailingZeros
    case d: BigDecimal => d.underlying.stripTrailingZeros
    case a: Seq[_] => a.map(norm)
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case x => x
  }

  private def cells(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq.map(_.toSeq.map(norm))
  }

  def sweep(spark: org.apache.spark.sql.SparkSession, sfDir: String,
            only: Set[String] = Set.empty, verbose: Boolean = true): Result = {
    Engine.registerAll(spark, sfDir)
    val parity = scala.collection.mutable.ArrayBuffer.empty[String]
    val mismatch = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    for (name <- names) {
      val sql = SparkEntry.oracleSql(name)
      val viaSql: Option[Seq[Seq[Any]]] =
        try Some(cells(spark.sql(sql)))
        catch { case e: Throwable =>
          skipped += name
          if (verbose) println(s"[sweep] skip $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("")}")
          None
        }
      viaSql.foreach { o =>
        try {
          val d = cells(SparkEntry.queries(name)(spark, sfDir))
          if (d == o) { parity += name; if (verbose) println(s"[sweep] parity $name (${d.size} rows)") }
          else {
            mismatch += name
            if (verbose) {
              println(s"[sweep] MISMATCH $name: df=${d.size} rows sql=${o.size} rows")
              d.zipAll(o, null, null).zipWithIndex.collectFirst {
                case ((a, b), i) if a != b => println(s"  row $i\n    df : $a\n    sql: $b")
              }
            }
          }
        } catch { case e: Throwable =>
          mismatch += name
          if (verbose) println(s"[sweep] MISMATCH $name (df side failed): ${e.getMessage}")
        }
      }
    }
    if (verbose)
      println(s"[sweep] total=${names.size} parity=${parity.size} mismatch=${mismatch.size} skipped=${skipped.size}" +
        (if (mismatch.nonEmpty) s"\n[sweep] mismatches: ${mismatch.mkString(", ")}" else ""))
    Result(parity.toSeq, mismatch.toSeq, skipped.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session()
    val r = sweep(spark, sfDir, args.drop(1).toSet)
    spark.stop()
    if (r.mismatch.nonEmpty) sys.exit(1)
  }
}
