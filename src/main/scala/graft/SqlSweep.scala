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
  * `SqlParitySpec`'s "full oracle-SQL sweep" test pins the result
  * (mismatch and dfError both empty, floor on the parity count) every
  * test run at sf0.001 — the parseable subset can only grow. */
object SqlSweep {

  /** `mismatch` = both plans ran and produced different values (a real
    * parity break); `dfError` = the DataFrame side (or the comparison
    * harness) threw after the SQL side ran — an environment/harness
    * failure, reported separately so exit 1 ⇒ genuine value divergence
    * (ADVICE r12). */
  final case class Result(parity: Seq[String], mismatch: Seq[String],
      skipped: Seq[String], dfError: Seq[String])

  /** Cell equivalence for cross-RENDERING comparison: numbers compare
    * by VALUE across the numeric tower (a `100.0` literal parses as
    * DECIMAL(4,1) in SQL text but builds DoubleType through `lit` —
    * same arithmetic, different carrier; e12 was the first false
    * positive). Decimal-vs-decimal stays exact (`compareTo`, scale-
    * blind); any pair involving a float/double compares at double
    * precision with NaN==NaN bit discipline. This is deliberately
    * LOOSER than the driver's type-sensitive hash — the sweep checks
    * that two renderings of the same plan agree, not that types
    * round-trip; the DuckDB gate keeps full type sensitivity. */
  private def cellEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) == 0
    case (x: Number, y: Number) =>
      def integral(n: Number) = n match {
        case _: java.lang.Byte | _: java.lang.Short |
             _: java.lang.Integer | _: java.lang.Long => true
        case _ => false
      }
      if (integral(x) && integral(y)) x.longValue == y.longValue
      else java.lang.Double.compare(x.doubleValue, y.doubleValue) == 0
    case (xs: Seq[_], ys: Seq[_]) =>
      xs.size == ys.size && xs.lazyZip(ys).forall(cellEq)
    case (xr: org.apache.spark.sql.Row, yr: org.apache.spark.sql.Row) =>
      cellEq(xr.toSeq, yr.toSeq)
    case _ => a == b
  }

  private def rowsEq(d: Seq[Seq[Any]], o: Seq[Seq[Any]]): Boolean =
    d.size == o.size && d.lazyZip(o).forall((x, y) => cellEq(x, y))

  private def cells(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq.map(_.toSeq)
  }

  def sweep(spark: org.apache.spark.sql.SparkSession, sfDir: String,
            only: Set[String] = Set.empty, verbose: Boolean = true): Result = {
    Engine.registerAll(spark, sfDir)
    val parity = scala.collection.mutable.ArrayBuffer.empty[String]
    val mismatch = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val dfError = scala.collection.mutable.ArrayBuffer.empty[String]
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
          if (rowsEq(d, o)) { parity += name; if (verbose) println(s"[sweep] parity $name (${d.size} rows)") }
          else {
            mismatch += name
            if (verbose) {
              println(s"[sweep] MISMATCH $name: df=${d.size} rows sql=${o.size} rows")
              d.zipAll(o, null, null).zipWithIndex.collectFirst {
                case ((a, b), i) if a == null || b == null || !cellEq(a, b) =>
                  println(s"  row $i\n    df : $a\n    sql: $b")
              }
            }
          }
        } catch { case e: Throwable =>
          dfError += name
          if (verbose) println(s"[sweep] DF-ERROR $name (df side failed, not a value mismatch): ${e.getMessage}")
        }
      }
    }
    if (verbose)
      println(s"[sweep] total=${names.size} parity=${parity.size} mismatch=${mismatch.size} " +
        s"skipped=${skipped.size} dfError=${dfError.size}" +
        (if (mismatch.nonEmpty) s"\n[sweep] mismatches: ${mismatch.mkString(", ")}" else "") +
        (if (dfError.nonEmpty) s"\n[sweep] df errors: ${dfError.mkString(", ")}" else ""))
    Result(parity.toSeq, mismatch.toSeq, skipped.toSeq, dfError.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session()
    val r = sweep(spark, sfDir, args.drop(1).toSet)
    spark.stop()
    // exit 1 only on a genuine value-parity break; df-side/harness
    // errors exit 2 so callers can tell the buckets apart.
    if (r.mismatch.nonEmpty) sys.exit(1)
    if (r.dfError.nonEmpty) sys.exit(2)
  }
}
