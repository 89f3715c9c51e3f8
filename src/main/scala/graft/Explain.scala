package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for the named
  * queries (or a default headline set) so pushdown, pruning, and
  * broadcast choices can be inspected. Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "c8_broadcast_dict_join", "c9_global_join",
        "a1_scan_prune", "l3_knn_bruteforce", "c1_inner_join", "c6_asof_join",
        "f4_limit_by", "l4_minhash_lsh", "k13_bucketed_join", "e6_window_funnel")
    val spark = Engine.session()
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
