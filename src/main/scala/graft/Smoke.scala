package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke replica: run SparkEntry.entry under a minimal session
  * (no engine-specific config) and print the row count — entry must
  * not depend on GraftExtensions or the nanos-timestamp knob. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke_rows":$n}""")
    spark.stop()
  }
}
