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
    // Longest-processing-time-first scheduling: this host has an
    // intermittent throttle window that engages ~90-120s into heavy
    // work (see r3: alphabetical order put the heavy k/l/q queries
    // exactly there, inflating 6s queries to 480s). Running known-slow
    // queries first packs them into the clean window and is optimal
    // makespan order regardless. Prior-run times come from
    // BENCH_FULL.json when present; unknown/new queries go first.
    val priorTimes: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_FULL.json")), java.nio.charset.StandardCharsets.UTF_8)
        """"([a-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case e: Throwable =>
        println(s"[bench] no prior timings (${e.getClass.getSimpleName}): alphabetical order")
        Map.empty
      }
    println(s"[bench] LPT order over ${priorTimes.size} prior timings")
    var failed = List.empty[String]
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink forces FULL evaluation of every output column —
      // count() would let Catalyst prune projections and trailing
      // sorts, overstating projection-heavy queries (ADVICE r2).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed ::= name
        println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bench] $name%-28s $dt%9.3f s")
      dt
    }
    // Two full passes, per-query MIN. The host's intermittent throttle
    // window (r4: i1=190s ghost, r5: c8=114s ghost, r6: i1=194s +
    // l4=81s ghosts on untouched code) wanders across the run and can
    // inflate any single measurement ~50-100x; it cannot hit the SAME
    // query in both passes because pass 2 runs in reverse order, so
    // min(pass1, pass2) is throttle-free for every query. Pass 1 is
    // LPT (heavy first), pass 2 its exact reverse.
    val ordered = selected.toSeq
      .sortBy { case (name, _) => (-priorTimes.getOrElse(name, Double.MaxValue), name) }
    val pass1 = ordered.map { case (name, fn) => name -> runOne(name, fn) }
    println("[bench] --- pass 2 (reverse order) ---")
    val pass2 = ordered.reverse.map { case (name, fn) => name -> runOne(name, fn) }.toMap
    val results = pass1.map { case (name, t1) => name -> math.min(t1, pass2(name)) }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val failedJson = failed.distinct.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver keeps only a 2000-char output tail (BENCH_r03.json:
    // "tail" length), so the ONE printed JSON line must stay well under
    // that or it parses as garbage (r02+r03 both had "parsed": null).
    // The line carries the total + a fixed headline subset; the complete
    // per-query map goes to BENCH_FULL.json in the repo.
    val headline = Seq(
      "q1_pricing_summary", "a1_scan_prune", "c1_inner_join", "c6_asof_join",
      "d1_groupby_agg", "d6_quantiles", "e1_ranking", "f3_topk",
      "h2_datetime", "j2_window_rollup", "k13_bucketed_join",
      "l1_exact_dedup", "l4_minhash_lsh", "l13_simhash_neardup",
      "l2_vector_similarity", "l12_ann_ivf").toSet
    val head = results.filter { case (k, _) => headline(k) }
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${qjson(results)},"failed":$failedJson,"sf":"$sfDir"}"""
    // a SPARK_GRAFT_ONLY-filtered run must NOT clobber the full-suite
    // record: it would truncate the LPT priors and the committed bench
    // history to the filtered subset. SPARK_GRAFT_BENCH_OUT redirects
    // the full map (e.g. BENCH_SF1.json for the sf1 scale rehearsal)
    // so off-scale runs don't overwrite the sf0.1 record either — and
    // an off-scale run WITHOUT the redirect must not silently clobber
    // it (a dev sf0.001 run once overwrote the sf0.1 record in place,
    // poisoning every per-query comparison made against the file).
    val benchOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    if (benchOut.isEmpty && !sfDir.endsWith("sf0.1"))
      println(s"[bench] off-scale sfDir $sfDir without SPARK_GRAFT_BENCH_OUT — not writing BENCH_FULL.json")
    else if (only.isEmpty) {
      // The record file is the BEST-KNOWN clean two-pass time per query
      // and is updated by UNCONDITIONAL elementwise min-merge (VERDICT
      // r13 #1: a contended same-scale run overwrote the committed
      // 138.6 s record with a uniformly-1.45x-slower one — the r12
      // off-scale guard above can't catch that). The raw un-merged run
      // always lands in BENCH_LAST.json for the audit trail; queries
      // whose implementation intentionally changed shape this round
      // take their FRESH time via SPARK_GRAFT_BENCH_RESET=q1,q2
      // (arm_floors.py --reset mirror); queries that FAILED this run
      // keep their old record (a crash's wall time is not a timing);
      // queries dropped from the suite drop out of the record.
      val target = benchOut.getOrElse("BENCH_FULL.json")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LAST.json"),
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val resetQ = sys.env.get("SPARK_GRAFT_BENCH_RESET")
        .map(_.split(",").toSet).getOrElse(Set.empty[String])
      val old: Map[String, Double] =
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(target)), java.nio.charset.StandardCharsets.UTF_8)
          """"([a-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        } catch { case _: Throwable => Map.empty }
      val failedSet = failed.toSet
      val merged = results.map { case (n, t) =>
        n -> (
          if (failedSet(n)) old.getOrElse(n, t)
          else if (resetQ(n)) t
          else math.min(t, old.getOrElse(n, Double.MaxValue)))
      }
      val tightened = merged.count { case (n, t) => old.get(n).exists(t < _) }
      val mtotal = r3(merged.map(_._2).sum)
      println(s"[bench] min-merged $target: ${merged.size} queries, " +
        s"$tightened tightened, total $mtotal s (raw run ${total} s -> BENCH_LAST.json)")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(target),
        s"""{"metric":"total","value":$mtotal,"unit":"sec","queries":${qjson(merged)},"failed":$failedJson,"sf":"$sfDir"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${qjson(head)},"n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
