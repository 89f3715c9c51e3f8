package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Training-data curation operators beyond near-dup/similarity
  * (project brief: "the operations a large-scale training-data
  * pipeline would need"): stratified corpus sampling, pattern
  * redaction, deterministic shard-shuffle, and fixed-budget sequence
  * packing. All are pure Catalyst expressions over `documents` —
  * every one is deterministic and oracle-checked against DuckDB.
  *
  * Scale design: L14/L15 are narrow per-row maps folded into the scan
  * (one pass, no shuffle beyond the final rollup); L16's shard key is
  * a hash prefix, so the "shuffle" is one exchange on a uniform key;
  * L17's running total is computed hierarchically (chunk-local window
  * + broadcast chunk offsets) so no single task ever sorts a whole
  * language's corpus.
  */
object LlmPipeline {
  type Q = (SparkSession, String) => DataFrame

  private def toks: Column = filter(split(col("text"), " "), t => t =!= "")

  /** L14: stratified sampling — per-language keep rates applied with a
    * deterministic hash of the doc id (same mechanism as B5's
    * sampling-key SAMPLE, so the same rows are kept on every run and
    * every replica). High-resource strata are downsampled harder: en
    * keeps 32/256 ≈ 12.5 %, the rest keep 128/256 = 50 % — the
    * classic corpus-rebalancing shape. One scan, one rollup shuffle on
    * `lang`. */
  private def l14StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val key = substring(md5(col("doc_id").cast("string")), 1, 2)
    val thresh = when(col("lang") === "en", lit("20")).otherwise(lit("80"))
    Engine.t(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        CH.countIf(key < thresh).as("n_kept"))
      .withColumn("keep_rate",
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
      .orderBy("lang")
  }

  /** L15: pattern redaction — the PII-scrub shape (emails, phone
    * numbers, ids) as a single codegen'd `regexp_replace` folded into
    * the scan. The synthetic corpus carries no digits, so the term
    * list here redacts entity-like words; the mechanism is byte-for-
    * byte the production one: match count + redacted text length per
    * document, one narrow pass, no shuffle before the ORDER BY. */
  private def l15PatternScrub(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\b(customer|order)\\\\b', 0)")).as("n_redacted"),
        length(regexp_replace(col("text"), "\\b(customer|order)\\b", "<ENT>")).as("len_scrubbed"),
        length(col("text")).as("len_raw"))
      .orderBy("doc_id")

  /** L16: deterministic shard-shuffle — the "shuffle the corpus into N
    * training shards" step. The shard key is a hash prefix of the doc
    * id: stable across runs/replicas (no RNG), uniform across shards,
    * and independent of ingest order — exactly one exchange on a
    * 16-value key. A writer would `partitionBy("shard")` this; the
    * declared op emits the per-shard manifest. */
  private def l16ShardShuffle(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .groupBy(substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("shard")

  /** L17: sequence packing — assign documents (in deterministic
    * doc_id order per language) to fixed token-budget packs:
    * `pack_id = floor(exclusive_cumsum(tokens) / budget)`, the greedy
    * spillover packer training pipelines use to fill context windows.
    *
    * The running total is computed HIERARCHICALLY, not with one
    * whole-language window: a window over (lang, chunk-of-64-docs)
    * computes chunk-local cumsums in parallel, chunk totals roll up to
    * a tiny per-language prefix-sum (thousands of rows at 100 TB) that
    * broadcasts back as offsets. No task ever sorts a whole language —
    * the two-level distributed prefix sum. The DuckDB oracle computes
    * the same quantity with a flat window, pinning the decomposition's
    * correctness. */
  private def l17SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val chunkRows = 64L
    val base = Engine.t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), size(toks).cast("long").as("n_toks"))
      .withColumn("chunk", CH.intDiv(col("doc_id"), lit(chunkRows)))
    val localW = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetW = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("lang", "chunk")
      .agg(sum(col("n_toks")).as("chunk_sum"))
      .withColumn("offset", coalesce(sum(col("chunk_sum")).over(offsetW), lit(0L)))
      .select("lang", "chunk", "offset")
    base
      .withColumn("local_cum", sum(col("n_toks")).over(localW))
      .join(broadcast(offsets), Seq("lang", "chunk"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("pack_id", floor((col("cum") - col("n_toks")).cast("double") / lit(budget.toDouble)))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("pack_tokens"))
      .orderBy("lang", "pack_id")
  }

  /** L18: near-dup resolution — the step after candidate generation:
    * collapse the similarity graph into components and elect one
    * canonical doc per component (min id), producing the keep/drop
    * verdict a dedup pipeline actually ships. Components are computed
    * with min-label propagation — each round every node takes the
    * minimum label among itself and its neighbors, converging in
    * O(graph diameter) rounds of one join + one aggregate each; this
    * is the standard distributed connected-components shape (no
    * driver-side graph, state = one (node, label) row per doc). The
    * pair graph here is the deterministic n-gram Jaccard stage (L10's
    * exact verifier, τ = 0.08), so DuckDB reproduces it and checks the
    * components via a recursive CTE — an independent algorithm
    * confirming the fixpoint. The per-round convergence check is one
    * aggregated count, not a collected dataset. */
  private def l18NeardupResolve(spark: SparkSession, dir: String): DataFrame = {
    val sh = Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), array_distinct(LlmText.ngrams2(col("text"))).as("grams"))
    val a = sh.select(col("doc_id").as("a"), col("grams").as("ga"))
    val b = sh.select(col("doc_id").as("b"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val pairs = a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (inter.cast("double") /
          (size(col("ga")) + size(col("gb")) - inter).cast("double")).as("j"))
      .filter(col("j") >= 0.08)
      .select("a", "b")
    // The iteration state (labels, edges) is tiny relative to the
    // corpus — a deployment sizes shuffle partitions to the candidate
    // frontier, not the corpus; and localCheckpoint truncates the
    // per-round lineage so round k's plan doesn't re-optimize rounds
    // 1..k-1.
    val spKey = "spark.sql.shuffle.partitions"
    val spPrev = spark.conf.get(spKey)
    spark.conf.set(spKey, "4")
    try {
      val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
      var labels = sh.select(col("doc_id"), col("doc_id").as("label")).localCheckpoint()
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val nbrMin = edges.join(labels, edges("b") === labels("doc_id"))
          .groupBy("a").agg(min(col("label")).as("nbr_label"))
        // one pass carries both the new label and the convergence bit —
        // no separate old-vs-new join per round
        val step = labels.join(nbrMin, labels("doc_id") === nbrMin("a"), "left")
          .select(labels("doc_id"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          .localCheckpoint()
        val changed = step.filter(col("label") =!= col("old_label")).count()
        labels = step.select("doc_id", "label")
        converged = changed == 0
        rounds += 1
      }
      labels
        .groupBy(col("label").as("keep_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("keep_id")
    } finally spark.conf.set(spKey, spPrev)
  }

  /** L19: corpus mixing — hit a per-source quota (the "data mixture"
    * step of pretraining prep). Docs rank within their source by a
    * deterministic hash of the id (stable across runs/replicas, no
    * RNG) and the first `quota(source)` survive; even-numbered sources
    * get 10, odd get 18 — the rebalancing shape. One window per
    * source partition + one rollup; at 100 TB the rank never sorts
    * more than one source's slice per task group. */
  private def l19CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val quota = when(srcNum % 2 === 0, lit(10)).otherwise(lit(18))
    val w = Window.partitionBy("source").orderBy(md5(col("doc_id").cast("string")))
    Engine.t(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        CH.countIf(col("rk") <= quota).as("n_kept"))
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "l18_neardup_resolve" -> (l18NeardupResolve _),
    "l19_corpus_mix" -> (l19CorpusMix _),
    "l14_stratified_sample" -> (l14StratifiedSample _),
    "l15_pattern_scrub" -> (l15PatternScrub _),
    "l16_shard_shuffle" -> (l16ShardShuffle _),
    "l17_sequence_pack" -> (l17SequencePack _))

  val oracles: Map[String, String] = Map(
    // components via recursive reachability — an INDEPENDENT algorithm
    // (BFS closure) confirming the label-propagation fixpoint
    "l18_neardup_resolve" ->
      """WITH RECURSIVE
        |g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |      i -> t[i] || ' ' || t[i+1])) AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        |        FROM documents WHERE doc_id < 40)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM g a, g b WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE)
        |      / CAST(len(a.grams) + len(b.grams)
        |             - len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE) >= 0.08),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(node, lbl) AS (
        |  SELECT doc_id, doc_id FROM g
        |  UNION
        |  SELECT e.a, r.lbl FROM e JOIN reach r ON e.b = r.node),
        |comp AS (SELECT node, min(lbl) AS keep_id FROM reach GROUP BY node)
        |SELECT keep_id, count(*) AS n_members
        |FROM comp GROUP BY keep_id ORDER BY keep_id""".stripMargin,
    "l19_corpus_mix" ->
      """WITH r AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
        |  FROM documents)
        |SELECT source, count(*) AS n_total,
        |  count(CASE WHEN rk <= (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |                         THEN 10 ELSE 18 END) THEN 1 END) AS n_kept
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "l14_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |       < CASE WHEN lang = 'en' THEN '20' ELSE '80' END) AS BIGINT) AS n_kept,
        |  round(CAST(count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |       < CASE WHEN lang = 'en' THEN '20' ELSE '80' END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS keep_rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "l15_pattern_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|order)\b', 0)) AS INT) AS n_redacted,
        |  CAST(length(regexp_replace(text, '\b(customer|order)\b', '<ENT>', 'g')) AS INT) AS len_scrubbed,
        |  CAST(length(text) AS INT) AS len_raw
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "l16_shard_shuffle" ->
      """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    "l17_sequence_pack" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, n_toks,
        |    sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT lang,
        |  CAST(floor(CAST(cum - n_toks AS DOUBLE) / 2048.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin)
}
