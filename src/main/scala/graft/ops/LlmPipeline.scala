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

  val queries: Map[String, Q] = Map(
    "l14_stratified_sample" -> (l14StratifiedSample _),
    "l15_pattern_scrub" -> (l15PatternScrub _),
    "l16_shard_shuffle" -> (l16ShardShuffle _),
    "l17_sequence_pack" -> (l17SequencePack _))

  val oracles: Map[String, String] = Map(
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
