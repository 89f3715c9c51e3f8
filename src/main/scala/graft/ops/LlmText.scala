package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** LLM-data-pipeline text operators (SURVEY §2.L1/L4/L5 + brief):
  * exact dedup, MinHash+LSH near-dup, text stats, token counting,
  * language-ID heuristic, quality scoring, document fingerprints,
  * n-gram Jaccard. All token/shingle work is pure Catalyst
  * higher-order expressions — no UDFs, fully codegen-friendly.
  *
  * Scale design (100 TB): every op is a narrow map over `documents`
  * followed by at most one shuffle on a low-cardinality or hash key.
  * LSH banding is the scale path for near-dup: candidates come from a
  * bucket self-join on (band, signature) — never an all-pairs product.
  */
object LlmText {
  type Q = (SparkSession, String) => DataFrame

  /** Fan a scan out to all cores ONLY when it is genuinely
    * under-parallel (test-scale `documents` is one parquet file → ~1
    * task, which serializes the heavy per-row hash kernels behind it).
    * At 100 TB the scan is already thousands of tasks and this is an
    * identity — no unconditional full-text shuffle (VERDICT r5 #6). */
  private def fanOut(df: DataFrame): DataFrame = {
    val cpus = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cpus / 2) df.repartition(cpus) else df
  }

  /** Whitespace tokens with empties dropped (both engines agree on
    * this form; bare split differs on trailing empties). */
  private val toks: Column =
    filter(split(col("text"), " "), t => t =!= "")

  /** Word n-gram shingles built with zip_with over shifted slices —
    * deliberately NO lambda-internal indexing into the token array:
    * CollapseProject inlines column definitions into lambdas, so a
    * `toks[i]` inside `transform` would re-run the full split+filter
    * for every element (observed: a 24-minute single task at sf0.1).
    * Argument-position references evaluate once per row. zip_with pads
    * the shorter side with null and `concat` nulls out those tails. */
  private[ops] def ngrams(t: Column, n: Int): Column = {
    val joined = (2 to n).foldLeft(t) { (acc, k) =>
      zip_with(acc, slice(t, lit(k), size(t)), (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Word 2-gram shingles over a text column — the shared exact-verify
    * shingle form (L10 here, L18's pair graph in LlmPipeline). */
  def ngrams2(text: Column): Column =
    ngrams(filter(split(text, " "), t => t =!= ""), 2)

  /** L1: exact dedup — hash the text, keep the smallest doc_id per
    * hash. One shuffle on the hash; at 100 TB the md5 prunes to
    * 16-byte keys before the exchange. */
  private def l1ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "text_hash")
      .orderBy("keep_id")

  /** L4: MinHash + LSH near-dup detection. 16 minhashes (xxhash64
    * seeded per row) over word 3-shingles, banded 8×2; docs sharing a
    * (band, band-signature) bucket are candidate pairs. Declared
    * without oracle (hash family is engine-internal); the spec test
    * plants near-duplicates and asserts they collide.
    *
    * This is the candidate-stage DEMO over the full corpus — its
    * declared count deliberately includes pairs among exact copies. */
  def lshCandidates(spark: SparkSession, dir: String): DataFrame =
    lshCandidatesOf(spark, dir, Engine.t(spark, dir, "documents"), "l4_bands")

  /** LSH candidate pairs over an arbitrary document set (l4 runs it on
    * the full corpus; l37 on exact-dedup representatives). */
  private[graft] def lshCandidatesOf(
      spark: SparkSession, dir: String, documents: DataFrame, name: String): DataFrame = {
    // Band hashes via the fused codegen'd minhash_bands kernel
    // (graft.expressions.MinHashBandsExpr, injected by GraftExtensions):
    // one xxhash64 (seed 42) per shingle, 16 rotate-xor mixes, and the
    // 8×2 banding combine, all in ONE generated Java loop — no
    // intermediate signature column, so no shuffle barrier is needed to
    // keep CollapseProject from inlining the signature pipeline into a
    // band lambda (that inlining previously forced a repartition here).
    val bandExpr = call_function("minhash_bands", ngrams(toks, 3))
    // Materialize the (doc, band, sig) table once — the self-join would
    // otherwise recompute the whole signature pipeline on both sides.
    // At scale this is exactly the LSH bucket table a pipeline persists.
    val bandsPath = Engine.scratch(spark, dir, name)
    fanOut(documents)
      .select(col("doc_id"), posexplode(bandExpr).as(Seq("band", "sig")))
      .write.mode("overwrite").parquet(bandsPath)
    val docs = spark.read.parquet(bandsPath)
    val a = docs.select(col("band"), col("sig"), col("doc_id").as("a"))
    val b = docs.select(col("band"), col("sig"), col("doc_id").as("b"))
    a.join(b, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** l4's declared count INCLUDES pairs among exact copies, but never
    * enumerates them: exact copies share every band, so collapse them
    * first (l37's stage-0 ordering) and count by multiplicity —
    * cross-group candidates contribute n_a·n_b per colliding rep pair
    * and each copy group contributes C(n,2) in closed form. The count
    * is identical to the rep-less enumeration (pinned by an
    * `LlmOpsSpec` case that replicates a corpus and diffs both forms);
    * what changes is scale: the sf10 rehearsal's ~100-copies/doc
    * replica spent 164 s listing ~25 M intra-copy pairs that this
    * counts without materializing — the crawl-dedup reality, where
    * exact copies dominate fuzzy candidates. */
  private def l4MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val groups = Engine.t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"), first("text").as("text"),
        count(lit(1)).as("n_copies"))
    val mult = groups.select(col("doc_id"), col("n_copies"))
    val cross = lshCandidatesOf(spark, dir, groups.select("doc_id", "text"), "l4_bands")
      .join(mult.select(col("doc_id").as("a"), col("n_copies").as("na")), "a")
      .join(mult.select(col("doc_id").as("b"), col("n_copies").as("nb")), "b")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("cross_pairs"))
    val intraAndTotal = groups.agg(
      sum(col("n_copies")).as("n_docs"),
      coalesce(sum(expr("n_copies * (n_copies - 1) div 2")), lit(0L)).as("intra_pairs"))
    intraAndTotal.crossJoin(cross)
      .select(col("n_docs"),
        (col("cross_pairs") + col("intra_pairs")).as("n_candidate_pairs"))
  }

  /** Declared l4b: the full MinHash+LSH mechanism — 16 minhashes over
    * word 3-shingles, 8 bands × 2 rows, bucket-collision candidates —
    * replayed over a bounded doc prefix with the MD5 hash kernel
    * (`md5_u64` ≡ DuckDB `md5_number_upper`, pinned in `SketchSpec`) so
    * the oracle recomputes the identical signatures in SQL and the
    * candidate PAIRS hash-match cross-engine, each verified with its
    * exact 3-shingle Jaccard (production l4 keeps xxhash64; this is
    * the l13b/l37b bounded-verdict-table pattern for the minhash leg).
    *
    * Minhash selection is in UNSIGNED hash order on both engines:
    * DuckDB mins a UBIGINT; here the sign bit is flipped before
    * `array_min` and flipped back, and signatures render through
    * `conv(hex(x),16,10)` — the unsigned decimal string DuckDB's
    * VARCHAR cast produces — so band keys agree bit-for-bit. */
  /** (doc_id, sg) → (doc_id, sg, band, sig): the MD5-kernel
    * 16-minhash / 8-band × 2-row signature construction shared by l4b
    * and l38c (both oracle-replayable — DuckDB recomputes the same
    * signatures via `md5_number_upper`). See [[l4bMinhashVerdict]] for
    * the unsigned-order sign-flip rationale. */
  private[ops] def md5LshBands(docs: DataFrame): DataFrame = {
    val flip = lit(Long.MinValue)
    val mhCols = (0 until 16).map { i =>
      conv(hex(
        array_min(transform(col("sg"), s =>
          call_function("md5_u64", concat(lit(s"$i:"), s)).bitwiseXOR(flip)))
          .bitwiseXOR(flip)), 16, 10).as(s"mh$i")
    }
    val sigs = docs.select(col("doc_id") +: col("sg") +: mhCols: _*)
    sigs.select(col("doc_id"), col("sg"),
      posexplode(array((0 until 8).map(b =>
        concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))): _*))
        .as(Seq("band", "sig")))
  }

  private def l4bMinhashVerdict(spark: SparkSession, dir: String): DataFrame = {
    val bands = md5LshBands(
      Engine.t(spark, dir, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), ngrams(toks, 3).as("sg"))
        .filter(size(col("sg")) > 0))
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("a"), col("sg").as("sga"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("b"), col("sg").as("sgb"))
    a.join(b, Seq("band", "sig")).filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(countDistinct(col("band")).as("n_bands"),
        first(col("sga")).as("sga"), first(col("sgb")).as("sgb"))
      .select(col("a"), col("b"), col("n_bands"),
        round(
          size(array_intersect(col("sga"), col("sgb"))).cast("double") /
            size(array_union(col("sga"), col("sgb"))).cast("double"), 6).as("jac6"))
      .orderBy("a", "b")
  }

  /** L5: text stats rollup per (lang, source). */
  private def l5TextStats(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .withColumn("n_toks", size(toks))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        max(col("n_toks")).as("max_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_toks")).cast("double") / count(lit(1)).cast("double")).as("avg_tokens"))
      .orderBy("lang", "source")

  /** L5b: per-document token counting — whitespace and a BPE-ish
    * regex segmentation (letter runs / digit runs / single symbols). */
  private def l6TokenCount(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        size(toks).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_bpeish_tokens"),
        length(col("text")).as("len_chars"))
      .orderBy("doc_id")

  /** Language-ID heuristic: stopword-hit ratio over tokens (the
    * n-gram-heuristic mechanism; thresholds are illustrative). */
  private def l7LangId(spark: SparkSession, dir: String): DataFrame = {
    val nStop = size(filter(toks, t => t.isin("the", "a", "of", "and", "to")))
    val nToks = size(toks)
    val ratio = nStop.cast("double") / nToks.cast("double")
    Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(
        col("doc_id"), col("lang"),
        round(ratio, 6).as("stop_ratio"),
        when(ratio >= 0.08, lit("en")).otherwise(lit("other")).as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / punctuation / word-length / stopword
    * signals folded into a bucket. */
  private def l8Quality(spark: SparkSession, dir: String): DataFrame = {
    val nToks = size(toks)
    val punctLen = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    val avgWordLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nToks.cast("double")
    Engine.t(spark, dir, "documents")
      .select(
        col("doc_id"), col("n_chars"),
        size(toks).as("n_tokens"),
        round(punctLen.cast("double") / length(col("text")).cast("double"), 6).as("punct_ratio"),
        round(avgWordLen, 6).as("avg_word_len"),
        when(col("n_chars") < 100, lit("short"))
          .when(avgWordLen > 6.0, lit("long_words"))
          .otherwise(lit("ok")).as("quality_bucket"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: min-hash content fingerprint + 16-bit
    * SimHash over tokens. No oracle (xxhash64 is engine-internal);
    * spec test asserts stability and near-dup Hamming proximity.
    *
    * The 16-bit simhash is the low 16 bits of the codegen'd
    * `simhash64` kernel — bit-identical to the definitional form (16
    * per-bit vote folds over `xxhash64(token)`, seed 42, bit set iff
    * vote > 0; pinned by `LlmOpsSpec`'s definitional-equality case)
    * but ONE token-array pass instead of 16 interpreted HOF
    * aggregates. The sf1 scale rehearsal caught the old form as a
    * 24× sf1/sf0.1 cliff; the kernel restores linear scaling. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    fanOut(Engine.t(spark, dir, "documents"))
      // Fingerprint over 3-gram shingles, not bare tokens — a shared
      // vocabulary collapses token-minhash to a handful of values.
      .select(
        col("doc_id"),
        coalesce(array_min(transform(ngrams(toks, 3), s => xxhash64(s))), lit(0L)).as("min_fp"),
        call_function("simhash64", toks).bitwiseAND(lit(0xFFFFL)).as("simhash16"))
      .orderBy("doc_id")

  /** The definitional 16-bit simhash (16 HOF vote folds) — kept
    * non-exported solely so the spec can pin kernel ≡ definition. */
  private[graft] def simhash16Definitional(spark: SparkSession, dir: String): DataFrame = {
    val simBits = (0 until 16).map { j =>
      val vote = aggregate(toks, lit(0L),
        (acc, t) => acc + when(xxhash64(t).bitwiseAND(lit(1L << j)) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    Engine.t(spark, dir, "documents")
      .select(col("doc_id"), simBits.as("simhash16"))
      .orderBy("doc_id")
  }

  private def l9Fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprints(spark, dir)

  /** L9b: polynomial rolling-hash content fingerprint (Rabin-Karp
    * style) over the first 256 characters: fold (acc*31 + code) mod
    * 1e9+7 — portable integer arithmetic, so DuckDB computes the
    * identical fingerprint and this op is oracle-checked (the
    * xxhash64-family minhash/simhash fingerprints in l9 cannot be). */
  private def l9bRollingHash(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .select(col("doc_id"),
        aggregate(
          transform(filter(split(substring(col("text"), 1, 256), ""), c => c =!= ""),
            c => ascii(c).cast("long")),
          lit(0L),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("poly_fp"))
      .orderBy("doc_id")

  /** L13: SimHash near-dup detection at scale. 64-bit simhash per doc
    * (codegen'd `simhash64` kernel over tokens), split into 4×16-bit
    * bands; by pigeonhole any pair within Hamming distance ≤3 shares
    * at least one exact band, so candidates come from a bucket
    * self-join on (band, chunk) — never an all-pairs product. The
    * exact Hamming check (`bit_count(xor)`) then filters candidates.
    * Same shuffle shape as the MinHash LSH path (l4) — and the same
    * exact-copy caveat: pair counts grow quadratically in copy count,
    * so the production composition collapses exact duplicates first
    * (l37's stage 0) and runs this kernel over representatives. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanOut(Engine.t(spark, dir, "documents"))
      .select(col("doc_id"), call_function("simhash64", toks).as("sh"))
    val banded = docs.select(col("doc_id"), col("sh"),
        explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftright(sh, 16*b) & 65535 AS chunk))")).as("bc"))
      .select(col("doc_id"), col("sh"), col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val a = banded.select(col("band"), col("chunk"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("chunk"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "chunk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sh ^ b_sh)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** Declared l13: same (n_docs, n_neardup_pairs, max_hamming) output
    * as aggregating [[simhashPairs]], computed WITHOUT enumerating
    * doc-level pairs. On a high-duplication corpus identical texts
    * share a simhash, so band buckets over raw docs grow quadratically
    * in copy count (measured at the sf10 replica: 60 s vs the 0.9 s
    * sf0.1 floor — the same pathology l37 fixed with exact-collapse).
    * Here: group docs by signature once (one linear shuffle), run the
    * banded self-join over DISTINCT signatures only, and recover the
    * exact doc-pair count arithmetically — intra-signature pairs are
    * all Hamming-0 (cnt choose 2), inter-signature pairs multiply
    * group sizes. Equivalence to the pair-enumerating form is pinned
    * by `LlmOpsSpec` at two scales. */
  private def l13Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairVerdict(spark, dir,
      fanOut(Engine.t(spark, dir, "documents"))
        .select(col("doc_id"), call_function("simhash64", toks).as("sh")),
      "l13_sig_groups")

  /** Declared l13b: the SAME banded-signature pair arithmetic as l13,
    * run over a bounded doc prefix with the MD5-based signature
    * (`simhash64_md5`) that DuckDB can recompute — so the oracle
    * brute-forces ALL prefix pairs at Hamming ≤ 3 and cross-engine
    * certifies both the hash kernel (vs `md5_number_upper`) and the
    * band/intra/inter counting arithmetic that production l13 rides on
    * (VERDICT r11 #2: this family previously had only spec backing).
    * The 16-bit × 4 banding finds EVERY Hamming ≤ 3 pair by pigeonhole
    * — the oracle independently proves that completeness claim. */
  private def l13bSimhashVerdict(spark: SparkSession, dir: String): DataFrame =
    simhashPairVerdict(spark, dir,
      fanOut(Engine.t(spark, dir, "documents").filter(col("doc_id") < 300))
        .select(col("doc_id"), call_function("simhash64_md5", toks).as("sh")),
      "l13b_sig_groups")

  /** Shared by l13 (production xxhash signature) and l13b (oracle-
    * replayable MD5 signature): (doc_id, sh) → one-row
    * (n_docs, n_neardup_pairs, max_hamming) without enumerating
    * doc-level pairs. */
  private def simhashPairVerdict(
      spark: SparkSession, dir: String, sigs: DataFrame, stage: String): DataFrame = {
    // Materialize the signature groups ONCE: the plan consumes them
    // three times (doc count, intra-group pairs, banded self-join),
    // and Spark does not dedupe common subplans — without staging the
    // corpus is scanned and simhash'd 3× (visible in the physical
    // plan as three parquet scans). One corpus pass + a signature-
    // sized artifact instead.
    val stagedPath = Engine.scratch(spark, dir, stage)
    sigs.groupBy("sh").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(stagedPath)
    val groups = spark.read.parquet(stagedPath)
    val intra = groups.agg(
      coalesce(sum(expr("(cnt * (cnt - 1)) div 2")), lit(0L)).as("intra_pairs"),
      coalesce(max((col("cnt") > 1).cast("int")), lit(0)).as("has_intra"))
    val banded = groups.select(col("sh"), col("cnt"),
        explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftright(sh, 16*b) & 65535 AS chunk))")).as("bc"))
      .select(col("sh"), col("cnt"), col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val a = banded.select(col("band"), col("chunk"), col("sh").as("a_sh"), col("cnt").as("a_cnt"))
    val b = banded.select(col("band"), col("chunk"), col("sh").as("b_sh"), col("cnt").as("b_cnt"))
    val inter = a.join(b, Seq("band", "chunk")).filter(col("a_sh") < col("b_sh"))
      .select(col("a_sh"), col("b_sh"), col("a_cnt"), col("b_cnt"),
        expr("bit_count(a_sh ^ b_sh)").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .agg(
        coalesce(sum(col("a_cnt") * col("b_cnt")), lit(0L)).as("inter_pairs"),
        coalesce(max(col("hamming")), lit(-1)).as("inter_max"))
    val nDocs = groups.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_docs"))
    nDocs.crossJoin(intra).crossJoin(inter)
      .select(
        col("n_docs"),
        (col("intra_pairs") + col("inter_pairs")).as("n_neardup_pairs"),
        when(col("inter_max") >= 0, col("inter_max"))
          .when(col("has_intra") === 1, lit(0))
          .otherwise(lit(-1)).as("max_hamming"))
  }

  /** N-gram Jaccard similarity over distinct word 2-grams for a small
    * doc prefix (the exact-verification stage that follows LSH
    * candidate generation at scale). */
  private def l10NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), array_distinct(ngrams(toks, 2)).as("grams"))
    val a = sh.select(col("doc_id").as("a_id"), col("grams").as("ga"))
    val b = sh.select(col("doc_id").as("b_id"), col("grams").as("gb"))
    // broadcast the (bounded) right side: a bare CartesianProduct
    // schedules |left splits| × |right splits| tasks — invisible on a
    // single-file table, quadratic on a 4,000-file sf100 layout
    // (363 s of pure task scheduling for 190 pairs); BNLJ keeps it at
    // |left splits| tasks.
    a.crossJoin(broadcast(b)).filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        size(array_intersect(col("ga"), col("gb"))).as("inter"),
        (size(col("ga")) + size(col("gb")) - size(array_intersect(col("ga"), col("gb")))).as("uni"))
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** L28: token-length histogram per source on power-of-2 buckets —
    * the data-mixture diagnostic a curation pipeline runs before
    * setting packing/truncation budgets. One tiny shuffle (sources ×
    * ~12 buckets); the bucket expr (2^⌊log2 n⌋) is exact integer-range
    * double math, portable across engines. */
  private def l28LengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val srcW = org.apache.spark.sql.expressions.Window.partitionBy("source")
    Engine.t(spark, dir, "documents")
      .withColumn("nt", size(toks))
      .withColumn("bucket", pow(lit(2.0), floor(log2(greatest(col("nt"), lit(1))))).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), min("nt").as("min_toks"), max("nt").as("max_toks"))
      .withColumn("pct", round(lit(100.0) * col("n_docs") / sum("n_docs").over(srcW), 4))
      .orderBy("source", "bucket")
  }

  /** L31: Bloom-filter incremental dedup — the memory-bounded
    * insert-time membership test: the existing corpus folds into a
    * fixed-size bit array (Spark's `bloom_filter_agg`, a
    * TypedImperativeAggregate whose partials OR-merge map-side), the
    * incoming batch probes it with the codegen'd `might_contain` —
    * no UDF, no join against 100 TB of history. Bloom positives ⊇
    * true duplicates (zero false negatives, by construction); the
    * exact join column is carried alongside to expose the FP rate.
    * Approx output → no oracle; SketchSpec asserts the containment
    * and FP-rate properties. */
  private def l31BloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.t(spark, dir, "documents").withColumn("h", md5(col("text")))
    val existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val bloomBytes = existing
      .agg(expr("bloom_agg(xxhash64(h), 100000L, 800000L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val exact = existing.select(col("h").as("eh")).distinct()
    incoming
      .withColumn("maybe_dup", call_function("bloom_might_contain", lit(bloomBytes), xxhash64(col("h"))))
      .join(exact, col("h") === col("eh"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_incoming"),
        graft.CH.countIf(col("maybe_dup")).as("n_flagged"),
        graft.CH.countIf(col("eh").isNotNull).as("n_true_dup"))
      .orderBy("source")
  }

  /** Declared l31b: the Bloom-filter mechanism itself — k=4 bit
    * positions per key in an m=2^18 bit space, membership = all k bits
    * set — expressed relationally with the MD5 hash kernel so the
    * oracle recomputes the identical bit set and per-doc verdicts in
    * SQL (production l31 keeps `bloom_filter_agg`+`might_contain`;
    * this is the l4b/i6b kernel-swap pattern for the membership-sketch
    * leg). m is a power of two so signed pmod == unsigned mod; every
    * quantity is integer. Same split and output shape as l31, so the
    * zero-false-negative invariant (n_flagged ≥ n_true_dup per source)
    * is cross-engine-certified, with the FP margin visible. */
  private def l31bBloomVerdict(spark: SparkSession, dir: String): DataFrame = {
    // Bounded verdict corpus (l4b's prefix pattern): doc_id < 5000
    // covers the ENTIRE table at sf<=0.1 — oracle results unchanged —
    // and pins the per-doc md5 demo cost at scale (production l31's
    // bloom_filter_agg is the scale path).
    val docs = Engine.t(spark, dir, "documents")
      .filter(col("doc_id") < 5000).withColumn("h", md5(col("text")))
    val existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    def bits(h: Column): Column = transform(sequence(lit(0), lit(3)),
      i => pmod(call_function("md5_u64",
        concat(lit("bl"), i.cast("string"), lit(":"), h)), lit(262144L)))
    val bitSet = existing.select(explode(bits(col("h"))).as("bit")).distinct()
      .withColumn("present", lit(1))
    val flagged = incoming
      .select(col("doc_id"), col("source"), col("h"), explode(bits(col("h"))).as("bit"))
      .join(bitSet, Seq("bit"), "left")
      .groupBy("doc_id", "source", "h")
      .agg((count(lit(1)) === count(col("present"))).as("maybe_dup"))
    val exact = existing.select(col("h").as("eh")).distinct()
    flagged.join(exact, col("h") === col("eh"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_incoming"),
        graft.CH.countIf(col("maybe_dup")).as("n_flagged"),
        graft.CH.countIf(col("eh").isNotNull).as("n_true_dup"))
      .orderBy("source")
  }

  /** L41: TF-IDF top-terms per document — the classic salient-keyword
    * extractor of corpus curation (feature tagging before mixing /
    * retrieval / clustering). The (doc, term) count table is a
    * multi-consumer derived frame (l22's staging rule): ONE explode
    * pass over the corpus builds it, staged to scratch parquet, then
    * read by BOTH consumers — per-doc tf (bounded output prefix) and
    * corpus-wide document frequency — so the corpus is scanned once,
    * not once per consumer. Smooth idf ln((1+N)/(1+df)) and the tf·idf
    * product are the only floats (one fixed IEEE sequence both
    * engines, d25 discipline); ranking orders by the 6-decimal-ROUNDED
    * score with the term as tiebreak on BOTH engines (ADVICE r13: ln
    * is not correctly rounded, so ranking by the raw score lets a
    * sub-ulp JVM-vs-libm divergence flip top-3 membership between
    * near-equal scores; after rounding, the compared keys are
    * identical on both sides), and Catalyst plans the rank≤3 filter
    * as WindowGroupLimit — per-task top-3 pruning ahead of the
    * exchange. The doc-count scalar broadcasts (one row). */
  private def l41TfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val staged = Engine.scratch(spark, dir, "l41_doc_term")
    Engine.t(spark, dir, "documents")
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet(staged)
    val pairs = spark.read.parquet(staged)
    val dfTab = pairs.groupBy("term").agg(count(lit(1)).as("dcount"))
    val total = Engine.t(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") *
      log((lit(1.0) + col("n_docs").cast("double")) /
        (lit(1.0) + col("dcount").cast("double")))
    pairs.filter(col("doc_id") < 100)
      .join(dfTab, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("score6", round(score, 6))
      .withColumn("rk", row_number().over(
        w.partitionBy("doc_id").orderBy(col("score6").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("dcount"),
        col("score6").as("tfidf6"))
      .orderBy("doc_id", "rk")
  }

  /** DSIR scoring core (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", NeurIPS): per-document
    * importance weight log p_target(doc) − log p_raw(doc) under
    * hashed-bigram unigram models with add-1 smoothing. Factored over
    * an arbitrary `docs(doc_id, text, …)` frame so `LlmOpsSpec` can
    * pin the separation property on a PLANTED vocabulary (the sf
    * corpus draws every lang from one vocabulary, so real langs don't
    * separate — by construction, not by bug).
    *
    * Scale shape: the bigram explode is linear and feeds one bounded
    * B-bucket aggregation; the model's grand totals are a 1-row
    * collect (two longs of driver state); the per-bucket log-ratio
    * table (B rows) broadcasts back into the scoring join, so the
    * only corpus-sized exchanges are the bucket-count agg and the
    * per-doc weight sum. */
  private[graft] def dsirPerDoc(docs: DataFrame, targetCond: Column, B: Int,
      stagePath: String): DataFrame = {
    // r20 (the l22/l41 multi-consumer rule): the bigram explode feeds
    // both the model build and the scoring join — without sharing, the
    // corpus scan + shingle + hash replays per consumer. Pre-aggregate
    // to the (doc, bucket, count) rollup once and stage it to SCRATCH
    // PARQUET (a first localCheckpoint form held the corpus-sized
    // rollup in block storage and OOM'd the sf100 heap — disk staging
    // is the l41 shape and is what the other staged ops use). Integer
    // counts are exactly the per-occurrence sums; the per-doc float
    // weight becomes Σ c·w instead of w added c times — the same
    // partition-order-level float freedom this no-oracle scorer
    // already declares (the fixed-point l45b twin, which IS
    // oracle-pinned, stays exact).
    docs
      .select(col("doc_id"), targetCond.as("is_t"), explode(ngrams(toks, 2)).as("bigram"))
      .withColumn("b", pmod(xxhash64(col("bigram")), lit(B)))
      .groupBy("doc_id", "is_t", "b").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(stagePath)
    val bg = docs.sparkSession.read.parquet(stagePath)
    val model = bg.groupBy("b").agg(
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"),
      sum(col("c")).as("cr"))
    val tot = model.agg(sum("ct"), sum("cr")).head
    val (tt, tr) = (tot.getLong(0), tot.getLong(1))
    val weights = model.select(col("b"),
      (log((col("ct") + 1).cast("double") / lit((tt + B).toDouble)) -
        log((col("cr") + 1).cast("double") / lit((tr + B).toDouble))).as("w"))
    bg.join(broadcast(weights), "b")
      .groupBy("doc_id")
      .agg(sum(col("w") * col("c")).as("dsir_w"), sum(col("c")).as("n_bigrams"))
  }

  /** L45 (DSIR importance weights over the corpus, target =
    * `lang = 'en'`): the 100 most target-like documents by hashed
    * log-ratio weight. No oracle by design — the weights are
    * transcendental floats whose bucket hash (xxhash64) has no DuckDB
    * twin; the l45b verdict query replays an integer fixed-point
    * variant of the same mechanism end-to-end instead, and
    * `LlmOpsSpec` pins the planted-vocabulary separation property of
    * THIS scorer. */
  private def l45DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.t(spark, dir, "documents")
    dsirPerDoc(docs, col("lang") === "en", 1024,
      Engine.scratch(spark, dir, "l45_doc_bucket"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"),
        round(col("dsir_w"), 6).as("dsir_w"), col("n_bigrams"))
      .orderBy(col("dsir_w").desc, col("doc_id")).limit(100)
  }

  /** L45b: the bounded ORACLE twin of l45 — the same
    * model-build → broadcast → score → elect pipeline with the two
    * engine-specific pieces swapped for exactly replayable ones: the
    * hashed bucket becomes the top-64 target bigrams THEMSELVES
    * (target-count-desc, bigram-asc tiebreak) and the log-ratio
    * becomes integer fixed-point odds (ct+1)·10⁶ DIV (cr+1). Every
    * quantity is a BIGINT, so DuckDB replays the model, the scoring
    * join, and the top-50 election bit-for-bit. */
  private def l45bDsirVerdict(spark: SparkSession, dir: String): DataFrame = {
    // Deliberately NOT staged (r20): unlike l45's B-bucketed rollup
    // (≤1024 buckets per doc — massive compression), this rollup keys
    // on raw bigram STRINGS and barely compresses, so staging it would
    // trade two scan passes for a corpus-width write plus two reads —
    // strictly worse once the corpus is disk-bound (the d36 sf100
    // lesson). The two consumers each re-run the explode; the model
    // side collapses immediately into a 64-row broadcast.
    val bg = Engine.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(ngrams(toks, 2)).as("bigram"))
    val model = bg.groupBy("bigram").agg(
      CH.countIf(col("lang") === "en").as("ct"), count(lit(1)).as("cr"))
      .orderBy(col("ct").desc, col("bigram")).limit(64)
      .select(col("bigram"), expr("(ct + 1) * 1000000 DIV (cr + 1)").as("wt"))
    bg.join(broadcast(model), "bigram")
      .groupBy("doc_id")
      .agg(sum("wt").as("score"), count(lit(1)).as("n_hits"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
  }

  /** L34: bigram conditional statistics — the n-gram LM table one
    * level up from l23's unigram scores: for the 20 heaviest anchor
    * words, the most likely next word and P(next|anchor). Corpus
    * streams once through the shingle kernel; two one-row-per-bigram
    * shuffles; WindowGroupLimit prunes the per-anchor rank before the
    * exchange. */
  private def l34BigramStats(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val pairs = Engine.t(spark, dir, "documents")
      .select(explode(ngrams(toks, 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    pairs
      .withColumn("tw", sum("c").over(w.partitionBy("w1")))
      .withColumn("rk", row_number().over(w.partitionBy("w1").orderBy(col("c").desc, col("w2"))))
      .filter(col("rk") === 1)
      .orderBy(col("tw").desc, col("w1")).limit(20)
      .select(col("w1"), col("w2").as("top_next"), col("c"), col("tw"),
        round(col("c").cast("double") / col("tw").cast("double"), 6).as("p_next"))
  }

  val queries: Map[String, Q] = Map(
    "l45_dsir_weights" -> (l45DsirWeights _),
    "l45b_dsir_verdict" -> (l45bDsirVerdict _),
    "l41_tfidf_topterms" -> (l41TfidfTopTerms _),
    "l34_bigram_stats" -> (l34BigramStats _),
    "l31_bloom_dedup" -> (l31BloomDedup _),
    "l31b_bloom_verdict" -> (l31bBloomVerdict _),
    "l28_length_histogram" -> (l28LengthHistogram _),
    "l1_exact_dedup" -> (l1ExactDedup _),
    "l4_minhash_lsh" -> (l4MinhashLsh _),
    "l4b_minhash_verdict" -> (l4bMinhashVerdict _),
    "l5_text_stats" -> (l5TextStats _),
    "l6_token_count" -> (l6TokenCount _),
    "l7_lang_id" -> (l7LangId _),
    "l8_quality_score" -> (l8Quality _),
    "l9_fingerprint" -> (l9Fingerprint _),
    "l9b_rolling_hash" -> (l9bRollingHash _),
    "l10_ngram_jaccard" -> (l10NgramJaccard _),
    "l13_simhash_neardup" -> (l13Simhash _),
    "l13b_simhash_verdict" -> (l13bSimhashVerdict _))

  val oracles: Map[String, String] = Map(
    // l45b: identical bigram model (top-64 target bigrams, integer
    // fixed-point odds), scoring join, and top-50 election — all
    // BIGINT, bit-exact.
    "l45b_dsir_verdict" ->
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS tk FROM documents),
        |bg AS (SELECT doc_id, lang,
        |    unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |      i -> tk[i] || ' ' || tk[i+1])) AS bigram FROM t),
        |m AS (SELECT bigram,
        |    count(*) FILTER (WHERE lang = 'en') AS ct, count(*) AS cr
        |  FROM bg GROUP BY 1 ORDER BY ct DESC, bigram LIMIT 64),
        |w AS (SELECT bigram, (ct + 1) * 1000000 // (cr + 1) AS wt FROM m)
        |SELECT bg.doc_id, CAST(sum(w.wt) AS BIGINT) AS score, count(*) AS n_hits
        |FROM bg JOIN w USING (bigram)
        |GROUP BY bg.doc_id ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    // Brute-force replay of l31b: identical md5 bit positions (k=4,
    // m=2^18 — power of two so UBIGINT mod == signed pmod), the
    // existing-corpus bit set, all-bits-present membership, and the
    // same per-source rollup as production l31.
    "l31b_bloom_verdict" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents
        |  WHERE doc_id < 5000),
        |ex AS (SELECT * FROM d WHERE doc_id % 5 != 0),
        |inc AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |bits_ex AS (SELECT DISTINCT
        |    md5_number_upper('bl' || CAST(i AS VARCHAR) || ':' || h) % 262144 AS bit
        |  FROM ex CROSS JOIN range(4) t(i)),
        |probe AS (SELECT inc.doc_id, inc.source, inc.h,
        |    md5_number_upper('bl' || CAST(i AS VARCHAR) || ':' || inc.h) % 262144 AS bit
        |  FROM inc CROSS JOIN range(4) t(i)),
        |fl AS (SELECT p.doc_id, p.source, p.h,
        |    count(*) = count(b.bit) AS maybe_dup
        |  FROM probe p LEFT JOIN bits_ex b ON p.bit = b.bit GROUP BY 1, 2, 3)
        |SELECT fl.source, count(*) AS n_incoming,
        |  count(CASE WHEN fl.maybe_dup THEN 1 END) AS n_flagged,
        |  count(CASE WHEN eh.h IS NOT NULL THEN 1 END) AS n_true_dup
        |FROM fl LEFT JOIN (SELECT DISTINCT h FROM ex) eh ON fl.h = eh.h
        |GROUP BY fl.source ORDER BY fl.source""".stripMargin,
    // Brute-force replay of l13b: per-token MD5 hash (md5_number_upper
    // ≡ first 8 digest bytes little-endian ≡ simhash64_md5's kernel),
    // the Charikar vote loop in SQL, then ALL prefix pairs at
    // Hamming ≤ 3 — independently certifying the banded-signature
    // arithmetic's completeness claim.
    // Brute-force replay of l4b: identical 16-minhash / 8×2-band
    // construction in SQL (md5_number_upper per "<i>:<shingle>" key,
    // UBIGINT min per index, band sig = the two unsigned decimal
    // strings joined), then candidate pairs from band-bucket equality
    // and exact 3-shingle Jaccard per pair.
    "l4b_minhash_verdict" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS sg
        |  FROM docs WHERE len(tk) >= 3),
        |u AS (SELECT doc_id, unnest(sg) AS s FROM sh),
        |mh AS (
        |  SELECT doc_id, r.range AS i,
        |    min(md5_number_upper(CAST(r.range AS VARCHAR) || ':' || s)) AS m
        |  FROM u, range(16) r GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, CAST(i // 2 AS INT) AS band,
        |    string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS sig
        |  FROM mh GROUP BY 1, 2),
        |hits AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(DISTINCT x.band) AS n_bands
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT h.a, h.b, h.n_bands,
        |  round(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(sa.sg, sb.sg))) AS DOUBLE), 6) AS jac6
        |FROM hits h JOIN sh sa ON sa.doc_id = h.a JOIN sh sb ON sb.doc_id = h.b
        |ORDER BY a, b""".stripMargin,
    "l13b_simhash_verdict" ->
      """WITH docs AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents WHERE doc_id < 300),
        |tok AS (SELECT doc_id, unnest(toks) AS t FROM docs),
        |votes AS (SELECT doc_id, r.range AS j,
        |    SUM(CASE WHEN (md5_number_upper(t) >> r.range) & 1 = 1
        |             THEN 1 ELSE -1 END) AS v
        |  FROM tok, range(64) r GROUP BY 1, 2),
        |sig0 AS (SELECT doc_id,
        |    bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END) AS sh
        |  FROM votes GROUP BY doc_id),
        |sig AS (SELECT d.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh
        |  FROM docs d LEFT JOIN sig0 s USING (doc_id)),
        |pairs AS (SELECT CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hd
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |SELECT (SELECT count(*) FROM docs) AS n_docs,
        |  count(CASE WHEN hd <= 3 THEN 1 END) AS n_neardup_pairs,
        |  coalesce(max(CASE WHEN hd <= 3 THEN hd END), -1) AS max_hamming
        |FROM pairs""".stripMargin,
    "l41_tfidf_topterms" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
        |  FROM documents),
        |pairs AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS dcount FROM pairs GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT p.doc_id, p.term, p.tf, d.dcount,
        |    round(CAST(p.tf AS DOUBLE) * ln((1.0 + CAST(n.n_docs AS DOUBLE)) / (1.0 + CAST(d.dcount AS DOUBLE))), 6) AS score6
        |  FROM pairs p JOIN dfq d USING (term) CROSS JOIN n
        |  WHERE p.doc_id < 100),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score6 DESC, term) AS rk FROM s)
        |SELECT doc_id, rk, term, tf, dcount, score6 AS tfidf6
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "l34_bigram_stats" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x != '') AS tk
        |  FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |    i -> tk[i] || ' ' || tk[i+1])) AS b FROM t),
        |p AS (SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
        |    count(*) AS c FROM bg GROUP BY 1, 2),
        |r AS (SELECT w1, w2, c,
        |    CAST(sum(c) OVER (PARTITION BY w1) AS BIGINT) AS tw,
        |    row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rk FROM p)
        |SELECT w1, w2 AS top_next, c, tw,
        |  round(CAST(c AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS p_next
        |FROM r WHERE rk = 1 ORDER BY tw DESC, w1 LIMIT 20""".stripMargin,
    "l28_length_histogram" ->
      """WITH t AS (SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS INT) AS nt
        |  FROM documents),
        |b AS (SELECT source, nt,
        |    CAST(power(2, floor(log2(greatest(nt, 1)))) AS BIGINT) AS bucket FROM t)
        |SELECT source, bucket, count(*) AS n_docs,
        |  min(nt) AS min_toks, max(nt) AS max_toks,
        |  round(100.0 * count(*) / (sum(count(*)) OVER (PARTITION BY source)), 4) AS pct
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "l1_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS text_hash
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "l5_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS total_tokens, max(n_toks) AS max_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens
        |FROM (SELECT lang, source, n_chars,
        |        CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS INT) AS n_toks
        |      FROM documents)
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "l6_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS INT) AS n_bpeish_tokens,
        |  CAST(length(text) AS INT) AS len_chars
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "l7_lang_id" ->
      """SELECT doc_id, lang,
        |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
        |        / CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS DOUBLE), 6) AS stop_ratio,
        |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
        |            / CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS DOUBLE) >= 0.08
        |       THEN 'en' ELSE 'other' END AS pred_lang
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "l8_quality_score" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS INT) AS n_tokens,
        |  round(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |        / CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS DOUBLE), 6) AS avg_word_len,
        |  CASE WHEN n_chars < 100 THEN 'short'
        |       WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |            / CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS DOUBLE) > 6.0 THEN 'long_words'
        |       ELSE 'ok' END AS quality_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
    "l9b_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, least(length(text), 256) + 1),
        |        i -> CAST(ord(text[i]) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS poly_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "l10_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |      i -> t[i] || ' ' || t[i+1])) AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        |        FROM documents WHERE doc_id < 20))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS INT) AS inter,
        |  CAST(len(a.grams) + len(b.grams) - len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS INT) AS uni,
        |  round(CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE)
        |        / CAST(len(a.grams) + len(b.grams) - len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE), 6) AS jaccard
        |FROM g a, g b WHERE a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin)
}
