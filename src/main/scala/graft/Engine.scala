package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Session + catalog plumbing for the engine.
  *
  * The reference's table registry is the `metadata/` dir of a ClickHouse
  * server (reference `Dockerfile:185`); here the catalog is Spark temp
  * views, one per Parquet table in the scale-factor dir — the
  * Spark-native equivalent of `clickhouse-local` querying files in place
  * (reference `Dockefile-ubuntu:52`).
  */
object Engine {

  /** Shared local-session factory (the engine's `clickhouse-local`
    * mode, SURVEY §3.3): local[$SPARK_GRAFT_CPUS], shuffle partitions
    * = cores, UTC, nanos-as-long parquet reads. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Cluster-shape rehearsal knob (VERDICT r11 #5): a real cluster
    // runs shuffle partitions >> cores (e.g. 256 over 1000 executors);
    // overriding this proves no query depends on the partitions==cores
    // coincidence of local mode (AQE coalescing absorbs the extra).
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Testdata timestamps are naive parquet TIMESTAMP(MICROS); read
      // them as TimestampType (session-UTC ≡ the naive value), not
      // TIMESTAMP_NTZ — watermarks and several time ops require LTZ.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_io/warehouse")
      .config("spark.ui.enabled", "false")
      // Spark 4's ICU collation path has a static initializer
      // (CollationAwareUTF8String.<clinit>) that precomputes case-map
      // tables for minutes of CPU on first interpreted lower()/upper();
      // every other string-touching query then serializes on the
      // class-init lock (observed: arbitrary queries 10-20x slower in
      // long multi-query sessions). JVM case mappings are identical for
      // the engine's ASCII data, so use them.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // Long many-query sessions (Verify/Bench run ~100 queries in one
      // JVM): cap status-store retention so listener state — including
      // the large AQE plan strings — can't accumulate across queries.
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val cleanupRoots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Scratch dir for MUTATED outputs, namespaced per sf-dir + Spark
    * application so concurrent sessions / different scale factors never
    * collide. A JVM shutdown hook deletes the whole per-app tree, so
    * nothing accumulates across runs (ADVICE r3: the appId namespace
    * previously leaked a fresh tree per run). Reusable derived data
    * belongs in [[stagingCache]] instead. */
  def scratch(spark: SparkSession, dir: String, name: String): String = {
    val root = s"/tmp/graft_io/${new java.io.File(dir).getName}_${spark.sparkContext.applicationId}"
    if (cleanupRoots.add(root)) {
      val rootFile = new java.io.File(root)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(rootFile)))
    }
    s"$root/$name"
  }

  /** Width of the range exchange in the staged-rank patterns
    * (DistRank / stagedCumOffsets / i4b / zorderWrite). A fixed literal
    * is correct at local[32] but wrong at scale — 32 range partitions
    * over 100 TB is ~3 TB per partition (VERDICT r17 #3). Default =
    * `defaultParallelism` (the cluster's actual width); the
    * surrounding algebra (per-partition counts → broadcast offsets) is
    * width-independent, which `DistRankSpec` proves by re-running under
    * a `SPARK_GRAFT_STAGING_WIDTH` override. */
  def stagingWidth(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.stagingWidth").map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_STAGING_WIDTH").map(_.toInt))
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** Deterministic per-sf cache path for IMMUTABLE derived data (e.g.
    * the staged streaming source files): survives across runs so a
    * `_SUCCESS`-gated staging step is paid once per machine, not once
    * per session (ADVICE r3). */
  def stagingCache(dir: String, name: String): String =
    s"/tmp/graft_io/cache/${new java.io.File(dir).getName}/$name"

  /** All driver-generated testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from the sf dir. Vectorized Parquet scan; Catalyst
    * pushes filters/projections down to it (SURVEY §4). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader can't
    * represent natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as an
    * epoch-nanos Long. Truncate to micros — the same thing DuckDB's
    * implicit TIMESTAMP_NS→TIMESTAMP cast does — and restore
    * TimestampType so downstream date/window functions work. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Sessions without the inferTimestampNTZ knob (e.g. the driver's
        // smoke session): naive micros ≡ UTC instant for this data. The
        // NTZ→LTZ cast interprets the naive value in the SESSION time
        // zone, and a foreign session may not run UTC — pin UTC around
        // the cast (Dataset analysis is eager, so ResolveTimeZone stamps
        // the zone into the Cast here, not at execution).
        val tzKey = "spark.sql.session.timeZone"
        val prevTz = spark.conf.get(tzKey)
        spark.conf.set(tzKey, "UTC")
        try raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        finally spark.conf.set(tzKey, prevTz)
      case _ => raw
    }
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view so `spark.sql` text queries
    * resolve against the same data the DataFrame API reads.
    *
    * Idempotent per (session, dir): each `spark.read.parquet` costs a
    * driver-side footer/schema read, so re-registering all 10 tables on
    * every SQL-text query (the frozen `fz*` rows call this) would add
    * ~1 s of pure catalog overhead per query. Re-registers only when
    * the session switches to a different sf dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.put(spark, dir) != dir)
      tableNames.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
