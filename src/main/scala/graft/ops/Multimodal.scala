package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Multimodal-column plumbing (project brief): media as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is a deterministic STUB (this container has no
  * image/audio codecs — see brief): `fakeDecode` stands in for a real
  * decoder. Everything around it is real Spark plumbing: binary
  * payloads survive Parquet round trips, metadata travels as typed
  * columns, and the feature extractor runs as `mapPartitions` over a
  * typed Dataset — the Scala-native equivalent of `mapInPandas`
  * (one iterator per partition, batch-shaped, no per-row driver
  * involvement), so a real decoder drops in without changing the
  * query shape. At 100 TB the payload column stays columnar-pruned
  * unless a query touches it.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A decoded "frame": summary features a real codec would emit. */
  case class MediaFeatures(
    doc_id: Long, width: Int, height: Int,
    n_bytes: Int, mean_byte: Double, max_byte: Int)

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** STUB decoder — deterministic byte statistics standing in for
    * pixel decoding. Replace with a real codec binding in production. */
  private[graft] def fakeDecode(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    var sum = 0L
    var mx = 0
    var i = 0
    while (i < n) { val v = bytes(i) & 0xff; sum += v; if (v > mx) mx = v; i += 1 }
    MediaFeatures(r.doc_id, r.width, r.height, n,
      if (n == 0) 0.0 else sum.toDouble / n, mx)
  }

  /** Synthesize a media table from documents: payload = UTF-8 bytes
    * (opaque binary), metadata derived deterministically. */
  private[graft] def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"))

  /** Feature extraction over partition iterators (mapInPandas shape). */
  private def mm1Features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRow]
      .mapPartitions(rows => rows.map(fakeDecode))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"), col("max_byte"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "mm1_media_features" -> (mm1Features _))

  /** Oracle: the byte statistics are computable in SQL because the stub
    * payload is the UTF-8 text itself — validating the full binary
    * pipeline (payload → partition decode → features) against an
    * independent computation. */
  val oracles: Map[String, String] = Map(
    "mm1_media_features" ->
      """SELECT doc_id,
        |  CAST(n_chars % 64 + 1 AS INT) AS width,
        |  CAST(doc_id % 48 + 1 AS INT) AS height,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  round(CAST(list_sum(list_transform(range(1, length(text) + 1),
        |        i -> ord(text[i]))) AS DOUBLE) / CAST(length(text) AS DOUBLE), 6) AS mean_byte,
        |  CAST(list_max(list_transform(range(1, length(text) + 1),
        |        i -> ord(text[i]))) AS INT) AS max_byte
        |FROM documents ORDER BY doc_id""".stripMargin)
}
