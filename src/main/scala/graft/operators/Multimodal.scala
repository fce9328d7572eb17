package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch "decode / feature
  * extraction" over them.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment) with a deterministic fake — `fakeDecode` derives pseudo
  * width/height from the payload's md5 — but the Spark-side plumbing is
  * real: schema, binary handling, per-partition batched processing, and a
  * declarative column path used by the oracle-checked query.
  *
  * At scale: binary payloads ride in parquet binary columns; the decode pass
  * is a narrow per-partition map (no shuffle), so it pipelines with the scan.
  * Partition sizing is governed by `spark.sql.files.maxPartitionBytes`, which
  * matters more than row count when payloads are MBs each.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("content_type", StringType))))))

  /** Documents table → fake binary assets (text bytes as payload). Stands in
    * for a real ingest of media files. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(col("source"), lit("application/octet-stream").as("content_type"))
        .as("meta"))

  /** Declarative "decode": pseudo width/height/channels from the payload md5.
    * Pure column arithmetic (portable to the DuckDB oracle). A real decoder
    * would replace exactly this projection with a batched native call. */
  def decodeColumns(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("kind"),
      length(col("payload")).cast("bigint").as("byte_len"),
      (lit(64) + (ascii(substring(md5(col("payload")), 1, 1)) * 256 +
        ascii(substring(md5(col("payload")), 2, 1))) % 448).as("width"),
      (lit(64) + (ascii(substring(md5(col("payload")), 3, 1)) * 256 +
        ascii(substring(md5(col("payload")), 4, 1))) % 448).as("height"))

  /** Stub resize: computes the target geometry (aspect-preserving fit into
    * maxW×maxH) from the decoded dims. A real implementation would replace
    * the pass-through payload with re-encoded bytes; the geometry arithmetic
    * and schema are the real plumbing. */
  def resizeStub(assets: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val d = decodeColumns(assets)
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    d.select(col("asset_id"), col("kind"), col("byte_len"),
      col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }

  /** Frame sampling for video-shaped assets: n evenly-spaced byte slices of
    * the payload, one row per frame (explode). Pure column arithmetic —
    * binary `substring` slices without decoding; a real demuxer would swap in
    * at exactly this projection. */
  def frameSample(assets: DataFrame, n: Int): DataFrame =
    assets.select(col("asset_id"), col("payload"),
        length(col("payload")).cast("bigint").as("byte_len"))
      .where(col("byte_len") > 0)
      .select(col("asset_id"), col("byte_len"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("payload"))
      .withColumn("offset", (col("frame_idx") * col("byte_len") / n).cast("bigint"))
      .withColumn("frame_bytes",
        expr(s"substring(payload, CAST(offset AS INT) + 1, " +
          s"GREATEST(CAST(byte_len / $n AS INT), 1))"))
      .drop("payload")

  /** Batched per-partition feature extraction over the binary payload —
    * the `mapPartitions` seam a native decoder (JNI / subprocess) would plug
    * into: one batch per partition, no shuffle, schema declared up front.
    * The stub emits a deterministic 4-dim feature from payload bytes. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      // Real impl: hand the whole batch to a native decoder here.
      rows.map { r =>
        val id = r.getLong(0)
        val p = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val f = Array.tabulate(4) { i =>
          if (p.isEmpty) 0f
          else (p.iterator.zipWithIndex
            .filter(_._2 % 4 == i).map(_._1.toInt & 0xff).sum % 997) / 997f
        }
        Row(id, f)
      }
    }(enc)
  }
}
