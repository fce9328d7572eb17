package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch "decode / feature
  * extraction" over them.
  *
  * IMAGE decode is REAL: [[decodeImages]] runs the JDK's PNG/JPEG/BMP/GIF
  * codec (`javax.imageio`, in the `java.desktop` module — no external
  * dependency) inside the `mapPartitions` seam and recovers geometry +
  * exact per-channel means; [[synthesizePng]] produces the matching
  * oracle-predictable fixtures through the same real encoder.
  *
  * AUDIO decode is REAL too: [[decodeWav]] runs the JDK's WAV/PCM codec
  * (`javax.sound.sampled`, also `java.desktop`) to recover format, frame
  * count and exact amplitude stats from container bytes;
  * [[synthesizeWav]] encodes the matching fixtures. Only VIDEO remains a
  * declarative stand-in ([[frameSample]]): the JDK genuinely ships no
  * video codec, but the schema/partitioning/batch plumbing is real and
  * tested.
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
  def frameSample(assets: DataFrame, n: Int): DataFrame = {
    // sequence(0, n-1) counts DOWN for n <= 0 (emitting bogus indices 0, -1)
    // and frame_idx*len/n would divide by zero under ANSI mode — fail fast
    require(n >= 1, s"frameSample needs at least one frame, got $n")
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
  }

  /** Deterministic PNG fixtures from the documents table: each doc_id
    * becomes a solid-fill RGB PNG whose geometry and fill color are pure
    * arithmetic on the id — so an oracle can predict, in SQL, exactly what
    * a correct decoder must recover from the compressed bytes. Encoding
    * runs the JDK's REAL PNG encoder per row (a narrow map, no shuffle);
    * PNG is lossless, so the round trip through [[decodeImages]] is exact. */
  def synthesizePng(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    docs.select("doc_id").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      rows.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 24).toInt
        val h = (8 + (id * 3) % 24).toInt
        val fill = new java.awt.Color(
          (id % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(fill); g.fillRect(0, 0, w, h); g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL image decode over a binary payload column: `javax.imageio` parses
    * the compressed PNG/JPEG/BMP/GIF bytes and the pass emits geometry plus
    * exact per-channel pixel means. Narrow `mapPartitions` (pipelines with
    * the scan, no shuffle); an undecodable payload yields null metrics
    * rather than failing the batch. The channel means are exact doubles:
    * the Long pixel sums are ≪ 2^53, so the division result is the
    * correctly-rounded mean with no accumulation error. */
  def decodeImages(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        // ImageIO.read returns null only for UNRECOGNIZED formats; a payload
        // with valid magic bytes but a corrupt body THROWS — catch it so one
        // bad asset degrades to null metrics instead of failing the batch
        val img =
          if (bytes.isEmpty) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Row(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }(enc)
  }

  /** Deterministic WAV fixtures from the documents table: each doc_id
    * becomes a constant-amplitude PCM16 mono WAV (8 kHz) whose sample
    * count and amplitude are pure arithmetic on the id — so an oracle can
    * predict, in SQL, exactly what a correct decoder must recover from the
    * container bytes. Encoding runs the JDK's REAL WAV writer per row (a
    * narrow map, no shuffle); PCM is lossless, so the round trip through
    * [[decodeWav]] is exact. The constant fill is the same oracle trick as
    * [[synthesizePng]]'s solid color: the decoder can't know the arithmetic,
    * so a byte-order, sign or container-parse mistake still mismatches. */
  def synthesizeWav(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    docs.select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (64 + id % 192).toInt
        val v = (id % 1999 - 999).toShort
        val pcm = new Array[Byte](n * 2) // PCM16LE mono
        var i = 0
        while (i < n) {
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          /* signed = */ true, /* bigEndian = */ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL audio decode over a binary payload column: `javax.sound.sampled`
    * parses the WAV/AIFF/AU container and the pass emits format (rate,
    * channels, bit depth), frame count and exact amplitude stats over the
    * PCM16 samples. Narrow `mapPartitions` (pipelines with the scan, no
    * shuffle); an undecodable or non-PCM16 payload yields null metrics
    * rather than failing the batch. The mean is exact: sample sums fit a
    * Long far below 2^53, so the final division is correctly rounded. */
  def decodeWav(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("mean_amp", DoubleType),
      StructField("peak", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val nullRow = (id: Long) => Row(id, null, null, null, null, null, null)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          if (fmt.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) nullRow(id)
          else {
            val data = ais.readAllBytes()
            val ch = fmt.getChannels
            val big = fmt.isBigEndian
            val n = data.length / 2
            var sum = 0L
            var peak = 0
            var i = 0
            while (i < n) {
              val b0 = data(2 * i) & 0xff
              val b1 = data(2 * i + 1) & 0xff
              val s = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
              sum += s
              val a = if (s < 0) -s else s
              if (a > peak) peak = a
              i += 1
            }
            Row(id, fmt.getSampleRate.toInt, ch, 16, (n / ch).toLong,
              if (n == 0) null else sum.toDouble / n, peak)
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => nullRow(id)
          case _: java.io.IOException => nullRow(id)
        }
      }
    }(enc)
  }

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
