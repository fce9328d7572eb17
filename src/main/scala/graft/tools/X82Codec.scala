package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** x82 codec anatomy probe (VERDICT r12 directive 5): is the 1190 s sf25
  * wall the JPEG codec itself (inherent — document and close) or the
  * per-frame ImageIO plumbing (registry probe + reader/writer/stream
  * allocation — fixable with per-partition instance reuse, the x80
  * SPI-cache move)?
  *
  * Pure-JVM A/B, no Spark: times ENCODE and DECODE of x82-shaped frames
  * (32–80 px solid fills at bucket centers) under two plumbing regimes —
  *
  *   enc/ImageIO  — the pre-r13 jpegFrame path: `getImageWritersByFormatName`
  *                  registry walk + `createImageOutputStream` SPI probe +
  *                  writer.dispose(), all per frame
  *   enc/cached   — one writer per thread, `MemoryCacheImageOutputStream`
  *                  constructed directly, setOutput per frame
  *   dec/ImageIO  — the pre-r13 readImageOrNull path: `ImageIO.read`, which
  *                  walks the provider registry (`getImageReaders` probe
  *                  loop) per frame
  *   dec/cached   — one JPEG reader per thread, fresh
  *                  MemoryCacheImageInputStream + setInput per frame
  *
  * — at 1 thread (pure per-call cost) and 32 threads (x82's task shape;
  * exposes any synchronized registry/SPI state the per-call path hits,
  * the exact failure mode the audio tier measured in round 5). Each cell
  * is best-of-3 over the same frame population; decode phases verify the
  * recovered center pixel so the codec work cannot be dead-code-eliminated.
  */
object X82Codec {
  private val UsePerFrame = 4 // frames per asset shape, like x82's 2..5

  private def geom(id: Long): (Int, Int, Int) = {
    val w = (32 + 16 * (id % 4)).toInt
    val h = (32 + 16 * ((id * 3) % 4)).toInt
    val rgb = ((8 + 16 * (id % 16)).toInt << 16) |
      ((8 + 16 * ((id * 3) % 16)).toInt << 8) | (8 + 16 * ((id * 7) % 16)).toInt
    (w, h, rgb)
  }

  private def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  private def encImageIO(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.97f)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  private final class CachedCodec {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.97f)
      p
    }
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
    def enc(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close()
      bos.toByteArray
    }
    def dec(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally iis.close()
    }
  }

  private def runThreads(nThreads: Int, perThread: Int)(
      work: (Int, Int) => Unit): Double = {
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(nThreads)
    // countDown in finally + first-error capture (ADVICE r13): a worker
    // that throws would otherwise swallow the exception in the executor
    // and leave done.await() hanging forever — a silent bench deadlock
    val firstError = new java.util.concurrent.atomic.AtomicReference[Throwable]
    for (t <- 0 until nThreads) pool.execute { () =>
      try {
        start.await()
        var i = 0
        while (i < perThread) { work(t, i); i += 1 }
      } catch {
        case e: Throwable => firstError.compareAndSet(null, e): Unit
      } finally done.countDown()
    }
    val t0 = System.nanoTime()
    start.countDown()
    done.await()
    val dt = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS)
    if (firstError.get() != null) throw firstError.get()
    dt
  }

  def main(args: Array[String]): Unit = {
    val perThread = if (args.nonEmpty) args(0).toInt else 4000
    val check = new java.util.concurrent.atomic.AtomicLong(0)

    for (nThreads <- Seq(1, 32)) {
      // one frame + encoded-bytes population per thread (id-varied shapes)
      val imgs = Array.tabulate(perThread) { i =>
        val (w, h, rgb) = geom(i.toLong * UsePerFrame); frame(w, h, rgb)
      }
      val codec0 = new CachedCodec
      val bytes = imgs.map(codec0.enc)
      val codecs = Array.fill(nThreads)(new CachedCodec)

      def best3(label: String)(work: (Int, Int) => Unit): Unit = {
        val t = (1 to 3).map(_ => runThreads(nThreads, perThread)(work)).min
        val perFrame = t / (nThreads.toLong * perThread) * 1e6
        println(f"x82codec t=$nThreads%2d $label%-12s best3=$t%7.3f s  ($perFrame%8.1f us/frame)")
      }

      best3("enc/ImageIO") { (_, i) => check.addAndGet(encImageIO(imgs(i)).length.toLong) }
      best3("enc/cached") { (t, i) => check.addAndGet(codecs(t).enc(imgs(i)).length.toLong) }
      best3("dec/ImageIO") { (_, i) =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes(i)))
        check.addAndGet(img.getRGB(img.getWidth / 2, img.getHeight / 2).toLong)
      }
      best3("dec/cached") { (t, i) =>
        val img = codecs(t).dec(bytes(i))
        check.addAndGet(img.getRGB(img.getWidth / 2, img.getHeight / 2).toLong)
      }
    }
    println(s"x82codec checksum=${check.get()}") // defeat DCE
  }
}
