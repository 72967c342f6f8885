package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.apache.spark.sql.{Dataset, SparkSession}

/** The images fact table (BASELINE.json input_hint):
  * (image_id, bytes, w, h, fmt, caption, phash) — synthesised
  * deterministically (seeded, no external data). Pixels are smooth
  * per-image gradient+sinusoid fields so lossy (JPEG) round-trips stay
  * well above the 40 dB PSNR invariant; captions carry unicode + control
  * characters to exercise byte-exact caption equality.
  */
final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                          fmt: String, caption: String, phash: Long,
                          fminx: Double, fminy: Double, fmaxx: Double, fmaxy: Double)

object Images {

  // ImageIO's default stream cache is a DISK cache behind a synchronized
  // factory — 32 concurrent encoder tasks serialize on it (measured: tiling
  // got SLOWER from 8 to 32 cores). Heap-backed streams restore linear
  // scaling.
  ImageIO.setUseCache(false)

  /** Deterministic geo footprint of an image, CLOSED FORM in the image
    * index (integer modular arithmetic + exact /100 decimals) so any SQL
    * engine can re-derive it bit-for-bit — this is what lets the driver's
    * DuckDB oracle check the whole tile-assignment path.
    */
  def footprint(id: Long): (Double, Double, Double, Double) = {
    val minX = -20.0 + (id * 7919 % 3900).toDouble / 100.0
    val minY = 30.0 + (id * 104729 % 2900).toDouble / 100.0
    val w = 0.1 + (id * 13 % 90).toDouble / 100.0
    val h = 0.1 + (id * 29 % 90).toDouble / 100.0
    (minX, minY, minX + w, minY + h)
  }

  /** Pixel width/height/format, also closed form in the index. */
  def widthOf(id: Long): Int = 32 * (2 + (id % 3)).toInt
  def heightOf(id: Long): Int = 32 * (2 + (id / 3 % 3)).toInt
  def fmtOf(id: Long): String = if (id % 2 == 0) "png" else "jpg"

  /** Render a deterministic smooth RGB field. */
  def render(id: Long, w: Int, h: Int): BufferedImage = {
    val rng = new scala.util.Random(0xBEEF ^ (id * 0x5DEECE66DL + 0xBL))
    val ax = rng.nextDouble() * 0.15; val bx = rng.nextDouble() * 0.15
    val ay = rng.nextDouble() * 0.15; val by = rng.nextDouble() * 0.15
    val p1 = rng.nextDouble() * math.Pi; val p2 = rng.nextDouble() * math.Pi
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = 128 + (100 * math.sin(ax * x + ay * y + p1)).toInt
        val g = 128 + (100 * math.sin(bx * x + by * y + p2)).toInt
        val b = 128 + (100 * math.sin(0.05 * (x + y) + p1 + p2)).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  // Codec instances are cached per thread: ImageIO.read/write and
  // getImageWritersByFormatName consult the IIORegistry (synchronized
  // service lookup) on EVERY call — at ~10 codec instantiations per image
  // across 32 executor threads the registry lock serializes the tiling
  // path. Writers/readers are reusable across calls on one thread.
  private val jpegWriterTL: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() => ImageIO.getImageWritersByFormatName("jpeg").next())
  private val pngWriterTL: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() => ImageIO.getImageWritersByFormatName("png").next())
  private val jpegReaderTL: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() => ImageIO.getImageReadersByFormatName("jpeg").next())
  private val pngReaderTL: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() => ImageIO.getImageReadersByFormatName("png").next())

  /** Encode with explicit JPEG quality (0.92) so the double-compression of
    * the tiling round-trip stays above the 40 dB gate; PNG is lossless.
    */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = if (fmt == "jpg") jpegWriterTL.get() else pngWriterTL.get()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    if (fmt == "jpg") {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.92f)
      writer.write(null, new IIOImage(img, null, null), p)
    } else {
      writer.write(new IIOImage(img, null, null))
    }
    ios.close()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage = {
    // sniff the two formats this table uses (PNG signature: 0x89 'P');
    // fall back to the registry path for anything else
    if (bytes.length > 1 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte) {
      val r = pngReaderTL.get()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      r.setInput(iis); val img = r.read(0); iis.close(); img
    } else if (bytes.length > 1 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      val r = jpegReaderTL.get()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      r.setInput(iis); val img = r.read(0); iis.close(); img
    } else ImageIO.read(new ByteArrayInputStream(bytes))
  }

  /** 64-bit average-hash: 8x8 downsampled luma thresholded at its mean. */
  def phash(img: BufferedImage): Long = {
    val cw = img.getWidth / 8; val ch = img.getHeight / 8
    val luma = new Array[Double](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var acc = 0.0
        var y = by * ch
        while (y < (by + 1) * ch) {
          var x = bx * cw
          while (x < (bx + 1) * cw) {
            val rgb = img.getRGB(x, y)
            acc += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        luma(by * 8 + bx) = acc / (cw * ch)
        bx += 1
      }
      by += 1
    }
    val mean = luma.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) { if (luma(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  def caption(id: Long): String =
    f"Caption #$id%08d — ünïcödé é́ sample\ttab and µ-chars for image $id"

  /** Build one row. Sizes are multiples of the tile size 32; every ~17th
    * image duplicates the pixels of its predecessor (known dupes for the
    * phash-dedup operator).
    */
  def row(id: Long): ImageRow = {
    // planted duplicates: every 17th image re-renders the image 9 back —
    // distance 9 preserves both closed-form dimensions (id mod 3 and
    // (id/3) mod 3), so the pixel fields (and hence phash) are identical
    val renderId = if (id % 17 == 16 && id >= 9) id - 9 else id
    val w = widthOf(id)
    val h = heightOf(id)
    val fmt = fmtOf(id)
    val img = render(renderId, w, h)
    // the geo footprint is DATA (real columns of the fact table), not
    // something operators derive from the id — Tiling.tile reads these
    // columns, so it works on any images table of the input_hint shape
    val (fx0, fy0, fx1, fy1) = footprint(id)
    ImageRow(f"img-$id%08d", encode(img, fmt), w, h, fmt, caption(id), phash(img),
      fx0, fy0, fx1, fy1)
  }

  /** The synthetic images table as a distributed Dataset. */
  def table(spark: SparkSession, n: Long): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(boxed => row(boxed.longValue)))
  }

  /** Peak signal-to-noise ratio between two same-size images (dB);
    * PositiveInfinity for identical pixels.
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var se = 0.0
    var n = 0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var shift = 0
        while (shift <= 16) {
          val d = ((pa >> shift) & 0xff) - ((pb >> shift) & 0xff)
          se += d * d
          shift += 8
        }
        n += 3
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }
}
