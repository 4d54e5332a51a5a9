package graft.operators

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL image-codec tier (`javax.imageio`) through the SAME Spark
  * plumbing the oracle-checked stub rows (mm2/mm4) run — batched
  * mapPartitions decode and row-local resize — over real encoded PNGs
  * with known pixel content, so the asserted channel counts and mean
  * intensities are exact raster facts, not stub arithmetic. Fixtures
  * are generated in-test through the same codec (deterministic: PNG is
  * lossless), which exercises encode AND decode.
  */
class MultimodalImageSpec extends SparkSpec {

  import Multimodal.{MediaRow, decodeImage, extractFeatures, mediaTable, resizeImage}

  /** w x h image whose pixel (x, y) has RGB = (x*16, y*16, (x+y)*8). */
  private def rgbPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 16 << 16) | (y * 16 << 8) | ((x + y) * 8))
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def grayPng(w: Int, h: Int, value: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, value)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, b) => MediaRow(id, "image", b, b.length) }.toDS()
  }

  test("decodeImage through the batched mapPartitions path: exact raster facts") {
    val w = 8; val h = 8
    // closed-form mean of the generated gradient: mean over bands of
    // mean(x*16) + mean(y*16) + mean((x+y)*8) over an 8x8 grid
    val xs = for (y <- 0 until h; x <- 0 until w) yield Seq(x * 16, y * 16, (x + y) * 8)
    val expectedMean = xs.flatten.sum.toDouble / (w * h * 3)

    val feats = extractFeatures(
      media(1L -> rgbPng(w, h), 2L -> grayPng(4, 4, 200)),
      batchSize = 1, decoder = decodeImage)
      .collect().sortBy(_.doc_id)

    assert(feats.map(_.channels).toSeq === Seq(3, 1))
    assert(math.abs(feats(0).mean_intensity - expectedMean) < 1e-9)
    assert(feats(1).mean_intensity === 200.0) // uniform grayscale
  }

  test("resizeImage: lossless PNG round-trip at the new geometry") {
    // uniform-color source: ANY interpolation preserves every pixel, so
    // the resized mean must equal the source value exactly
    val resized = resizeImage(media(1L -> grayPng(16, 16, 77)), width = 4, height = 4)
      .collect().head
    val img = ImageIO.read(new java.io.ByteArrayInputStream(resized.payload))
    assert(img.getWidth === 4 && img.getHeight === 4)
    val feats = decodeImage(resized.copy(payload = resized.payload))
    assert(feats.mean_intensity === 77.0)
    assert(resized.n_bytes === resized.payload.length)

    // gradient source: nearest-neighbor downscale copies exact source
    // samples (never blends). Every output pixel must sit on the source
    // lattice — r = x*16, g = y*16, b = (x+y)*8 for integer (x, y) —
    // which bilinear/bicubic averaging would violate. (The sampling
    // PHASE is Java2D's choice — dest-pixel-center mapping — so the
    // assertion is sample-exactness, not which sample.)
    val down = resizeImage(media(2L -> rgbPng(8, 8)), width = 4, height = 4)
      .collect().head
    val d = ImageIO.read(new java.io.ByteArrayInputStream(down.payload))
    for (y <- 0 until 4; x <- 0 until 4) {
      val rgb = d.getRGB(x, y)
      val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert(r % 16 === 0, s"($x,$y) r=$r off the source lattice")
      assert(g % 16 === 0, s"($x,$y) g=$g off the source lattice")
      assert(b === (r / 16 + g / 16) * 8, s"($x,$y) blended: r=$r g=$g b=$b")
    }
  }

  test("a corrupt payload fails loudly, not silently") {
    val e = intercept[Exception] {
      extractFeatures(media(9L -> Array[Byte](1, 2, 3)), decoder = decodeImage).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("not a decodable image")))
  }

  test("stub and real tiers share the registry plumbing (same output schema)") {
    val viaStub = extractFeatures(
      mediaTable(spark, graft.TestSpark.Sf0001).limit(5)).toDF()
    val viaReal = extractFeatures(
      media(1L -> rgbPng(4, 4)), decoder = decodeImage).toDF()
    assert(viaStub.schema === viaReal.schema)
  }
}
