package graft

import graft.multimodal.Multimodal

/** aHash perceptual fingerprint: hand-computed bits on a real encoded
 * PNG, re-encode invariance (the near-dup contract), and the
 * undecodable-payload path. */
class ImageAHashSpec extends TestBase {
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("16x16 left-bright split: left 4 block columns 1, right 0") {
    // left 8 pixel columns white (luma 765), right black (0)
    val bytes = png(16, 16)((x, _) => if (x < 8) 0xffffff else 0x000000)
    val r = Multimodal.imageAHash(Seq((1L, bytes)).toDF("id", "img"), "id", "img")
      .collect().head
    assert(r.getBoolean(2))
    val expectRow = "1111" + "0000"
    assert(r.getString(1) == expectRow * 8)
  }

  test("a re-encoded (lossless) copy collides; an inverted image does not") {
    val a = png(16, 12)((x, _) => if (x < 6) 0xc08040 else 0x102030)
    // same pixels, freshly encoded bytes (different byte stream is fine)
    val a2 = png(16, 12)((x, _) => if (x < 6) 0xc08040 else 0x102030)
    val inv = png(16, 12)((x, _) => if (x < 6) 0x102030 else 0xc08040)
    val out = Multimodal.imageAHash(
      Seq((1L, a), (2L, a2), (3L, inv)).toDF("id", "img"), "id", "img")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("undecodable payload yields null hash, decoded=false") {
    val out = Multimodal.imageAHash(
      Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "img"), "id", "img")
      .collect().head
    assert(!out.getBoolean(2) && out.isNullAt(1))
  }
}
