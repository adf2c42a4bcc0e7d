package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ImageHash]] — dHash semantics (gradient bits, brightness
  * invariance, exact extremes), the distributed hash + near-dup-pair
  * path over a media table, and corrupt-member tolerance.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._
  import java.awt.image.BufferedImage

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    im
  }

  private def png(im: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def gray(v: Int): Int = { val c = v.max(0).min(255); (c << 16) | (c << 8) | c }
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // deterministic "photo": seed-keyed blocky low-frequency structure
  // + per-pixel texture. The seed must change the LOW-frequency
  // content (what survives dHash's block averaging) — a seed that only
  // phase-shifts a small texture term produces the SAME picture to a
  // perceptual hash, and correctly so. Range ≤ 221 so the +12
  // brightness shift in the near-dup tests never clamps (clamping
  // would flip real gradient bits, not just shift luma).
  private def photo(w: Int, h: Int, seed: Int)(x: Int, y: Int): Int =
    gray(((x / 7) * 73 + (y / 6) * 151 + 7) * (seed * 2 + 1) % 200
      + (x * 31 + y * 17 + seed) % 23)

  test("dHash64 extremes: monotone gradients give all-zero / all-one difference bits") {
    // luma strictly increasing left→right: every left cell darker → all 64 bits 0
    val inc = ImageHash.dHash64(img(18, 16)((x, _) => gray(x * 14))).get
    assert(inc === 0L)
    // strictly decreasing: every left cell brighter → all 64 bits 1
    val dec = ImageHash.dHash64(img(18, 16)((x, _) => gray(255 - x * 14))).get
    assert(dec === -1L)
    // images below the 9×8 grid carry no gradient signal
    assert(ImageHash.dHash64(img(8, 8)((_, _) => 0x808080)).isEmpty)
    assert(ImageHash.dHash64(img(9, 7)((_, _) => 0x808080)).isEmpty)
  }

  test("dHash64 is brightness-shift invariant and separates unrelated images") {
    val base = img(64, 48)(photo(64, 48, 1))
    val brighter = img(64, 48)((x, y) =>
      gray(((photo(64, 48, 1)(x, y)) & 0xff) + 12)) // +12 luma, clamped
    val other = img(64, 48)(photo(64, 48, 99))
    val (hb, hbr, ho) = (ImageHash.dHash64(base).get,
      ImageHash.dHash64(brighter).get, ImageHash.dHash64(other).get)
    assert(hamming(hb, hbr) <= 4, s"brightness shift moved ${hamming(hb, hbr)} bits")
    assert(hamming(hb, ho) >= 16, s"unrelated images only ${hamming(hb, ho)} bits apart")
  }

  test("imageDHashes: partition-local hashing; corrupt/sub-grid members dropped") {
    val rows = Seq(
      (0L, "image", png(img(64, 48)(photo(64, 48, 1)))),
      (1L, "image", Array[Byte](9, 9, 9)), // corrupt
      (2L, "image", png(img(4, 4)((_, _) => 0x808080))), // below grid
      (3L, "audio", Array[Byte](1, 2, 3)), // wrong kind
      (4L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "payload")
    val out = ImageHash.imageDHashes(rows).as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(0L))
    assert(out.head._2 === ImageHash.dHash64(img(64, 48)(photo(64, 48, 1))).get)
  }

  test("imageNearDupPairs: finds re-encoded/brightened twins, not unrelated images") {
    val rows = Seq(
      (0L, "image", png(img(64, 48)(photo(64, 48, 1)))),
      (1L, "image", png(img(64, 48)((x, y) =>
        gray(((photo(64, 48, 1)(x, y)) & 0xff) + 12)))), // near-dup of 0
      (2L, "image", png(img(64, 48)(photo(64, 48, 99)))), // unrelated
      (3L, "image", png(img(64, 48)(photo(64, 48, 7))))) // unrelated
      .toDF("media_id", "kind", "payload")
    val pairs = ImageHash.imageNearDupPairs(rows, maxHamming = 6)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((0L, 1L)))
    assert(pairs.head._3 <= 6L)
  }

  test("hammingPairs: 64-bit banding is complete at the threshold and exact above it") {
    import graft.operators.Dedup
    val h0 = 0x0123456789abcdefL
    val h1 = h0 ^ 0x8000000000000001L // 2 bits apart, flipped in top+bottom bands
    val h2 = h0 ^ 0x00000000000000ffL // 8 bits apart — above maxHamming 6
    val df = Seq((0L, h0), (1L, h1), (2L, h2)).toDF("id", "h")
    val pairs = Dedup.hammingPairs(df, "id", "h", maxHamming = 6, bits = 64, bands = 8)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // (0,1) ham 2 kept; (0,2) ham 8 dropped; (1,2) ham 10 dropped
    assert(pairs === Seq((0L, 1L, 2L)))
  }
}
