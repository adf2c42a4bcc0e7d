package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual image hashing + image near-dup discovery — the dedup
  * family extended over the multimodal column (reference has no media
  * surface at all; this is extension-set, the image analog of
  * [[graft.operators.Dedup.simHashPairs]]).
  *
  * The signature is the classic 64-bit DIFFERENCE hash (dHash): the
  * image is reduced to a 9×8 grid of integer block-average luminances
  * and each bit records whether a cell is brighter than its right
  * neighbor. Because the bits encode horizontal luminance *gradients*,
  * the hash is invariant to global brightness/contrast shifts and
  * robust to re-encoding and mild resizing — the transforms that
  * produce most duplicate images in a crawled corpus — while
  * unrelated images land ~32 bits apart (each bit ~ a fair coin).
  *
  * Determinism discipline (task retries / speculative execution must
  * agree bit-for-bit):
  *  - integer BT.601 luma (`(299r+587g+114b)/1000`, integer division),
  *    the same formula as [[Multimodal.lumaHistogram]];
  *  - grid cell boundaries by integer division (`gx·w/9 … (gx+1)·w/9`),
  *    never FP resampling;
  *  - cell comparison by exact cross-multiplication
  *    (`sumL·cntR > sumR·cntL`), so no division-rounding ties.
  *
  * Scale shape: payloads never shuffle — hashing is partition-local
  * over the scan (the [[Multimodal.extractFeatures]] discipline); only
  * (media_id, 64-bit hash) rows move. Pair discovery reuses the
  * pigeonhole Hamming banding equi-join
  * ([[graft.operators.Dedup.hammingPairs]]) — never an all-pairs
  * cross join.
  */
object ImageHash {

  /** 64-bit dHash of a decoded image: 9×8 grid of integer block-average
    * luminances, bit `gy·8+gx` set iff cell (gx,gy) is brighter than
    * cell (gx+1,gy). None for images smaller than the grid (no
    * meaningful gradient signal below 9×8). */
  private[multimodal] def dHash64(img: java.awt.image.BufferedImage): Option[Long] = {
    val w = img.getWidth; val h = img.getHeight
    if (w < 9 || h < 8) None
    else {
      val sums = new Array[Long](72) // 9 cols × 8 rows, index gy*9+gx
      val cnts = new Array[Long](72)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        val gy = y * 8 / h
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          val i = gy * 9 + x * 9 / w
          sums(i) += lum
          cnts(i) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val l = gy * 9 + gx
          // meanL > meanR without division: sumL/cntL > sumR/cntR.
          // Overflow bound: sums ≤ 255·cellPx and cnts ≤ cellPx, so the
          // product ≤ 255·cellPx² < 2^63 while cellPx < 1.9e8 — i.e.
          // any image under ~13.6 gigapixels (cellPx ≈ w·h/72). Real
          // decodable payloads are orders of magnitude below that
          // (BufferedImage itself caps at 2^31 pixels ≈ 0.03e9 cellPx).
          if (sums(l) * cnts(l + 1) > sums(l + 1) * cnts(l))
            hash |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      Some(hash)
    }
  }

  /** (media_id, dhash) for every decodable image payload — decode +
    * hash partition-local over the scan, batched like
    * [[Multimodal.extractFeatures]]; corrupt / non-image / sub-grid
    * payloads are dropped (the total-function discipline: a 100 TB
    * corpus always contains corrupt members). */
  def imageDHashes(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val src = castToImpl(media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload")))
    val rows = src.queryExecution.toRdd.mapPartitions { iter =>
      iter.map { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        (id, payload)
      }.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, p) =>
          if (p == null || p.isEmpty) None
          else try {
            val img = javax.imageio.ImageIO.read(
              new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(p)))
            if (img == null) None else dHash64(img).map(Row(id, _))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Image near-dup pairs with dHash Hamming distance ≤ `maxHamming`:
    * partition-local hashing, then the pigeonhole banding equi-join
    * (complete for `maxHamming < bands`).
    *
    * @return (id1, id2, hamming) with id1 < id2
    */
  def imageNearDupPairs(
      media: DataFrame,
      maxHamming: Int = 6,
      bands: Int = 8,
      batchSize: Int = 32): DataFrame =
    graft.operators.Dedup.hammingPairs(
      imageDHashes(media, batchSize), "media_id", "dhash",
      maxHamming = maxHamming, bits = 64, bands = bands)
}
