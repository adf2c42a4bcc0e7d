package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / frame-sampling as *partition-local
  * batched* transforms.
  *
  * Decoding is pluggable behind [[Decoder]]. Images decode for REAL
  * via [[ImageIoDecoder]] (the JDK's own `javax.imageio` PNG/BMP/GIF/
  * JPEG codecs), audio for REAL via [[WavDecoder]] (the JDK's own
  * `javax.sound.sampled` WAV/AIFF/AU PCM support), and animated-GIF
  * video demuxes for REAL via [[GifDemuxer]] (`javax.imageio`'s
  * indexed multi-frame GIF reads) — no external library for any.
  * Only containers the JDK has no codec for (MP4/MKV demux) keep a
  * deterministic stand-in (`FakeDecoder` / chunked [[sampleFrames]]);
  * the Spark-side contract (schema, batching, partitioning, null
  * discipline) is identical either way, so swapping in a JNI/FFM
  * codec is a one-class change.
  *
  * Scale shape: payloads never shuffle — decode is `mapPartitions`
  * directly over the scan, so each executor streams its own parquet
  * row groups. Batching (`batchSize`) models the vectorized-decode
  * boundary (the JVM analog of PySpark's `mapInPandas` Arrow batches):
  * a real decoder amortizes model/codec setup per batch, not per row.
  * Skew: media bytes vary wildly per row — cap
  * `spark.sql.files.maxPartitionBytes` (not row counts) so a partition
  * of 4K videos fits executor memory.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("codec", StringType)))

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", metaType)))

  /** The decode seam. Implementations must be deterministic per payload
    * (retries/speculative tasks must agree) and total (null/empty
    * payload → None, never throw — a 100 TB corpus always contains
    * corrupt members).
    */
  trait Decoder extends Serializable {
    /** Batched decode: one call per batch of payloads (the vectorized
      * boundary). Returns one feature vector per input, aligned by
      * index. */
    def decodeBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Option[Array[Float]]]
  }

  /** Deterministic fake: features are a folded byte histogram — stands
    * in for a real image/audio encoder (STUB: replace with a codec
    * binding; the pipeline around it does not change). */
  object FakeDecoder extends Decoder {
    override def decodeBatch(
        payloads: Seq[Array[Byte]], dim: Int): Seq[Option[Array[Float]]] =
      payloads.map { p =>
        if (p == null || p.isEmpty) None
        else {
          val f = new Array[Float](dim)
          var i = 0
          while (i < p.length) {
            f(i % dim) += ((p(i) & 0xff).toFloat / 255.0f)
            i += 1
          }
          Some(f)
        }
      }
  }

  /** `dim`-bin normalized luminance histogram of a decoded image:
    * integer BT.601 luma per pixel (`(299r+587g+114b)/1000`, integer
    * division) binned as `lum*dim/256` — bit-deterministic across JVMs
    * and task retries. Bulk row fetch (one `getRGB` per ROW, not per
    * pixel) avoids the per-call color-model conversion on the hot
    * executor loop. Returns None for degenerate dimensions.
    */
  private[multimodal] def lumaHistogram(
      img: java.awt.image.BufferedImage, dim: Int): Option[Array[Float]] = {
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) None
    else {
      val f = new Array[Float](dim)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          f(lum * dim / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < dim) { f(i) /= n; i += 1 }
      Some(f)
    }
  }

  /** Real image decode via the JDK's built-in `javax.imageio` codecs
    * (PNG/BMP/GIF/JPEG ship with every JVM — no external library).
    * Feature = `dim`-bin luminance histogram, normalized by pixel
    * count: integer BT.601 luma per pixel (`(299r+587g+114b)/1000`,
    * integer division) binned as `lum*dim/256`, so the histogram is
    * bit-deterministic across JVMs and task retries. Corrupt or
    * non-image payloads decode to None (`ImageIO.read` returns null
    * for unrecognized formats; anything thrown is caught) — a 100 TB
    * corpus always contains corrupt members.
    *
    * This retires the decode stub for images; [[FakeDecoder]] remains
    * for determinism tests and as the stand-in for codecs the JDK
    * lacks (audio/video demux).
    */
  object ImageIoDecoder extends Decoder {
    override def decodeBatch(
        payloads: Seq[Array[Byte]], dim: Int): Seq[Option[Array[Float]]] =
      payloads.map { p =>
        if (p == null || p.isEmpty) None
        else try {
          // in-memory stream only: the default ImageIO path spills a
          // disk cache file per read — forbidden on a hot executor
          val img = javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(p)))
          if (img == null) None
          else lumaHistogram(img, dim)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
  }

  /** Real audio decode via the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU containers with 8- or 16-bit integer PCM ship with
    * every JVM — no external library, the same way [[ImageIoDecoder]]
    * retired the image stub). Feature = `dim`-bin amplitude histogram
    * over every sample of every channel, normalized by sample count:
    * samples widen to signed 16-bit (8-bit payloads shift left 8), bin
    * as `(s + 32768) * dim / 65536` — integer arithmetic end to end, so
    * the histogram is bit-deterministic across JVMs and task retries.
    * Corrupt / non-audio / compressed payloads decode to None
    * (`UnsupportedAudioFileException` and friends are caught) — a
    * 100 TB corpus always contains corrupt members.
    *
    * This retires the decode stub for audio; [[FakeDecoder]] remains
    * only for video demux (no JDK codec).
    */
  /** Decode a WAV/AIFF/AU payload to signed 16-bit-range PCM samples
    * (8-bit widened `<< 8`; unsigned re-centered) — the shared sample
    * extraction under [[WavDecoder]]'s histogram and
    * [[audioEnergyFrames]]' windowed energies. Total: corrupt or
    * unsupported payloads → None, never throw. */
  private[multimodal] def pcmSamples(p: Array[Byte]): Option[Array[Int]] = {
    if (p == null || p.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if ((bits != 8 && bits != 16) || (!signed && !unsigned)) None
        else {
          val bytes = ais.readAllBytes()
          if (bits == 8) {
            val out = new Array[Int](bytes.length)
            var i = 0
            while (i < bytes.length) {
              // widen to 16-bit range; unsigned 8-bit centers at 128
              out(i) =
                if (signed) bytes(i).toInt << 8
                else ((bytes(i) & 0xff) - 128) << 8
              i += 1
            }
            Some(out)
          } else {
            val big = fmt.isBigEndian
            val n = bytes.length / 2
            val out = new Array[Int](n)
            var i = 0
            while (i + 1 < bytes.length) {
              val lo = if (big) bytes(i + 1) else bytes(i)
              val hi = if (big) bytes(i) else bytes(i + 1)
              val raw = ((hi & 0xff) << 8) | (lo & 0xff)
              out(i / 2) = if (signed) raw.toShort.toInt else raw - 32768
              i += 2
            }
            Some(out)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  object WavDecoder extends Decoder {
    override def decodeBatch(
        payloads: Seq[Array[Byte]], dim: Int): Seq[Option[Array[Float]]] =
      payloads.map { p =>
        pcmSamples(p).filter(_.nonEmpty).map { samples =>
          val f = new Array[Float](dim)
          var i = 0
          while (i < samples.length) {
            f((samples(i) + 32768) * dim / 65536) += 1.0f
            i += 1
          }
          var j = 0
          while (j < dim) { f(j) /= samples.length.toFloat; j += 1 }
          f
        }
      }
  }

  /** Decode payloads to feature vectors, partition-local and batched:
    * output (media_id, kind, features array<float> nullable).
    */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 64,
      batchSize: Int = 32,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val src = castToImpl(media.select(col("media_id"), col("kind"), col("payload")))
    val rows = src.queryExecution.toRdd.mapPartitions { iter =>
      iter.map { ir =>
        val id = ir.getLong(0)
        val kind = if (ir.isNullAt(1)) null else ir.getUTF8String(1).toString
        val payload = if (ir.isNullAt(2)) null else ir.getBinary(2)
        (id, kind, payload)
      }.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_._3), dim)
        batch.lazyZip(feats).map { case ((id, kind, _), f) =>
          Row(id, kind, f.map(_.toSeq).orNull)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** The frame-demux seam: payload → sampled decoded frames. Same
    * contract as [[Decoder]]: deterministic per payload, total (corrupt
    * / non-matching payloads → empty, never throw).
    */
  trait FrameDemuxer extends Serializable {
    /** Every `stride`-th frame of the payload, as
      * (frame_idx, width, height, `dim`-bin luma histogram). */
    def demux(payload: Array[Byte], stride: Int, dim: Int): Seq[(Int, Int, Int, Array[Float])]
  }

  /** REAL multi-frame demux for animated GIF via the JDK's own
    * `javax.imageio` GIF reader (`getNumImages` + indexed `read(i)`) —
    * no external library, the same route [[ImageIoDecoder]] and
    * [[WavDecoder]] took to retire their stubs. Each sampled frame
    * decodes to the same bit-deterministic luma histogram as still
    * images.
    *
    * Honest scope: frames are decoded as STORED (each GIF frame's own
    * raster, which may be a sub-rectangle of the logical screen under
    * GIF's incremental-update encoding) — no disposal-method
    * compositing. That keeps the per-frame cost O(frame raster) and is
    * exactly what frame-level feature extraction wants; compositing
    * belongs to a playback engine, not a feature pipeline. Container
    * formats with no JDK codec (MP4/MKV) still go through
    * [[sampleFrames]]' chunk stand-in.
    */
  object GifDemuxer extends FrameDemuxer {
    override def demux(
        payload: Array[Byte], stride: Int, dim: Int): Seq[(Int, Int, Int, Array[Float])] = {
      if (payload == null || payload.isEmpty) return Seq.empty
      try {
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) return Seq.empty
          val reader = readers.next()
          try {
            reader.setInput(in, false, true)
            // allowSearch: GIF has no frame-count directory — the reader
            // must walk the stream once; fine, the payload is in memory
            val n = reader.getNumImages(true)
            (0 until n by stride).flatMap { i =>
              val img = reader.read(i)
              lumaHistogram(img, dim).map(h => (i, img.getWidth, img.getHeight, h))
            }
          } finally reader.dispose()
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }
  }

  /** Real frame sampling: demux each video payload partition-locally and
    * emit one row per sampled decoded frame —
    * (media_id, frame_idx, width, height, features). Payloads never
    * shuffle (the demux runs directly over the scan); fan-out is
    * per-row only, so this composes with downstream per-frame dedup /
    * similarity without re-materializing the corpus.
    */
  def sampleFramesDecoded(
      media: DataFrame,
      stride: Int = 4,
      dim: Int = 64,
      demuxer: FrameDemuxer = GifDemuxer): DataFrame = {
    require(stride > 0 && dim > 0)
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val src = castToImpl(media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload")))
    val rows = src.queryExecution.toRdd.mapPartitions { iter =>
      iter.flatMap { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        demuxer.demux(payload, stride, dim).map { case (idx, w, h, f) =>
          Row(id, idx, w, h, f.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Windowed audio energy — frame-level features over REAL decoded
    * PCM ([[pcmSamples]], the WAV/AIFF/AU route): the sample stream
    * splits into `nFrames` equal windows and each emits its
    * mean-square amplitude as an EXACT integer (`Σ s² / count`,
    * integer division — no FP anywhere, so any engine or rerun
    * reproduces it bit-for-bit). Same partition-local explode shape as
    * [[sampleFramesDecoded]]: payloads never shuffle, one output row
    * per (media_id, frame_idx), empty/corrupt payloads vanish.
    */
  def audioEnergyFrames(media: DataFrame, nFrames: Int = 16): DataFrame = {
    require(nFrames > 0)
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy_ms", LongType, nullable = false)))
    val src = castToImpl(media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload")))
    val rows = src.queryExecution.toRdd.mapPartitions { iter =>
      iter.flatMap { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        pcmSamples(payload).toSeq.flatMap { s =>
          val n = s.length
          (0 until nFrames).flatMap { w =>
            val from = (w.toLong * n / nFrames).toInt
            val until = ((w + 1).toLong * n / nFrames).toInt
            if (until <= from) None
            else {
              var sum = 0L
              var i = from
              while (i < until) { val v = s(i).toLong; sum += v * v; i += 1 }
              Some(Row(id, w, (until - from).toLong, sum / (until - from)))
            }
          }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic frame sampling for video payloads: every `stride`-th
    * fixed-size chunk becomes a frame row (media_id, frame_idx,
    * frame binary). The chunking is the STAND-IN for containers with no
    * JDK codec (MP4/MKV) — GIF demuxes for real via
    * [[sampleFramesDecoded]] — but the explode shape (one row per
    * sampled frame, payload never shuffled before sampling) is the
    * production shape either way.
    */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val chunks = udf { (payload: Array[Byte]) =>
      if (payload == null) Seq.empty[(Int, Array[Byte])]
      else payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => (i, chunk) }.toSeq
    }
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(chunks(col("payload"))).as("frame"))
      .select(col("media_id"),
        col("frame._1").as("frame_idx"),
        col("frame._2").as("frame"))
  }

  /** Pure-metadata resize: rewrite width/height, payload untouched —
    * metadata transforms must never force a payload scan (column
    * pruning keeps the binary column out of the plan entirely). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")).as("meta"))

  /** Deterministic synthetic media table for tests/demos: payload bytes
    * derived from media_id. */
  def synthetic(spark: SparkSession, n: Int, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt * 16)(j =>
        ((i * 131 + j * 31 + 7) % 251).toByte)
      (i, kind, payload, (640, 480, 16000, 1000 + i.toInt, "fake"))
    }.toDF("media_id", "kind", "payload", "meta")
      .withColumn("meta", col("meta").cast(metaType))
  }
}
