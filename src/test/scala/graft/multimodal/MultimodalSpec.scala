package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.types._

object MultimodalSpec {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  object CountingDecoder extends Multimodal.Decoder {
    override def decodeBatch(ps: Seq[Array[Byte]], dim: Int): Seq[Option[Array[Float]]] = {
      calls.incrementAndGet()
      Multimodal.FakeDecoder.decodeBatch(ps, dim)
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthetic(spark, 60, partitions = 4).cache()

  test("synthetic media table matches the canonical schema shape") {
    val s = media.schema
    assert(s("media_id").dataType === LongType)
    assert(s("payload").dataType === BinaryType)
    assert(s("meta").dataType === Multimodal.metaType)
    assert(media.count() === 60)
  }

  test("extractFeatures: deterministic, dim-sized, one row per input, partition-preserving") {
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 8)
    assert(f1.schema("features").dataType === ArrayType(FloatType))
    val rows = f1.collect()
    assert(rows.length === 60)
    assert(rows.forall(_.getSeq[Float](2).size === 16))
    // determinism across runs (speculative-task safety)
    val m1 = rows.map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val m2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(m1 === m2)
    // batch size must not change results (the vectorized boundary is
    // purely an amortization seam)
    val m3 = Multimodal.extractFeatures(media, dim = 16, batchSize = 1000)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(m1 === m3)
  }

  test("extractFeatures: corrupt (empty/null) payloads yield null features, not failures") {
    val bad = Seq(
      (1000L, "image", Array.emptyByteArray),
      (1001L, "image", null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(bad, dim = 8).collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(2)))
  }

  test("decodeBatch is called per batch, not per row") {
    // counter lives in a singleton: task closures are serialized even in
    // local mode, but the deserialized decoder still hits this object
    MultimodalSpec.calls.set(0)
    val one = Multimodal.synthetic(spark, 10, partitions = 1)
    Multimodal.extractFeatures(one, dim = 4, batchSize = 4,
      decoder = MultimodalSpec.CountingDecoder).collect()
    // single partition, 10 rows, batch 4 → 3 calls
    assert(MultimodalSpec.calls.get() === 3)
  }

  test("sampleFrames: only video rows, stride-spaced frame indices, deterministic chunks") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val vids = media.filter($"kind" === "video").select("media_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(vids))
    assert(rows.forall(_.getInt(1) % 2 === 0))
    assert(rows.forall(_.getAs[Array[Byte]](2).length <= 64))
  }

  test("resizeMeta rewrites dimensions without touching the payload column") {
    val resized = Multimodal.resizeMeta(media, 224, 224)
    val r = resized.select($"meta.width", $"meta.height", $"meta.codec").distinct().collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getString(2))).toSet === Set((224, 224, "fake")))
    // column pruning: the scan must not read `payload` (the cached
    // relation below it still lists all columns — that's its
    // materialization plan, not what this query reads)
    val scanLine = resized.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("InMemoryTableScan")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("payload"), scanLine)
  }

  test("parquet round-trip: metadata-only queries never read the payload column from storage") {
    val dir = java.nio.file.Files.createTempDirectory("media_pq").toString + "/media"
    Multimodal.synthetic(spark, 60).write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val metaOnly = Multimodal.resizeMeta(fromDisk, 128, 128)
    metaOnly.collect()
    val plan = metaOnly.queryExecution.executedPlan.toString
    val read = """ReadSchema: struct<([^>]*)>""".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined, plan.take(800))
    // the 100 TB claim: a metadata transform must not scan media bytes
    assert(!read.get.contains("payload"), s"payload read from storage: ${read.get}")
  }

  test("ImageIoDecoder: real PNG decode via javax.imageio — histogram semantics, determinism, corrupt tolerance") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val black = png(8, 8)((_, _) => 0x000000)
    val white = png(8, 8)((_, _) => 0xffffff)
    val half = png(8, 8)((x, _) => if (x < 4) 0x000000 else 0xffffff)
    val dim = 16
    val Seq(fb, fw, fh) =
      Multimodal.ImageIoDecoder.decodeBatch(Seq(black, white, half), dim).map(_.get)
    // all-black -> all mass in bin 0; all-white -> all mass in the top bin
    assert(fb(0) === 1.0f && fb.sum === 1.0f)
    assert(fw(dim - 1) === 1.0f && fw.sum === 1.0f)
    // half/half -> 0.5 in each extreme bin
    assert(fh(0) === 0.5f && fh(dim - 1) === 0.5f)
    // PNG is lossless and the luma/binning is integer math: bit-deterministic
    val again = Multimodal.ImageIoDecoder.decodeBatch(Seq(half), dim).head.get
    assert(again.toSeq === fh.toSeq)
    // corrupt members decode to None, never throw
    val junk = Seq(Array[Byte](1, 2, 3), white.take(10), Array.emptyByteArray, null)
    assert(Multimodal.ImageIoDecoder.decodeBatch(junk, dim).forall(_.isEmpty))
  }

  test("ImageIoDecoder: end-to-end through extractFeatures — real decode feeds the pipeline") {
    import java.awt.image.BufferedImage
    def greyPng(level: Int): Array[Byte] = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = (0 until 12).map(i => (i.toLong, "image", greyPng(i * 20)))
    val df = rows.toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(df, dim = 8, batchSize = 5,
        decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out.size === 12)
    // each uniform grey image puts all mass in exactly one bin, and the
    // hot bin index is monotone in the grey level
    val hot = (0 until 12).map { i =>
      val f = out(i.toLong)
      assert(f.sum === 1.0f && f.count(_ > 0f) === 1)
      f.indexWhere(_ > 0f)
    }
    assert(hot === hot.sorted, s"bin index must be monotone in luminance: $hot")
  }

  private def wav(samples: Array[Short], sampleRate: Float = 16000f,
      bigEndian: Boolean = false): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, bigEndian)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toInt
      if (bigEndian) { bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = s.toByte }
      else { bytes(2 * i) = s.toByte; bytes(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavDecoder: real WAV decode via javax.sound.sampled — histogram semantics, determinism, corrupt tolerance") {
    val dim = 16
    // silence: every sample 0 → all mass in the middle bin (32768*16/65536 = 8)
    val silence = wav(Array.fill[Short](256)(0))
    // full-scale square wave: half min, half max → extreme bins
    val square = wav(Array.tabulate[Short](256)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue))
    val Seq(fs, fq) = Multimodal.WavDecoder.decodeBatch(Seq(silence, square), dim).map(_.get)
    assert(fs(dim / 2) === 1.0f && fs.sum === 1.0f, fs.toSeq)
    assert(fq(0) === 0.5f && fq(dim - 1) === 0.5f, fq.toSeq)
    // WAV is lossless PCM and the binning is integer math: bit-deterministic
    val again = Multimodal.WavDecoder.decodeBatch(Seq(square), dim).head.get
    assert(again.toSeq === fq.toSeq)
    // corrupt / non-audio members decode to None, never throw
    val junk = Seq(Array[Byte](82, 73, 70, 70), square.take(16), Array.emptyByteArray, null)
    assert(Multimodal.WavDecoder.decodeBatch(junk, dim).forall(_.isEmpty))
  }

  test("WavDecoder: endianness of the container does not change the histogram") {
    val samples = Array.tabulate[Short](300)(i => ((i * 2311 + 17) % 65536 - 32768).toShort)
    val le = Multimodal.WavDecoder.decodeBatch(Seq(wav(samples, bigEndian = false)), 8).head
    // AIFF is the JDK's big-endian container
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, true)
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(2 * i) = (samples(i) >> 8).toByte; bytes(2 * i + 1) = samples(i).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val be = Multimodal.WavDecoder.decodeBatch(Seq(bos.toByteArray), 8).head
    assert(le.isDefined && be.isDefined)
    assert(le.get.toSeq === be.get.toSeq)
  }

  test("WavDecoder: end-to-end through extractFeatures") {
    val rows = (0 until 10).map { i =>
      val amp = (i * 3000).toShort
      (i.toLong, "audio", wav(Array.fill[Short](128)(amp)))
    }
    val df = rows.toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(df, dim = 32, batchSize = 4,
        decoder = Multimodal.WavDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out.size === 10)
    // each constant-amplitude clip lands in exactly one bin, monotone in amplitude
    val hot = (0 until 10).map { i =>
      val f = out(i.toLong)
      assert(f.sum === 1.0f && f.count(_ > 0f) === 1)
      f.indexWhere(_ > 0f)
    }
    assert(hot === hot.sorted, s"bin index must be monotone in amplitude: $hot")
  }

  test("end-to-end: decode features then embedding near-dup + ANN over them") {
    // media -> batched decode -> features feed the engine's similarity
    // operators directly: the multimodal column is a first-class citizen
    // of the dedup/ANN pipeline, not a dead end
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .filter($"features".isNotNull)
      .select($"media_id", $"features".cast("array<double>").as("vec"))
    // planted duplicate: same payload bytes => identical features
    val dup = Multimodal.synthetic(spark, 1)
      .select(($"media_id" + 100000L).as("media_id"), $"kind",
        $"payload", $"meta")
    val dupFeats = Multimodal.extractFeatures(dup, dim = 16)
      .select($"media_id", $"features".cast("array<double>").as("vec"))
    val all = feats.unionAll(dupFeats)
    val pairs = graft.operators.Dedup.cosinePairsLsh(all, "media_id", "vec",
        minCosineMicro = 999999L, dim = 16, planes = 8, tables = 2)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100000L),
      s"identical media must surface as a near-dup pair: ${pairs.mkString(", ")}")
    val ann = graft.operators.SimilaritySearch.ivfTopK(
      dupFeats, feats, k = 1, "media_id", "media_id", "vec", "vec",
      centroids = 4, probes = 4)
      .select("query_id", "neighbor_id", "dist").as[(Long, Long, Double)].collect()
    assert(ann.length === 1 && ann.head._2 === 0L && ann.head._3 === 0.0,
      s"full-probe IVF must retrieve the identical twin: ${ann.mkString(", ")}")
  }

  /** Animated GIF built with the JDK's own GIF writer: one IIOImage per
    * frame through `prepareWriteSequence`/`writeToSequence`. */
  private def animatedGif(levels: Seq[Int], w: Int = 8, h: Int = 8): Array[Byte] = {
    import java.awt.image.BufferedImage
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    levels.foreach { level =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); out.close()
    bos.toByteArray
  }

  test("GifDemuxer: real multi-frame GIF demux — stride sampling, per-frame histograms, corrupt tolerance") {
    val dim = 16
    // 5 frames at luma 0,64,128,192,255; stride 2 samples frames 0,2,4
    val gif = animatedGif(Seq(0, 64, 128, 192, 255))
    val frames = Multimodal.GifDemuxer.demux(gif, stride = 2, dim = dim)
    assert(frames.map(_._1) === Seq(0, 2, 4))
    assert(frames.forall { case (_, w, h, _) => w === 8 && h === 8 })
    // each frame is a flat grey: all histogram mass in one bin, monotone
    // in the frame's brightness (GIF palette quantization may shift the
    // level slightly, never the ordering)
    val bins = frames.map { case (_, _, _, f) =>
      assert(f.sum === 1.0f && f.count(_ > 0f) === 1)
      f.indexWhere(_ > 0f)
    }
    assert(bins === bins.sorted && bins.distinct.length === bins.length,
      s"frame bins must rise with brightness: $bins")
    // determinism across calls (retry/speculation contract)
    assert(Multimodal.GifDemuxer.demux(gif, 2, dim).map(_._4.toSeq) ===
      frames.map(_._4.toSeq))
    // total: corrupt / truncated / empty / null / non-GIF all yield empty
    assert(Multimodal.GifDemuxer.demux(Array[Byte](1, 2, 3), 1, dim).isEmpty)
    assert(Multimodal.GifDemuxer.demux(gif.take(20), 1, dim).isEmpty)
    assert(Multimodal.GifDemuxer.demux(Array.emptyByteArray, 1, dim).isEmpty)
    assert(Multimodal.GifDemuxer.demux(null, 1, dim).isEmpty)
  }

  test("sampleFramesDecoded: end-to-end real GIF frame rows, payload never shuffled") {
    val gif3 = animatedGif(Seq(0, 128, 255))
    val gif1 = animatedGif(Seq(255))
    val rows = Seq(
      (1L, "video", gif3),
      (2L, "video", gif1),
      (3L, "video", Array[Byte](9, 9, 9)), // corrupt member: contributes 0 rows
      (4L, "image", gif3)) // wrong kind: filtered out
    val df = spark.createDataFrame(rows).toDF("media_id", "kind", "payload")
    val out = Multimodal.sampleFramesDecoded(df, stride = 1, dim = 16)
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.toSeq === Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame demux must not shuffle payloads:\n$plan")
  }

  test("audioEnergyFrames: exact integer mean-square per window over real PCM") {
    import spark.implicits._
    // 8 samples in 4 windows of 2: silence, then constant amplitude 100,
    // then constant 1000, then a -200/200 pair (sign dies in the square)
    val samples = Array[Short](0, 0, 100, 100, 1000, 1000, -200, 200)
    val silence = Array.fill[Short](64)(0)
    val media = Seq(
      (1L, "audio", wav(samples)),
      (2L, "audio", wav(silence)),
      (3L, "video", wav(samples)),          // wrong kind: filtered out
      (4L, "audio", Array[Byte](1, 2, 3))) // corrupt: vanishes
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.audioEnergyFrames(media, nFrames = 4)
    val rows = out.select("media_id", "frame_idx", "n_samples", "energy_ms")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val m1 = rows.filter(_._1 == 1L).map(r => (r._2, r._3, r._4))
    assert(m1.toSeq === Seq(
      (0, 2L, 0L), (1, 2L, 10000L), (2, 2L, 1000000L), (3, 2L, 40000L)))
    val m2 = rows.filter(_._1 == 2L)
    assert(m2.length === 4 && m2.forall(r => r._3 == 16L && r._4 == 0L))
    assert(!rows.exists(r => r._1 == 3L || r._1 == 4L))
    // determinism + no payload shuffle
    val again = Multimodal.audioEnergyFrames(media, nFrames = 4)
      .select("media_id", "frame_idx", "n_samples", "energy_ms")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq === rows.toSeq)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"energy framing must not shuffle payloads:\n$plan")
  }

  test("audioEnergyFrames: fewer samples than frames emits only non-empty windows") {
    import spark.implicits._
    val media = Seq((9L, "audio", wav(Array[Short](32767, 32767))))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.audioEnergyFrames(media, nFrames = 8)
      .select("frame_idx", "n_samples", "energy_ms")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // 2 samples over 8 windows: exactly 2 singleton windows, rest empty
    assert(rows.length === 2)
    assert(rows.forall(r => r._2 == 1L && r._3 == 32767L * 32767L))
  }
}
