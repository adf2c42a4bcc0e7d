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
  * The decode step itself is STUBBED — this container ships no
  * image/audio codecs — behind [[Decoder]]: `FakeDecoder` is a
  * deterministic stand-in (payload bytes → pseudo-features) so the
  * Spark-side contract (schema, batching, partitioning, null
  * discipline) is fully real and tested; swapping in a JNI/FFM codec
  * is a one-class change.
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

  /** Deterministic frame sampling for video payloads: every `stride`-th
    * fixed-size chunk becomes a frame row (media_id, frame_idx,
    * frame binary). The chunking is the STUB — a real demuxer yields
    * codec frames — but the explode shape (one row per sampled frame,
    * payload never shuffled before sampling) is the production shape.
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
