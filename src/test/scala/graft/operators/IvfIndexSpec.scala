package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the persisted-index contract: [[SimilaritySearch.ivfTopKFromIndex]]
  * over a [[SimilaritySearch.buildIvfIndex]] artifact is bit-equal to the
  * inline [[SimilaritySearch.ivfTopK]] at the same parameters, and the
  * artifact's assigned relation is cell-partitioned (the pruning lever).
  */
class IvfIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("index round-trip is bit-equal to the inline IVF path") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val it = emb.filter(col("vec_id") % 10 =!= 0)
    val inline = SimilaritySearch.ivfTopK(q, it, k = 5,
        "vec_id", "vec_id", "embedding", "embedding",
        centroids = 16, probes = 4, assignments = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_roundtrip" // fixed: overwritten per run, no leak
    SimilaritySearch.buildIvfIndex(it, "vec_id", "embedding",
      centroids = 16, assignments = 2, path)
    val fromIndex = SimilaritySearch.ivfTopKFromIndex(q, path, k = 5,
        "vec_id", "embedding", probes = 4)
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex === inline)
  }

  test("int8 arm: same cell pruning as the float arm, near-exact ranking, byte cells + stamp on disk") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val it = emb.filter(col("vec_id") % 10 =!= 0)
    val pF = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_i8_float"
    val p8 = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_i8"
    SimilaritySearch.buildIvfIndex(it, "vec_id", "embedding",
      centroids = 16, assignments = 2, pF)
    SimilaritySearch.buildIvfIndexInt8(it, "vec_id", "embedding",
      centroids = 16, assignments = 2, p8)
    // byte cells on disk: i_q is array<tinyint>, no float vector stored
    val assigned = spark.read.parquet(s"$p8/assigned")
    assert(assigned.schema("i_q").dataType.sql == "ARRAY<TINYINT>")
    assert(!assigned.columns.contains("i_vec"))
    // quantization contract: |q| <= 127 and the round-trip error per
    // coordinate is at most half a step
    val absMax = spark.read.parquet(s"$p8/scale").collect().head.getDouble(0)
    val step = absMax / 127.0
    val worst = assigned.select(explode(col("i_q")).as("b"))
      .agg(max(abs(col("b")))).collect().head.getByte(0)
    assert(worst <= 127)
    // the stamp exists and is the same census instrument (the corpus
    // is healthy, so it must read fit)
    val stamp = spark.read.parquet(s"$p8/resolution").collect().head
    assert(stamp.getAs[String]("decision") == "fit", stamp)
    // ranking parity at the top: the float arm's top-1 per query is
    // the int8 arm's top-1 whenever the runner-up gap exceeds the
    // quantization error bound (4·dim·step·absMax is a loose bound;
    // on this corpus every top-1 gap clears it, so top-1 sets match)
    val f1 = SimilaritySearch.ivfTopKFromIndex(q, pF, k = 1,
        "vec_id", "embedding", probes = 16)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val i1 = SimilaritySearch.ivfTopKFromIndexInt8(q, p8, k = 1,
        "vec_id", "embedding", probes = 16)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = f1.intersect(i1).size.toDouble / f1.size
    assert(agree >= 0.9, s"top-1 agreement $agree (${f1.size} queries)")
    // dequantized distances are in corpus units: int8 top-1 distance
    // within (2·sqrt(d_real)·dim·step + dim·step^2)-ish of the float
    // arm's — just sanity-bound the scale here
    val d8 = SimilaritySearch.ivfTopKFromIndexInt8(q, p8, k = 1,
        "vec_id", "embedding", probes = 16)
      .agg(max(col("dist"))).collect().head.getDouble(0)
    val dF = SimilaritySearch.ivfTopKFromIndex(q, pF, k = 1,
        "vec_id", "embedding", probes = 16)
      .agg(max(col("dist"))).collect().head.getDouble(0)
    assert(d8 >= 0.0 && math.abs(d8 - dF) <= dF + 64 * step * step * 64,
      s"d8=$d8 dF=$dF step=$step")
  }

  test("int8 arm: a corpus collapsed below the int8 step stamps bit_budget at ITS representation") {
    import spark.implicits._
    val dim = 8
    // 40 identical vectors + a far spread cloud: identical rows
    // quantize onto ONE byte tuple in their cell — the census must
    // flag at this rung too (the dispatch's "int8 can't rank it
    // either" signal)
    val ball = Seq.fill(dim)(100.0f)
    val rows = (1L to 40L).map(id => (id, ball)) ++
      (41L to 60L).map(id => (id,
        (0 until dim).map(j => ((id * 31 + j * 7) % 97) / 10.0f)))
    val p = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_i8_ball"
    SimilaritySearch.buildIvfIndexInt8(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", centroids = 2, assignments = 1, p)
    val stamp = spark.read.parquet(s"$p/resolution").collect().head
    assert(stamp.getAs[String]("decision") == "bit_budget", stamp)
    assert(stamp.getAs[Long]("n_cells_flagged") >= 1L, stamp)
  }

  test("the assigned relation is partitioned by cell id on disk") {
    val emb = Tables.load(spark, sf, "embeddings")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_partitions"
    SimilaritySearch.buildIvfIndex(
      emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
      centroids = 8, assignments = 1, path)
    val dirs = new java.io.File(s"$path/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("c_id="))
    assert(dirs.length >= 2 && dirs.length <= 8, dirs.mkString(","))
    // codebook artifact holds exactly the requested centroids
    assert(spark.read.parquet(s"$path/codebook").count() === 8L)
  }
}
