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
