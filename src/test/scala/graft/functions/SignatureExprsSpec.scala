package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, SimilaritySearch}

/** Bit-equality of the native fused signature expressions against their
  * declarative HOF twins — the HOF formulation IS the spec; the native
  * expression exists only because the HOF stack is interpreted
  * (CodegenFallback) and dominated the dedup/ANN bench.
  *
  * Checked over the real corpus (documents/embeddings at sf0.001) so
  * the comparison covers the value distributions the oracle gate hashes,
  * plus adversarial edges (empty arrays, nulls).
  */
class SignatureExprsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // the HOF→native optimizer rule must NOT be active here: these specs
  // exist to execute the declarative formulation as written and compare
  // it against the native expression — with the rule installed (by any
  // earlier suite touching GraftExtensions.register) the hyperplane
  // twin would silently compare the native expression to itself
  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.NativeRewrite.uninstall(spark)
  }

  test("MinHash signature: native == HOF over the whole corpus") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", Dedup.shingleSet($"text", 3).as("sh"))
    val both = docs.select(
      $"doc_id",
      Dedup.minHashSignatureFromHashes($"sh", 24).as("nat"),
      Dedup.minHashSignatureFromHashesHof($"sh", 24).as("hof"))
    val diff = both.filter(not($"nat" <=> $"hof")).count()
    assert(diff === 0)
    // and not degenerate: signatures differ across documents
    assert(both.select($"nat").distinct().count() > 100)
  }

  test("MinHash signature: empty and null arrays") {
    val df = Seq(
      (1L, Seq[Long](5, 9, 123456789L)),
      (2L, Seq.empty[Long])).toDF("id", "sh")
      .unionByName(Seq((3L, null.asInstanceOf[Seq[Long]])).toDF("id", "sh"))
    val rows = df.select($"id", Dedup.minHashSignatureFromHashes($"sh", 4).as("sig"))
      .orderBy($"id").collect()
    // non-empty: slot 0 = min of s*1 % P = 5
    assert(rows(0).getSeq[Long](1).head === 5L)
    // empty array -> all-null slots (array_min of empty is null)
    assert(rows(1).getSeq[Any](1).forall(_ == null))
    // null array -> null signature
    assert(rows(2).isNullAt(1))
  }

  test("SimHash: native == HOF over the whole corpus") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id",
        graft.functions.TextFunctions.tokenHashArray(
          graft.functions.TextFunctions.tokens($"text")).as("th"))
    val both = docs.select(
      $"doc_id",
      Dedup.simHashFromHashes($"th", 32).as("nat"),
      Dedup.simHashFromHashesHof($"th", 32).as("hof"))
    assert(both.filter(not($"nat" <=> $"hof")).count() === 0)
    assert(both.select($"nat").distinct().count() > 100)
  }

  test("SimHash: empty array is 0; single hash reproduces its bits") {
    val df = Seq(
      (1L, Seq[Long](0x5AL)),
      (2L, Seq.empty[Long])).toDF("id", "th")
    val rows = df.select($"id", Dedup.simHashFromHashes($"th", 8).as("sh"))
      .orderBy($"id").collect()
    assert(rows(0).getLong(1) === 0x5AL)
    assert(rows(1).getLong(1) === 0L)
  }

  test("hyperplane signature: native == HOF over embeddings, all 4 table offsets") {
    val emb = Tables.load(spark, sf, "embeddings")
    (0 until 4).foreach { tbl =>
      val both = emb.select(
        $"vec_id",
        SimilaritySearch.hyperplaneSignature($"embedding", 6, 64, tbl * 6).as("nat"),
        SimilaritySearch.hyperplaneSignatureHof($"embedding", 6, 64, tbl * 6).as("hof"))
      assert(both.filter(not($"nat" <=> $"hof")).count() === 0, s"table $tbl")
    }
  }

  test("hyperplane signature: buckets are non-degenerate") {
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.select(SimilaritySearch.hyperplaneSignature($"embedding", 8, 64).as("s"))
      .distinct().count()
    // 8 planes -> up to 256 buckets; a degenerate plane set collapses to a few
    assert(n > 16, s"only $n distinct buckets")
  }

  test("quantized projection: native == HOF over embeddings and over long vectors") {
    val emb = Tables.load(spark, sf, "embeddings")
    (0 until 3).foreach { tbl =>
      val both = emb.select(
        $"vec_id",
        graft.functions.SignatureExprs
          .quantizedProjection($"embedding", 4, 64, tbl * 4, 2L).as("nat"),
        graft.operators.TimeSeries
          .quantizedProjectionHof($"embedding", 4, 64, tbl * 4, 2L).as("hof"))
      assert(both.filter(not($"nat" <=> $"hof")).count() === 0, s"table $tbl")
    }
    // integer (array<long>) input — the PAA sketch shape
    val longs = Seq((1L, Seq(30L, 70L, -10L, 4L)), (2L, Seq(0L, 0L, 0L, 0L)))
      .toDF("id", "vec")
    val both = longs.select(
      graft.functions.SignatureExprs
        .quantizedProjection($"vec", 4, 4, 8, 7L).as("nat"),
      graft.operators.TimeSeries
        .quantizedProjectionHof($"vec", 4, 4, 8, 7L).as("hof"))
    assert(both.filter(not($"nat" <=> $"hof")).count() === 0)
  }

  test("quantized projection: cells move with the grid width and are non-degenerate") {
    // integer-scale vectors (the PAA shape: projections span many width
    // units) — a fine grid must resolve many more cells than a coarse one
    val emb = Tables.load(spark, sf, "embeddings")
      .select(transform($"embedding", x => x * 1000.0).as("v"))
    val coarse = emb.select(graft.functions.SignatureExprs
      .quantizedProjection($"v", 4, 64, 0, 100000L).as("c"))
      .distinct().count()
    val fine = emb.select(graft.functions.SignatureExprs
      .quantizedProjection($"v", 4, 64, 0, 100L).as("c"))
      .distinct().count()
    assert(fine > coarse, s"fine=$fine coarse=$coarse")
    assert(fine > 16, s"only $fine distinct cells at width 100")
  }

  test("SQL surface: minhash_signature / simhash / hyperplane_signature registered") {
    graft.GraftExtensions.register(spark)
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT simhash(poly_hash_array(split(trim(text), '\\s+')), 32) AS sh,
                minhash_signature(poly_hash_array(split(trim(text), '\\s+')), 8) AS mh
         FROM documents LIMIT 5""").collect()
    assert(r.length === 5)
    assert(r.forall(row => row.getSeq[Long](1).length == 8))
    val h = spark.sql(
      "SELECT hyperplane_signature(embedding, 6, 64, 0) AS s FROM embeddings LIMIT 5")
      .collect()
    assert(h.forall(row => { val v = row.getLong(0); v >= 0 && v < 64 }))
  }

  test("native signatures run inside whole-stage codegen (not CodegenFallback)") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(SimilaritySearch.hyperplaneSignature($"embedding", 6, 64).as("s"))
    emb.collect() // finalize AQE before reading the executed plan
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(800)) // WholeStageCodegen span present
  }
}
