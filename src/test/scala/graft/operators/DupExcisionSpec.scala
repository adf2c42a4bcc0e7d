package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[Dedup.dupPassageExcision]] on hand-built fixtures: ownership
  * (lowest doc id keeps its text), exact cut extents, overlap
  * merging, the short-doc single-window case, and the full-coverage
  * exact-dup case — each kept text asserted character-for-character
  * against the cursor-fold semantics computed by hand.
  */
class DupExcisionSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def rs(n: Int): String =
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  // 128 = 64 + 2·32: stride-32 windows at 1/33/65 cover every char,
  // so an exact dup is excised to the empty string (no tail residue)
  private val t0 = rs(128)
  private val t2 = rs(150)
  private val x32 = rs(32)
  private val tail40 = rs(40)
  // t0's first window copied at an aligned offset (start 33)
  private val t3 = x32 + t0.substring(0, 64) + tail40
  // t0's first TWO windows ([1,64] and [33,96]) — overlapping cuts
  private val t4tail = rs(50)
  private val t4 = t0.substring(0, 96) + t4tail
  private val t5 = rs(20) // shorter than one window

  private lazy val docs: DataFrame = Seq(
    (0L, t0), (1L, t0), (2L, t2), (3L, t3), (4L, t4), (5L, t5), (6L, t5)
  ).toDF("doc_id", "text")

  private lazy val kept: Map[Long, String] =
    Dedup.dupPassageExcision(docs, "doc_id", "text")
      .select($"doc_id", $"kept_text").as[(Long, String)].collect().toMap

  test("owner keeps its text; exact dup is fully excised") {
    assert(kept(0L) === t0, "fingerprint owner must be untouched")
    assert(kept(1L) === "", "exact dup with full window coverage must vanish")
  }

  test("doc with no shared windows is unchanged") {
    assert(kept(2L) === t2)
  }

  test("single aligned copied window is cut exactly, splice in offset order") {
    // cut [33, 96] → keep prefix [1,32] ++ suffix [97,136]
    assert(kept(3L) === x32 + tail40)
  }

  test("overlapping cuts merge via the cursor (windows [1,64] and [33,96])") {
    assert(kept(4L) === t4tail)
  }

  test("sub-window doc: whole text is the window; later copy vanishes") {
    assert(kept(5L) === t5)
    assert(kept(6L) === "")
  }

  test("orig_chars is the pre-excision length for every doc") {
    val lens = Dedup.dupPassageExcision(docs, "doc_id", "text")
      .select($"doc_id", $"orig_chars").as[(Long, Long)].collect().toMap
    assert(lens === Map(0L -> 128L, 1L -> 128L, 2L -> 150L, 3L -> 136L,
      4L -> 146L, 5L -> 20L, 6L -> 20L))
  }

  test("spliceOut is idempotent on already-clean docs (empty cut list)") {
    import org.apache.spark.sql.functions._
    val out = docs.select($"doc_id",
      Dedup.spliceOut($"text", array().cast("array<long>"),
        length($"text").cast("long"), 64).as("k"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) === t0 && out(5L) === t5)
  }
}
