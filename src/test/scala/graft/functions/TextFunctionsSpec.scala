package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._
  import org.apache.spark.sql.Column

  private def one[T](c: Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().getAs[T](0)
  }

  test("tokens: trims and splits on whitespace runs") {
    assert(one[Seq[String]](tokens(lit("  a  bc\td "))) === Seq("a", "bc", "d"))
  }

  test("normalizeText: lowercase, punctuation runs to one space, trimmed") {
    assert(one[String](normalizeText(lit("  Hello,   WORLD!! 42...  ")))
      === "hello world 42")
    assert(one[String](normalizeText(lit("***"))) === "")
    assert(one[String](normalizeText(lit("already clean"))) === "already clean")
  }

  test("counts: tokens, distinct, chars, bpe") {
    val t = lit("the cat the hat is #1")
    assert(one[Long](tokenCount(t)) === 6L)
    assert(one[Long](distinctTokenCount(t)) === 5L)
    assert(one[Long](charCount(t)) === 21L)
    // bpe: the,cat,the,hat,is,#,1 = 7
    assert(one[Long](bpeTokenCount(t)) === 7L)
  }

  test("quality score: integer-exact formula") {
    // 4 tokens, 2 stopwords: 5*4 + floor(500*2/4) = 20 + 250 = 270
    assert(one[Long](qualityScore(lit("the cat a hat"))) === 270L)
  }

  test("langId: marker argmax, ties toward smaller code, zero hits → und") {
    assert(one[String](langId(lit("the cat is happy"))) === "en")
    assert(one[String](langId(lit("el gato es feliz y no duerme"))) === "es")
    assert(one[String](langId(lit("xyzzy plugh"))) === "und")
    // 'la de' hits both es and fr markers equally → smaller code (es) wins
    assert(one[String](langId(lit("la de"))) === "es")
  }

  test("fingerprint: deterministic, order-sensitive, in [0, P)") {
    val f1 = one[Long](fingerprint(lit("a b c")))
    val f2 = one[Long](fingerprint(lit("c b a")))
    assert(f1 !== f2)
    assert(f1 === one[Long](fingerprint(lit("a b c"))))
    assert(f1 >= 0 && f1 < P)
  }

  test("shingles: sliding word n-grams; short docs shingle whole") {
    assert(one[Seq[String]](shingles(lit("a b c d"), 3)) === Seq("a b c", "b c d"))
    assert(one[Seq[String]](shingles(lit("a b"), 3)) === Seq("a b"))
    assert(one[Seq[Long]](shingleHashes(lit("a b c d"), 2)).size === 3)
  }

  test("shingleHashes: fused rolling-hash expr bit-equals the string-building HOF twin") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 3, 4)) {
      val mismatches = docs.select(
          shingleHashes(org.apache.spark.sql.functions.col("text"), n).as("fused"),
          shingleHashesHof(org.apache.spark.sql.functions.col("text"), n).as("hof"))
        .filter(org.apache.spark.sql.functions.col("fused") =!=
          org.apache.spark.sql.functions.col("hof"))
        .count()
      assert(mismatches === 0L, s"n=$n fused != HOF")
    }
    // edges: empty text, 1 token, exactly n tokens, internal multi-space
    def longs(c: Column): Seq[Long] = {
      import spark.implicits._
      Seq(1).toDF("x").select(c.as("v")).head().getSeq[Long](0).toList
    }
    for (s <- Seq("", "solo", "a b c", "x  y", "one two three four five")) {
      assert(longs(shingleHashes(lit(s), 3)) ===
        longs(shingleHashesHof(lit(s), 3)), s"'$s'")
    }
  }

  test("ShingleHashExpr: generated adversarial token arrays equal the HOF path") {
    import spark.implicits._
    // empty tokens, unicode (BMP), single chars, long runs — one batch,
    // both paths, bit equality; HOF twin needs TEXT, so compare against
    // tokenHashArray over the string-built windows directly
    val rnd = new scala.util.Random(7)
    val alphabet = "ab φλ9".toCharArray
    def tok(): String =
      (0 until rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = Seq.fill(300)((0 until (1 + rnd.nextInt(9))).map(_ => tok()))
    for (n <- Seq(1, 2, 4)) {
      val got = rows.toDF("toks")
        .select(ShingleHashExpr($"toks", n).as("fused"),
          tokenHashArray(
            when(size($"toks") <= n, array(array_join($"toks", " ")))
              .otherwise(org.apache.spark.sql.functions.transform(
                sequence(lit(0), size($"toks") - n),
                i => array_join(slice($"toks", i + 1, lit(n)), " ")))).as("hof"))
        .as[(Seq[Long], Seq[Long])].collect()
      assert(got.forall { case (f, h) => f == h }, s"n=$n mismatch")
    }
  }

  test("ShingleHashExpr: null tokens skip like array_join (token and separator)") {
    def longs(c: Column): Seq[Long] = {
      import spark.implicits._
      Seq(1).toDF("x").select(c.as("v")).head().getSeq[Long](0).toList
    }
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"))
    // windows: ["a", null] → "a"; [null, "b"] → "b"
    assert(longs(ShingleHashExpr(arr, 2)) ===
      Seq(PolyHashArrayExpr.hash("a"), PolyHashArrayExpr.hash("b")))
    assert(longs(ShingleHashExpr(arr, 5)) === Seq(PolyHashArrayExpr.hash("a b")))
  }

  test("redact: scrubs emails, URLs, IPs, digit runs; order shields URL innards") {
    def r(s: String, ps: Seq[String]): String =
      one[String](redact(lit(s), ps, "<X>"))
    assert(r("mail bob.smith+x@corp.example.com now", Seq(EmailRe)) ===
      "mail <X> now")
    assert(r("see https://a.example.com/p?q=1 ok", Seq(UrlRe)) === "see <X> ok")
    assert(r("host 10.0.255.1 up", Seq(Ipv4Re)) === "host <X> up")
    assert(r("card 4111222233334444!", Seq(DigitRunRe)) === "card <X>!")
    // URL first: its digits vanish inside ONE token instead of leaving
    // a half-masked URL behind
    assert(r("go https://ex.com/a/99 code 7",
      Seq(UrlRe, DigitRunRe)) === "go <X> code <X>")
    // untouched text passes through byte-identical
    assert(r("no pii here", Seq(EmailRe, UrlRe, DigitRunRe)) === "no pii here")
  }

  test("matchCount: non-overlapping left-to-right matches") {
    assert(one[Long](matchCount(lit("a1b22c333"), DigitRunRe)) === 3L)
    assert(one[Long](matchCount(lit("no digits"), DigitRunRe)) === 0L)
    assert(one[Long](matchCount(lit("x@y.com and z@w.org"), EmailRe)) === 2L)
  }
}
