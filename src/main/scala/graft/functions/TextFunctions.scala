package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline — language ID,
  * quality scoring, token counting, document fingerprinting — as pure
  * Catalyst column expressions over a string column (no UDFs; every
  * function here is also expressible in ANSI-ish SQL for the DuckDB
  * oracle gate).
  *
  * The reference engine has no text surface at all (SURVEY §2.1); this is
  * part of the LLM-training-data extension set the north-star mandates.
  *
  * Portability rules (Spark ↔ DuckDB):
  *  - tokenization = regex split on `\s+` after trim;
  *  - hashes = polynomial rolling hashes in Long arithmetic mod
  *    [[TextFunctions.P]] (= 1e9+7, so `h*131 + 127 < 2^63` — no
  *    overflow in either engine);
  *  - ratio-derived scores go through `floor` (never `round`: quotients
  *    of small ints can land exactly on .5 where HALF_UP vs
  *    HALF_EVEN diverge across engines).
  */
object TextFunctions {

  /** Modulus for all rolling hashes (prime, < 2^30 so products stay in
    * Long range). */
  val P = 1000000007L

  /** Whitespace tokenization: trim + split on runs of whitespace. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Text normalization for training-data cleaning: lowercase, every
    * non-alphanumeric run collapsed to a single space, trimmed. Pure
    * column expression; the regex (`[^a-z0-9]+`, applied after
    * `lower`) evaluates identically under Java regex and RE2-style
    * engines, so oracles can replicate it.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** BPE-ish sub-word count: alpha runs, single digits, or single
    * non-alnum glyphs — the shape (not the vocab) of a byte-pair
    * tokenizer's pre-tokenization. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** English stopword seed set (fixed, tiny — a heuristic signal, not a
    * linguistics claim). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "is", "in", "to", "it", "that")

  /** The q144 blocklist terms — ONE definition shared by the
    * blocklist screen and every consumer that must treat these words
    * as fixed points (e.g. ScaleUp's generation renames preserve
    * per-doc blocklist density only if these never move). */
  val BlocklistTerms: Seq[String] = Seq("slow", "drop", "error")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("long")

  /** Quality score in [0, 1000], integer-exact across engines:
    * 5·min(tokens,100)  (length component, caps at 500)
    * + floor(500·stopwords/tokens)  (naturalness component).
    */
  def qualityScore(text: Column): Column = {
    val nt = tokenCount(text)
    val stop = stopwordCount(text)
    (least(nt, lit(100L)) * 5 +
      floor(stop * lit(500.0) / nt).cast("long")).as("quality")
  }

  /** Marker-word sets for the n-gram-free language-ID heuristic. Keys are
    * ISO codes; deterministic argmax with ties toward the smaller code,
    * zero hits → "und". */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "not"),
    "es" -> Seq("el", "la", "de", "y", "es", "no"),
    "fr" -> Seq("le", "la", "de", "et", "est", "pas"))

  /** Heuristic language ID from marker-word hit counts. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val cnt: Map[String, Column] = LangMarkers.map { case (code, words) =>
      code -> size(filter(toks, t => t.isin(words: _*))).cast("long")
    }.toMap
    val codes = LangMarkers.map(_._1) // lexicographic already
    val best = codes.map(cnt).reduce((a, b) => greatest(a, b))
    // first (lexicographically smallest) code reaching the max wins
    codes.foldRight(lit("und")) { case (code, rest) =>
      when(best > 0 && cnt(code) === best, lit(code)).otherwise(rest)
    }
  }

  /** k-gram rolling polynomial hashes over an `array<long>` hash
    * column: element j is the fold of `h[j..j+k-1]` under
    * `acc ← (acc·131 + hᵢ) mod P` — the shared k-gram convention of
    * [[graft.operators.Cdc.chunksHof]] and [[graft.operators.Winnow]]
    * (and the window predicate inside the native
    * [[CdcChunksExpr]]), built from k−1 shifted-slice zip_withs. */
  def kgramRollingHashes(h: Column, k: Int): Column = {
    require(k >= 2, "k must be >= 2")
    val glen = size(h) - (k - 1)
    (2 to k).foldLeft(slice(h, lit(1), glen)) { (acc, i) =>
      zip_with(acc, slice(h, lit(i), glen), (a, b) => (a * 131L + b) % P)
    }
  }

  /** Polynomial hash of one token: fold over characters,
    * `h ← (h·131 + ascii(c)) mod P`, h₀ = 0. Interpreted HOF — for
    * array-at-a-time hashing use [[tokenHashArray]] (native codegen,
    * same result). */
  def tokenHash(token: Column): Column =
    aggregate(
      split(token, ""),
      lit(0L),
      (h, c) => (h * 131L + ascii(c).cast("long")) % P)

  /** `array<string> → array<long>`: [[tokenHash]] of every element in
    * one fused codegen loop ([[PolyHashArrayExpr]]). */
  def tokenHashArray(arr: Column): Column = PolyHashArrayExpr(arr)

  /** Document fingerprint: rolling hash over token hashes,
    * `f ← (f·31 + tokenHash) mod P` — order-sensitive, so
    * permuted documents get distinct fingerprints (unlike a set hash). */
  def fingerprint(text: Column): Column =
    aggregate(
      tokenHashArray(tokens(text)),
      lit(0L),
      (f, h) => (f * 31L + h) % P)

  /** Word n-gram shingles as strings ("tok1 tok2 … tokN"), for
    * Jaccard/MinHash dedup. Documents shorter than n shingle to their
    * whole token sequence. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks)
    when(m <= n, array(array_join(toks, " ")))
      .otherwise(
        transform(
          sequence(lit(0), m - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Hashed shingles: [[tokenHash]]-style polynomial hash of every
    * word n-gram (over its characters, the joining spaces included) —
    * ONE fused codegen pass via [[ShingleHashExpr]]: per-token hashes
    * and length-powers precomputed once, each window combined in O(n)
    * modular multiplications, no shingle string ever materialized
    * (the string-building declarative path, kept below as
    * [[shingleHashesHof]], was the measured dominant cost of the
    * Jaccard dedup family). Bit-equality of the two paths is
    * spec-enforced. */
  def shingleHashes(text: Column, n: Int): Column =
    ShingleHashExpr(tokens(text), n)

  /** Declarative twin of [[shingleHashes]] — materializes the shingle
    * strings ([[shingles]]) and hashes them ([[tokenHashArray]]). The
    * executable spec of the fused expression. */
  private[graft] def shingleHashesHof(text: Column, n: Int): Column =
    tokenHashArray(shingles(text, n))

  // --- PII / pattern scrubbing -----------------------------------------

  /** Scrub patterns, engine-portable subset: character classes,
    * alternation, bounded/unbounded repetition only — no lookaround,
    * no backreferences — so Java regex (Spark codegen) and RE2-family
    * engines (DuckDB, Go, Rust) agree match-for-match. Order matters
    * when composed: URLs before bare digit runs, emails before bare
    * domains. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val DigitRunRe = "[0-9]+"

  /** Redact every match of each pattern (applied in order) with
    * `token`. Pure per-row projection — composes under the scan with
    * filters and stays inside whole-stage codegen; at 100 TB scrubbing
    * is a map-only pass, exactly this. */
  def redact(text: Column, patterns: Seq[String], token: String): Column =
    patterns.foldLeft(text)((c, p) => regexp_replace(c, p, token))

  /** Count of non-overlapping matches (left-to-right, the shared
    * regex-engine convention) — the audit column next to [[redact]]:
    * how much was scrubbed, per row. */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")
}
