package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The artifact publish/ensure contract (q152/q155/q146 substrate):
  * stable full-string path keys, torn-read-free publish, build-once
  * memoization, and multi-relation trees. */
class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpKey(): String =
    Files.createTempDirectory("graft_artifacts_spec").toString

  test("corpusPath keys are injective: readable sanitized path + digest suffix") {
    val a = Artifacts.corpusPath("x", "/data/corpus/v1")
    val b = Artifacts.corpusPath("x", "/data/corpus/v2")
    assert(a != b)
    assert(a.contains("graft_x__data_corpus_v1"), a)
    // different kinds never collide on the same corpus
    assert(Artifacts.corpusPath("y", "/data/corpus/v1") != a)
    // sanitization alone is NOT injective ('/' and '_' both map to
    // '_') — the digest suffix must separate such corpora
    assert(Artifacts.corpusPath("x", "/data/corpus_v1") != a)
    // stable across calls
    assert(Artifacts.corpusPath("x", "/data/corpus/v1") == a)
  }

  test("ensure composes: one artifact's build may ensure() another (no recursive-update)") {
    Artifacts.resetMemo()
    spark.range(1).count() // materialize the session before ensure()
    val corpus = tmpKey()
    // at many keys, the nested insert reliably lands in an in-flight
    // bin somewhere if builds run under the map lock (the q173-on-
    // q170 composition crashed exactly this way)
    (0 until 64).foreach { i =>
      var innerBuilt = false
      val outer = Artifacts.ensure(s"outer$i", corpus) { p =>
        val inner = Artifacts.ensure(s"inner$i", corpus) { q =>
          innerBuilt = true
          Artifacts.publish(Seq(1L).toDF("v"), q)
        }
        Artifacts.publish(spark.read.parquet(inner), p)
      }
      assert(innerBuilt, s"nested build $i must run")
      assert(spark.read.parquet(outer).as[Long].head() == 1L)
      // and the inner key is memoized normally afterwards
      var again = false
      Artifacts.ensure(s"inner$i", corpus) { _ => again = true }
      assert(!again)
    }
  }

  test("publish round-trips the relation and replaces a previous artifact") {
    val path = tmpKey() + "/art"
    Artifacts.publish(Seq(1L, 2L, 3L).toDF("v"), path)
    assert(spark.read.parquet(path).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    Artifacts.publish(Seq(9L).toDF("v"), path)
    assert(spark.read.parquet(path).as[Long].collect().toSeq == Seq(9L))
    // no build residue left behind
    assert(!new java.io.File(path + ".build").exists())
  }

  test("publishTree renames the whole multi-relation tree as one unit") {
    val path = tmpKey() + "/tree"
    Artifacts.publishTree(spark, path) { build =>
      Seq(1L).toDF("a").write.parquet(s"$build/left")
      Seq(2L).toDF("b").write.parquet(s"$build/right")
    }
    assert(spark.read.parquet(s"$path/left").as[Long].head() == 1L)
    assert(spark.read.parquet(s"$path/right").as[Long].head() == 2L)
    assert(!new java.io.File(path + ".build").exists())
  }

  test("ensure builds once per run key and memoizes the path") {
    val corpus = tmpKey()
    var builds = 0
    def run() = Artifacts.ensure("spec_kind", corpus) { p =>
      builds += 1
      Artifacts.publish(Seq(42L).toDF("v"), p)
    }
    val p1 = run(); val p2 = run()
    assert(p1 == p2)
    assert(builds == 1)
    assert(spark.read.parquet(p1).as[Long].head() == 42L)
    // first touch after a memo reset REBUILDS (never trusts disk residue)
    Artifacts.resetMemo()
    run()
    assert(builds == 2)
  }

  test("ensureVersioned: trust-on-match reuses across runs, corpus change rebuilds") {
    // a REAL corpus directory — the fingerprint is its (path, size,
    // mtime) listing
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_spec_corpus")
    val f = corpusDir.resolve("part-0.parquet")
    java.nio.file.Files.writeString(f, "state-1")
    val corpus = corpusDir.toString
    var builds = 0
    def run(trust: Boolean) = Artifacts.ensureVersioned("spec_vkind", corpus,
      trust = trust) { p =>
      builds += 1
      Artifacts.publish(Seq(42L).toDF("v"), p)
    }
    run(trust = true)
    assert(builds == 1)
    // "next run" (fresh memo), same corpus state → trusted, NO rebuild
    Artifacts.resetMemo()
    val p2 = run(trust = true)
    assert(builds == 1, "unchanged corpus must be reused across runs")
    assert(Artifacts.reusedThisRun.exists(_.startsWith("spec_vkind|")))
    assert(spark.read.parquet(p2).as[Long].head() == 42L)
    // corpus state changes (size here; mtime alone also flips the
    // digest) → fingerprint mismatch → rebuild
    java.nio.file.Files.writeString(f, "state-2-longer")
    Artifacts.resetMemo()
    run(trust = true)
    assert(builds == 2, "changed corpus must rebuild")
    // trust OFF stays the gate default: rebuild even when unchanged
    Artifacts.resetMemo()
    run(trust = false)
    assert(builds == 3, "trust off must always rebuild per run")
  }

  test("a corpus edited DURING the build is never versioned (no stale trust-match)") {
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_spec_corpus_race")
    val f = corpusDir.resolve("part-0.parquet")
    java.nio.file.Files.writeString(f, "state-1")
    val corpus = corpusDir.toString
    var builds = 0
    Artifacts.ensureVersioned("spec_race", corpus, trust = true) { p =>
      builds += 1
      // the corpus changes UNDER the build: the pre-build fingerprint
      // no longer matches, so this build must not be recorded as the
      // post-change corpus state
      java.nio.file.Files.writeString(f, "state-2-longer")
      Artifacts.publish(Seq(1L).toDF("v"), p)
    }
    assert(builds == 1)
    // next trust-on run: no fingerprint recorded → rebuild (safe side)
    Artifacts.resetMemo()
    Artifacts.ensureVersioned("spec_race", corpus, trust = true) { p =>
      builds += 1
      Artifacts.publish(Seq(2L).toDF("v"), p)
    }
    assert(builds == 2, "mid-build corpus edit must force the next run to rebuild")
    // and a STABLE build after that versions normally again
    Artifacts.resetMemo()
    Artifacts.ensureVersioned("spec_race", corpus, trust = true) { p =>
      builds += 1
      Artifacts.publish(Seq(3L).toDF("v"), p)
    }
    assert(builds == 2, "stable corpus state recorded by the previous build is trusted")
  }

  test("fingerprint sentinel is root-missing ONLY; a real directory digests its listing") {
    assert(Artifacts.corpusFingerprint(spark,
      "/definitely/not/a/real/dir") == "corpus-unlisted")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_spec_fp")
    java.nio.file.Files.writeString(corpusDir.resolve("a"), "x")
    val fp = Artifacts.corpusFingerprint(spark, corpusDir.toString)
    assert(fp != "corpus-unlisted" && fp.length == 64)
  }
}
