package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("data").toString

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("ORC round-trip preserves schema and rows; pushdown + pruning reach the scan") {
    val path = tmp("orc")
    Formats.writeOrc(lineitem, path)
    val back = Formats.readOrc(spark, path)
    assert(back.schema === lineitem.schema)
    assert(back.count() === lineitem.count())
    val q = back.filter($"l_quantity" > 45.0).select($"l_orderkey", $"l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      plan.take(800))
    // column pruning: the ORC scan must read only the two projected cols
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined, plan.take(800))
    assert(read.get.split(",").map(_.split(":")(0)).toSet ===
      Set("l_orderkey", "l_quantity"), read.get)
  }

  test("CSV: explicit schema round-trip; FAILFAST raises on a malformed row") {
    val path = tmp("csv")
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "x")
    Formats.writeCsv(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("x", DoubleType)))
    val back = Formats.readCsv(spark, path, schema)
    assert(back.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
    // corrupt a copy: non-numeric where the schema says double
    val bad = tmp("csv-bad")
    Seq("id,name,x", "1,alpha,1.5", "2,beta,NOT_A_NUMBER")
      .toDF("line").coalesce(1).write.mode("overwrite").text(bad)
    val e = intercept[org.apache.spark.SparkException] {
      Formats.readCsv(spark, bad, schema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed")
      || Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
    // permissive mode nulls the bad cell instead of failing
    val loose = Formats.readCsv(spark, bad, schema, failFast = false)
    assert(loose.filter($"x".isNull).count() === 1L)
  }

  test("JSONL: schema'd round-trip keeps types; null fields survive") {
    val path = tmp("jsonl")
    val df = Seq((1L, Some("a"), Some(2.5)), (2L, None, None))
      .toDF("id", "tag", "score")
    Formats.writeJsonl(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType),
      StructField("score", DoubleType)))
    val back = Formats.readJsonl(spark, path, schema)
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(back === Set((1L, Some("a"), Some(2.5)), (2L, None, None)))
  }

  test("partitioned parquet: filter on the partition column prunes directories") {
    val path = tmp("part")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Formats.writePartitioned(docs, path, "source")
    val q = spark.read.parquet(path).filter($"source" === "src1")
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      plan.take(800))
    assert(q.count() === docs.filter($"source" === "src1").count())
    // and the pruned read returns exactly the partition's rows
    assert(q.select("doc_id").as[Long].collect().toSet ===
      docs.filter($"source" === "src1").select("doc_id").as[Long].collect().toSet)
  }
}
