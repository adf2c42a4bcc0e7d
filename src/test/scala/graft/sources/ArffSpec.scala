package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Reads the reference's shipped datasets (read-only fixtures at
  * /root/reference/datasets — workload shapes per BASELINE.md).
  */
class ArffSpec extends SparkSpec {
  private val small = "/root/reference/datasets/small-train.arff"

  test("header: attribute names in declared order") {
    val attrs = Arff.attributes(spark, small)
    assert(attrs.size === 8) // 7 features + class (BASELINE.md small tier)
  }

  test("read: 592 data rows, ordinal ids, all-double schema") {
    val df = Arff.read(spark, small)
    assert(df.count() === 592)
    val f = df.schema.fields
    assert(f.head.name === "id" && f.head.dataType === LongType)
    assert(f.tail.forall(_.dataType === DoubleType))
    // ordinal identity: ids are exactly 0..591 (file order, Hadoop.java:104)
    import spark.implicits._
    val ids = df.select($"id").as[Long].collect().sorted
    assert(ids === (0L until 592L).toArray)
  }

  test("readLabeled: features exclude the last (label) column") {
    val df = Arff.readLabeled(spark, small)
    assert(df.columns.toSeq === Seq("id", "features", "label"))
    val r = df.filter("id = 0").head()
    assert(r.getAs[Seq[Double]]("features").size === 7)
  }

  test("test tier row counts match BASELINE.md") {
    assert(Arff.read(spark, "/root/reference/datasets/small-test.arff").count() === 80)
  }
}
