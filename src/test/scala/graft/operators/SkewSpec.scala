package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation == plain aggregation (integral values, any salt)") {
    // heavy skew: key 0 holds 90% of rows
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(2000) { i =>
      (if (i % 10 == 0) rnd.nextInt(50).toLong else 0L, (i % 13).toLong)
    }
    val df = data.toDF("k", "v").repartition(8)
    val plain = df.groupBy($"k")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum($"v").as("sum_value"))
      .as[(Long, Long, Long)].collect().toSet
    for (salt <- Seq(1, 4, 16)) {
      val salted = Skew.saltedCountSum(df, "k", salt, "v")
        .as[(Long, Long, Long)].collect().toSet
      assert(salted === plain, s"salt=$salt")
    }
  }
}
