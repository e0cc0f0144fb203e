package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join matches plain join results") {
    import spark.implicits._
    // heavily skewed: 900 of 1000 rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted == plain)
    assert(salted.count(_._3 == "hot") == 900)
  }

  test("salted sum matches plain aggregation") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 3, i.toLong)).toDF("g", "v")
    val plain = df.groupBy("g").agg(sum("v").as("v")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(df, Seq("g"), Seq("v"), salt = 7).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // global (keyless) salted sum
    val g = Skew.saltedSum(df, Seq.empty, Seq("v"), salt = 7).collect()(0).getLong(0)
    assert(g == (1 to 500).map(_.toLong).sum)
  }

  test("key histogram surfaces the hot key") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i <= 90) "hot" else s"k$i", i)).toDF("k", "v")
    val top = Skew.keyHistogram(df, "k", 1).collect()(0)
    assert(top.getString(0) == "hot" && top.getLong(1) == 90L)
  }
}
