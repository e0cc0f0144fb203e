package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("rolling: trailing RANGE frame aggregates over the time span, inclusive both ends") {
    import spark.implicits._
    val df = Seq(
      (1, 0L, 10.0), (1, 50L, 20.0), (1, 100L, 30.0), (1, 161L, 40.0),
      (2, 100L, 5.0),
    ).toDF("k", "t", "v")
    val out = TimeSeries.rolling(df, "t", Seq("k"), span = 100L,
      Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("t")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("s")))).toMap
    assert(out((1, 0L)) == ((1L, 10.0)))
    assert(out((1, 50L)) == ((2L, 30.0)))
    assert(out((1, 100L)) == ((3L, 60.0)), "t-span = 0 is inclusive")
    assert(out((1, 161L)) == ((2L, 70.0)), "t=50 fell out of [61, 161]")
    assert(out((2, 100L)) == ((1L, 5.0)), "keys partition independently")
  }

  test("rolling: equal-timestamp peers aggregate identically (RANGE, not ROWS)") {
    import spark.implicits._
    val df = Seq((1, 10L, 1.0), (1, 10L, 2.0), (1, 10L, 4.0)).toDF("k", "t", "v")
    val out = TimeSeries.rolling(df, "t", Seq("k"), span = 5L, Seq("s" -> sum(col("v"))))
      .collect().map(_.getAs[Double]("s")).toSet
    assert(out == Set(7.0), s"all peers must see the full frame, got $out")
  }

  test("rolling agrees with the brute-force reference on random fixtures " +
    "(duplicate timestamps, sparse keys, varying spans)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 6133)
      val rows = (0 until 80).map(i =>
        (i, rnd.nextInt(4), rnd.nextInt(40).toLong, (rnd.nextInt(20) + 1).toDouble))
      val span = 3L + seed * 4
      val got = TimeSeries.rolling(rows.toDF("id", "k", "t", "v"), "t", Seq("k"), span,
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
        .collect().map(r => r.getAs[Int]("id") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("s")))).toMap
      rows.foreach { case (id, k, t, _) =>
        val frame = rows.filter { case (_, k2, t2, _) => k2 == k && t2 >= t - span && t2 <= t }
        val exp = (frame.size.toLong, frame.map(_._4).sum)
        assert(got(id) == exp, s"seed=$seed span=$span row(id=$id,k=$k,t=$t): " +
          s"got ${got(id)}, expected $exp")
      }
    }
  }

  test("rolling plan: every aggregate rides ONE Window node (single sort)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i.toLong, i.toDouble)).toDF("k", "t", "v")
    val plan = TimeSeries.rolling(df, "t", Seq("k"), span = 10L,
      Seq("n" -> count(lit(1)), "s" -> sum(col("v")), "m" -> max(col("v"))))
      .queryExecution.executedPlan.toString
    val sorts = plan.linesIterator.count(l => l.contains("Sort ["))
    assert(sorts == 1, s"expected one sort, got $sorts:\n$plan")
  }
}
