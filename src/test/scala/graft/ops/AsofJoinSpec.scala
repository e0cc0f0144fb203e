package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asof join: latest right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1, 5L, "l5"), (1, 10L, "l10"), (1, 20L, "l20"), (2, 10L, "l2-10"),
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1, 10L, "a"), (1, 15L, "b"), (2, 30L, "c"),
    ).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k")).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("t")) -> r.getAs[String]("v")).toMap
    assert(out == Map(
      (1, 5L) -> null,   // nothing at or before 5
      (1, 10L) -> "a",   // inclusive: right AT the left ts matches
      (1, 20L) -> "b",   // latest of {10 -> a, 15 -> b}
      (2, 10L) -> null,  // key 2's only right row is later
    ), s"got $out")
  }

  test("asof join: same-(key,ts) right rows resolve by the tie columns") {
    import spark.implicits._
    val left = Seq((1, 10L)).toDF("k", "t")
    val right = Seq((1, 10L, 1, "first"), (1, 10L, 2, "second")).toDF("k", "t", "seq", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"), rightTieCols = Seq("seq"))
      .collect()
    assert(out.length == 1 && out(0).getAs[String]("v") == "second")
  }

  test("asof join rejects colliding payload columns and empty payloads") {
    import spark.implicits._
    val left = Seq((1, 5L, "x")).toDF("k", "t", "v")
    val right = Seq((1, 5L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "t", Seq("k"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right.select("k", "t"), "t", Seq("k"))
    }
  }

  test("asof join plan: one exchange keyed by the join key, no range join blowup") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i % 5, i.toLong)).toDF("k", "t")
    val right = (1 to 20).map(i => (i % 5, i.toLong * 3, s"v$i")).toDF("k", "t", "v")
    val plan = AsofJoin.asofJoin(left, right, "t", Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not plan an all-pairs join:\n$plan")
  }
}
