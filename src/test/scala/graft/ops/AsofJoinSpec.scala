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

  test("asof join: the latest right row wins WHOLESALE — null payload cells " +
    "are attached as null, never backfilled from an older right row") {
    import spark.implicits._
    val left = Seq((1, 20L, "probe")).toDF("k", "t", "tag")
    // older right row has both payloads set; the LATEST right row has a
    // legitimately-NULL v2. A per-column fill would emit (v1=new, v2=old)
    // — a row that never existed on the right.
    val right = Seq(
      (1, 5L, Some("old1"), Some("old2")),
      (1, 10L, Some("new1"), None),
    ).toDF("k", "t", "v1", "v2")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("v1") == "new1")
    assert(out(0).getAs[String]("v2") == null,
      s"null payload in the latest right row must survive, got ${out(0)}")
  }

  test("asof join: a right row whose payloads are ALL null still matches " +
    "(it is a real right row, not the absence of one)") {
    import spark.implicits._
    val left = Seq((1, 20L)).toDF("k", "t")
    val right = Seq(
      (1, 5L, Some("old")),
      (1, 10L, Option.empty[String]),
    ).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k")).collect()
    assert(out.length == 1 && out(0).getAs[String]("v") == null,
      s"latest right row (all-null payload) must win, got ${out.toSeq}")
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
