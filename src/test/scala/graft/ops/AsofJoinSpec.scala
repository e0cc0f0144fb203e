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

  test("asof join forward: earliest right row at or after each left ts") {
    import spark.implicits._
    val left = Seq(
      (1, 5L, "l5"), (1, 10L, "l10"), (1, 20L, "l20"), (2, 10L, "l2-10"),
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1, 10L, "a"), (1, 15L, "b"), (2, 5L, "c"),
    ).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"),
      direction = AsofJoin.Forward).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("t")) -> r.getAs[String]("v")).toMap
    assert(out == Map(
      (1, 5L) -> "a",   // earliest of {10 -> a, 15 -> b}
      (1, 10L) -> "a",  // inclusive: right AT the left ts matches
      (1, 20L) -> null, // nothing at or after 20
      (2, 10L) -> null, // key 2's only right row is earlier
    ), s"got $out")
  }

  test("asof join forward ties: same-(key,ts) right rows resolve to the FIRST by tie columns") {
    import spark.implicits._
    val left = Seq((1, 10L)).toDF("k", "t")
    val right = Seq((1, 15L, 1, "first"), (1, 15L, 2, "second")).toDF("k", "t", "seq", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"), rightTieCols = Seq("seq"),
      direction = AsofJoin.Forward).collect()
    assert(out.length == 1 && out(0).getAs[String]("v") == "first")
  }

  test("asof join nearest: closer side wins, exact ties go backward") {
    import spark.implicits._
    val left = Seq(
      (1, 10L), // back at 8 (d=2), fwd at 15 (d=5) -> back
      (1, 14L), // back at 8 (d=6), fwd at 15 (d=1) -> fwd
      (1, 3L),  // no back, fwd at 8 -> fwd
      (2, 9L),  // back at 8 (d=1), fwd at 10 (d=1): tie -> backward
    ).toDF("k", "t")
    val right = Seq(
      (1, 8L, "b8"), (1, 15L, "f15"), (2, 8L, "b8"), (2, 10L, "f10"),
    ).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"),
      direction = AsofJoin.Nearest).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("t")) -> r.getAs[String]("v")).toMap
    assert(out == Map(
      (1, 10L) -> "b8", (1, 14L) -> "f15", (1, 3L) -> "b8", (2, 9L) -> "b8",
    ), s"got $out")
  }

  test("asof join tolerance: per-candidate filter precedes the nearest choice") {
    import spark.implicits._
    // back at 90 (d=10, OUT of tol 5), fwd at 103 (d=3, in tol):
    // nearest-then-tolerance would pick... back is closer? no — d_back=10
    // > d_fwd=3 so nearest picks fwd anyway; force the shadow case:
    // back at 99 (d=1, in tol), fwd at 150 (d=50, out) -> back.
    // and: back at 90 (d=10, out), fwd at 103 (d=3, in) -> fwd.
    // and tolerance kills both: back 90 (d=10), fwd 150 (d=50), tol 5 -> null.
    val left = Seq((1, 100L), (2, 100L), (3, 100L)).toDF("k", "t")
    val right = Seq(
      (1, 99L, "b"), (1, 150L, "f"),
      (2, 90L, "b"), (2, 103L, "f"),
      (3, 90L, "b"), (3, 150L, "f"),
    ).toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"),
      direction = AsofJoin.Nearest, tolerance = Some(5L)).collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(out == Map(1 -> "b", 2 -> "f", 3 -> null), s"got $out")
  }

  test("asof join backward tolerance: distant matches drop wholesale") {
    import spark.implicits._
    val left = Seq((1, 100L), (1, 200L)).toDF("k", "t")
    val right = Seq((1, 95L, "near", 7), (1, 120L, "far", 9)).toDF("k", "t", "v", "w")
    val out = AsofJoin.asofJoin(left, right, "t", Seq("k"), tolerance = Some(10L))
      .collect().map(r => r.getAs[Long]("t") -> (r.getAs[String]("v"), r.get(r.fieldIndex("w")))).toMap
    assert(out(100L) == (("near", 7)))
    assert(out(200L) == ((null, null)), s"both payloads must drop together, got $out")
  }

  test("asof join null timestamps: right nulls never match, left nulls stay unmatched") {
    import spark.implicits._
    // a null-ts right row sorts first under asc nulls-first ordering and
    // would otherwise ride forward as a bogus "predecessor" payload for
    // left rows with no real match (pandas merge_asof rejects null
    // on-keys; DuckDB ASOF leaves them unmatched)
    val left = Seq((1, Option(5L)), (1, Option(100L)), (1, Option.empty[Long]))
      .toDF("k", "t")
    val right = Seq((1, Option.empty[Long], "nullts"), (1, Option(50L), "real"))
      .toDF("k", "t", "v")
    for (dir <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest)) {
      val out = AsofJoin.asofJoin(left, right, "t", Seq("k"), direction = dir)
        .collect().map(r => Option(r.get(r.fieldIndex("t"))) -> r.getAs[String]("v")).toMap
      assert(out.size == 3, s"$dir: left cardinality must be preserved, got $out")
      assert(out(None) == null, s"$dir: null-ts left row must be unmatched, got $out")
      assert(!out.values.toSet.contains("nullts"),
        s"$dir: null-ts right row must never be carried as a match, got $out")
      val t5 = out(Some(5L))
      val expected5 = if (dir == AsofJoin.Backward) null else "real"
      assert(t5 == expected5, s"$dir: t=5 expected $expected5, got $t5")
      assert(out(Some(100L)) == (if (dir == AsofJoin.Forward) null else "real"),
        s"$dir: t=100, got $out")
    }
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
