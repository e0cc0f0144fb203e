package graft.ops

import graft.SparkSpec

/** AsofJoin vs an in-memory brute-force reference over deterministic
  * pseudo-random fixtures: every (direction × tolerance) combination,
  * including duplicate timestamps on both sides, null payload cells,
  * and keys present on only one side. The brute force scans all right
  * rows per left row — the quadratic formulation the operator exists to
  * avoid — so agreement checks the SEMANTICS independently of the
  * union-and-window mechanics.
  */
class AsofJoinPropSpec extends SparkSpec {

  private case class R(k: Int, t: Long, seq: Int, v: Option[Int])

  /** Brute-force expected payload (seq, v) for one left row, or None. */
  private def expected(
      rights: Seq[R], k: Int, t: Long, direction: String, tol: Option[Long],
  ): Option[(Int, Option[Int])] = {
    val mine = rights.filter(_.k == k)
    def within(d: Long) = tol.forall(d <= _)
    // backward candidate: max ts <= t; among ties the LAST by seq
    val back = mine.filter(_.t <= t).sortBy(r => (r.t, r.seq)).lastOption
      .filter(r => within(t - r.t))
    // forward candidate: min ts >= t; among ties the FIRST by seq
    val fwd = mine.filter(_.t >= t).sortBy(r => (r.t, r.seq)).headOption
      .filter(r => within(r.t - t))
    val chosen = direction match {
      case AsofJoin.Backward => back
      case AsofJoin.Forward  => fwd
      case AsofJoin.Nearest => (back, fwd) match {
        case (Some(b), Some(f)) => if (t - b.t <= f.t - t) Some(b) else Some(f)
        case (b, f)             => b.orElse(f)
      }
    }
    chosen.map(r => (r.seq, r.v))
  }

  test("asof join agrees with the brute-force reference on random fixtures, " +
    "all directions x tolerances") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7919)
      // small time domain forces duplicate timestamps within and across sides
      val lefts = (0 until 60).map(i => (rnd.nextInt(4), rnd.nextInt(30).toLong, i))
      val rights = (0 until 40).map { i =>
        R(rnd.nextInt(5), rnd.nextInt(30).toLong, i,
          if (rnd.nextBoolean()) Some(rnd.nextInt(100)) else None)
      }
      val leftDf = lefts.toDF("k", "t", "lid")
      val rightDf = rights.map(r => (r.k, r.t, r.seq, r.v)).toDF("k", "t", "seq", "v")
      for {
        direction <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest)
        tol <- Seq(None, Some(3L), Some(0L))
      } {
        val got = AsofJoin.asofJoin(leftDf, rightDf, "t", Seq("k"),
          rightTieCols = Seq("seq"), direction = direction, tolerance = tol)
          .collect()
          .map(r => r.getAs[Int]("lid") ->
            Option(r.getAs[Any]("seq")).map(s =>
              (s.asInstanceOf[Int], Option(r.getAs[Any]("v")).map(_.asInstanceOf[Int]))))
          .toMap
        lefts.foreach { case (k, t, lid) =>
          val exp = expected(rights, k, t, direction, tol)
          assert(got(lid) == exp,
            s"seed=$seed dir=$direction tol=$tol left(k=$k,t=$t): got ${got(lid)}, expected $exp")
        }
      }
    }
  }
}
