package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic equivalence of the pandas-query translator: random predicate
  * trees are rendered to pandas `query` syntax, translated to SQL, and
  * run through Spark — the surviving row set must equal a native
  * evaluator implementing pandas' null semantics (every comparison with
  * NaN is False EXCEPT `!=`/`not in`, which are True; negation then
  * flips those booleans, unlike SQL's null-propagating three-valued
  * logic). This is the test that catches `not (Code == 5)` keeping NaN
  * rows in pandas but dropping them under a naive SQL translation.
  *
  * Known remaining gap, deliberately untested: column-vs-COLUMN
  * comparisons with a null RIGHT operand under negation keep SQL
  * semantics (the reference's apply_filter strings always compare to
  * literals).
  */
class PandasQueryPropsSpec extends SparkSpec {

  private sealed trait P
  private case class Cmp(c: String, op: String, v: Int) extends P
  private case class InL(c: String, vs: List[Int], neg: Boolean) extends P
  private case class NullChk(c: String, not: Boolean) extends P
  private case class NoneCmp(c: String, neg: Boolean) extends P
  private case class AndP(a: P, b: P) extends P
  private case class OrP(a: P, b: P) extends P
  private case class NotP(a: P) extends P

  private def render(p: P, rnd: scala.util.Random): String = p match {
    case Cmp(c, op, v)   => s"$c $op $v"
    case InL(c, vs, neg) => s"$c ${if (neg) "not in" else "in"} [${vs.mkString(", ")}]"
    case NullChk(c, n)   => s"$c.${if (n) "notnull" else "isnull"}()"
    case NoneCmp(c, n)   => s"$c ${if (n) "!=" else "=="} None"
    case AndP(a, b) =>
      val conj = if (rnd.nextBoolean()) "&" else "and"
      s"(${render(a, rnd)}) $conj (${render(b, rnd)})"
    case OrP(a, b) =>
      val disj = if (rnd.nextBoolean()) "|" else "or"
      s"(${render(a, rnd)}) $disj (${render(b, rnd)})"
    case NotP(a) =>
      val neg = if (rnd.nextBoolean()) "~" else "not"
      s"$neg (${render(a, rnd)})"
  }

  /** pandas `DataFrame.query` truth on one row. */
  private def eval(p: P, row: Map[String, Option[Int]]): Boolean = p match {
    case Cmp(c, op, v) => row(c) match {
      case None => op == "!=" // NaN compares False except !=
      case Some(x) => op match {
        case ">" => x > v; case "<" => x < v; case ">=" => x >= v
        case "<=" => x <= v; case "==" => x == v; case "!=" => x != v
      }
    }
    case InL(c, vs, neg) => row(c) match {
      case None    => neg // NaN: `in` False, `not in` True
      case Some(x) => if (neg) !vs.contains(x) else vs.contains(x)
    }
    case NullChk(c, n) => if (n) row(c).isDefined else row(c).isEmpty
    // pandas None comparisons are constant: == None is False everywhere
    // (NaN == None included), != None is True everywhere
    case NoneCmp(_, n) => n
    case AndP(a, b)    => eval(a, row) && eval(b, row)
    case OrP(a, b)     => eval(a, row) || eval(b, row)
    case NotP(a)       => !eval(a, row)
  }

  private def genP(depth: Int, rnd: scala.util.Random): P = {
    val cols = Seq("Code", "Rent")
    def col() = cols(rnd.nextInt(cols.length))
    if (depth == 0 || rnd.nextInt(10) < 4) rnd.nextInt(4) match {
      case 0 =>
        val ops = Seq(">", "<", ">=", "<=", "==", "!=")
        Cmp(col(), ops(rnd.nextInt(ops.length)), rnd.nextInt(10))
      case 1 =>
        // empty lists included: `in []` is all-False, `not in []` all-True
        InL(col(), List.fill(rnd.nextInt(4))(rnd.nextInt(10)), rnd.nextBoolean())
      case 2 => NullChk(col(), rnd.nextBoolean())
      case 3 => NoneCmp(col(), rnd.nextBoolean())
    } else rnd.nextInt(3) match {
      case 0 => AndP(genP(depth - 1, rnd), genP(depth - 1, rnd))
      case 1 => OrP(genP(depth - 1, rnd), genP(depth - 1, rnd))
      case 2 => NotP(genP(depth - 1, rnd))
    }
  }

  test("translated filters match pandas null semantics on random predicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(987654321L)
    // nullable columns with enough null density to exercise every branch
    val rows = (0 until 40).map { i =>
      def v() = if (rnd.nextInt(10) < 3) None else Some(rnd.nextInt(10))
      (i.toLong, v(), v())
    }
    val df = rows.toDF("id", "Code", "Rent")
    val rowMaps = rows.map { case (id, c, r) =>
      id -> Map("Code" -> c, "Rent" -> r)
    }.toMap
    for (_ <- 1 to 60) {
      val p = genP(3, rnd)
      val q = render(p, rnd)
      val sql = PandasQuery.toSql(q)
      val got = df.filter(expr(sql)).select("id").collect().map(_.getLong(0)).toSet
      val want = rowMaps.collect { case (id, row) if eval(p, row) => id }.toSet
      assert(got == want,
        s"pandas query <$q>\ntranslated <$sql>\nexpected ${want.toSeq.sorted}, got ${got.toSeq.sorted}")
    }
  }

  test("scientific/leading-dot numeric literals get pandas null semantics") {
    import spark.implicits._
    // a null (pandas-NaN) row must be KEPT under ~(x > 1e6): a literal
    // form missed by the rewrite falls through to SQL null-propagation
    // and silently drops it
    val df = Seq((1L, Some(2e6)), (2L, Some(0.1)), (3L, Option.empty[Double]))
      .toDF("id", "Income")
    def ids(q: String) =
      df.filter(expr(PandasQuery.toSql(q))).collect().map(_.getLong(0)).toSet
    assert(ids("Income > 1e6") == Set(1L))
    assert(ids("~(Income > 1e6)") == Set(2L, 3L))
    assert(ids("~(Income < .5)") == Set(1L, 3L))
    assert(ids("~(Income == 1.5e-1)") == Set(1L, 2L, 3L))
    assert(ids("Income != 2.0E6") == Set(2L, 3L))
  }

  test("string literals survive connective and keyword rewrites") {
    import spark.implicits._
    val df = Seq((1L, "R&D"), (2L, "none and all"), (3L, "ops")).toDF("id", "Dept")
    def ids(q: String) =
      df.filter(expr(PandasQuery.toSql(q))).collect().map(_.getLong(0)).toSet
    assert(ids("Dept == 'R&D'") == Set(1L))
    assert(ids("Dept == 'none and all'") == Set(2L))
    assert(ids("Dept != 'R&D'") == Set(2L, 3L))
    assert(ids("Dept in ['R&D', 'ops']") == Set(1L, 3L))
    assert(ids("Dept not in ['none and all']") == Set(1L, 3L))
  }
}
