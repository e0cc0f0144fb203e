package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL hygiene lint: DuckDB's `sum(BIGINT)` returns HUGEINT
  * (int128), which the driver's value hash distinguishes from Spark's
  * int64 even when every cell is equal (round-9 verdict, What's wrong
  * #1 — two gate rows were red for exactly this). Every integer `sum`
  * in oracle SQL must therefore carry an outer `CAST(... AS BIGINT)`
  * (or feed a DOUBLE expression before reaching the output). This spec
  * mechanically bans the bug class catalog-wide: `sum(CAST(` may only
  * appear immediately preceded by `CAST(`.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  test("every integer sum in oracle SQL is wrapped in an outer CAST") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val compact = sql.replaceAll("\\s+", " ")
      "(?i)sum\\(CAST\\(".r.findAllMatchIn(compact).toList.collect {
        case m if !compact.regionMatches(true, m.start - 5, "CAST(", 0, 5) =>
          s"$name: ...${compact.slice(math.max(0, m.start - 25), math.min(compact.length, m.end + 35))}..."
      }
    }
    assert(bad.isEmpty, "uncast integer sums in oracle SQL (wrap in CAST(... AS BIGINT)):\n" +
      bad.mkString("\n"))
  }
}
