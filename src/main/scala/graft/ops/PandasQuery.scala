package graft.ops

/** Micro-translator from pandas `DataFrame.query` strings (the reference's
  * `apply_filter` syntax, hbsir/core/data_engine.py:407-412; examples at
  * hbsir/metadata/schema.yaml:190-195,943,990) to Spark SQL boolean
  * expressions usable with `df.filter(expr(...))`.
  *
  * Supported surface (everything the reference metadata actually uses,
  * plus the obvious closures): comparison ops, `and/or/not`, `&`/`|`/`~`,
  * `in`/`not in` with list literals, `.notnull()`/`.isnull()`/`.notna()`/
  * `.isna()`, backticked identifiers, numeric and string literals.
  */
object PandasQuery {

  def toSql(q: String): String = {
    var s = q.trim
    // `.notnull()` / `.isnull()` method calls -> IS [NOT] NULL postfix
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*(?:notnull|notna)\\(\\s*\\)", "$1 IS NOT NULL")
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*(?:isnull|isna)\\(\\s*\\)", "$1 IS NULL")
    // list literals: [a, b] -> (a, b)  (only in in/not-in position).
    // Negative predicates are null-safe: pandas `Code not in [x]` keeps
    // NaN rows, but SQL `NULL NOT IN (...)` is NULL and drops them — wrap
    // as (col IS NULL OR col NOT IN (...)).
    s = s.replaceAll(
      "(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+not\\s+in\\s*\\[([^\\]]*)\\]",
      "($1 IS NULL OR $1 NOT IN ($2))")
    s = s.replaceAll("(?i)\\bin\\s*\\[([^\\]]*)\\]", "IN ($1)")
    // same for != — pandas keeps NaN rows under a != comparison
    s = s.replaceAll(
      "(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*!=\\s*('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.\\-]+)",
      "($1 IS NULL OR $1 != $2)")
    // boolean connectives
    s = s.replace("&", " AND ").replace("|", " OR ").replace("~", " NOT ")
    s = s.replaceAll("(?i)\\band\\b", "AND")
    s = s.replaceAll("(?i)\\bor\\b", "OR")
    s = s.replaceAll("(?i)\\bnot\\b(?!\\s+IN)", "NOT")
    // equality
    s = s.replace("==", "=")
    // python literals
    s = s.replaceAll("\\bTrue\\b", "true").replaceAll("\\bFalse\\b", "false")
    s = s.replaceAll("\\bNone\\b", "NULL")
    s.replaceAll("\\s+", " ").trim
  }
}
