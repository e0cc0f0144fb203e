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
    // list literals: [a, b] -> (a, b)  (only in in/not-in position)
    s = s.replaceAll("(?i)\\bnot\\s+in\\s*\\[([^\\]]*)\\]", "NOT IN ($1)")
    s = s.replaceAll("(?i)\\bin\\s*\\[([^\\]]*)\\]", "IN ($1)")
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
