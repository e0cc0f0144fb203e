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
    // Pandas comparisons are null-REJECTING (every compare with NaN is
    // False, except != which is True); SQL comparisons are
    // null-PROPAGATING (NULL). Under a plain filter both drop the row,
    // but under NEGATION they diverge: pandas `not (Code > 5)` KEEPS a
    // NaN row, SQL `NOT (Code > 5)` drops it. Every predicate below is
    // therefore rewritten to an explicitly two-valued form so `~`/`not`
    // composes with pandas semantics:
    //   c > v        -> (c IS NOT NULL AND c > v)     [< >= <= likewise]
    //   c == v       -> c <=> v                       [null-safe equal]
    //   c != v       -> (c IS NULL OR c != v)
    //   c in [..]    -> (c IS NOT NULL AND c IN (..))
    //   c not in [..]-> (c IS NULL OR c NOT IN (..))
    s = s.replaceAll(
      "(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+not\\s+in\\s*\\[([^\\]]*)\\]",
      "($1 IS NULL OR $1 NOT IN ($2))")
    s = s.replaceAll(
      "(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+in\\s*\\[([^\\]]*)\\]",
      "($1 IS NOT NULL AND $1 IN ($2))")
    s = s.replaceAll(
      "(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*!=\\s*('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.\\-]+)",
      "($1 IS NULL OR $1 != $2)")
    // ordered comparisons (>= <= before > < so the wrap sees whole ops;
    // must run BEFORE == becomes <=>, whose <=/> would false-match)
    s = s.replaceAll(
      "(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*(>=|<=|>|<)\\s*('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.\\-]+)",
      "($1 IS NOT NULL AND $1 $2 $3)")
    // null-safe equality
    s = s.replaceAll(
      "(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*==\\s*('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.\\-]+)",
      "$1 <=> $2")
    // boolean connectives
    s = s.replace("&", " AND ").replace("|", " OR ").replace("~", " NOT ")
    s = s.replaceAll("(?i)\\band\\b", "AND")
    s = s.replaceAll("(?i)\\bor\\b", "OR")
    s = s.replaceAll("(?i)\\bnot\\b(?!\\s+IN)", "NOT")
    // any equality not in ident-op-literal shape falls through verbatim
    s = s.replace("==", "=")
    // python literals
    s = s.replaceAll("\\bTrue\\b", "true").replaceAll("\\bFalse\\b", "false")
    s = s.replaceAll("\\bNone\\b", "NULL")
    s.replaceAll("\\s+", " ").trim
  }
}
