package graft.ops

/** Micro-translator from pandas `DataFrame.query` strings (the reference's
  * `apply_filter` syntax, hbsir/core/data_engine.py:407-412; examples at
  * hbsir/metadata/schema.yaml:190-195,943,990) to Spark SQL boolean
  * expressions usable with `df.filter(expr(...))`.
  *
  * Supported surface (everything the reference metadata actually uses,
  * plus the obvious closures): comparison ops, `and/or/not`, `&`/`|`/`~`,
  * `in`/`not in` with list literals (including empty), `.notnull()`/
  * `.isnull()`/`.notna()`/`.isna()`, `== None`/`!= None`, backticked
  * identifiers, numeric and string literals.
  *
  * Known deliberate gap: column-vs-COLUMN comparisons keep SQL null
  * semantics entirely (pandas would keep null rows under `!=` and under
  * any negated compare; the reference's filters always compare columns
  * to literals, where the translation is exact).
  */
object PandasQuery {

  def toSql(q: String): String = {
    // Protect string literals BEFORE any rewrite: connective and keyword
    // substitutions must never fire inside quoted values ("R&D" is not a
    // conjunction, 'none and all' contains no keywords). Each literal is
    // swapped for a quoted numeric placeholder — still a quoted
    // token, so the ident-op-literal patterns below keep matching — and
    // restored verbatim at the end.
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    var s = ("'[^']*'|\"[^\"]*\"").r.replaceAllIn(q.trim, m => {
      literals += m.matched
      java.util.regex.Matcher.quoteReplacement(s"'${literals.size - 1}'")
    })
    // `.notnull()` / `.isnull()` method calls -> IS [NOT] NULL postfix
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*(?:notnull|notna)\\(\\s*\\)", "$1 IS NOT NULL")
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*(?:isnull|isna)\\(\\s*\\)", "$1 IS NULL")
    // Pandas None comparisons are constant: `c == None` is False for
    // EVERY row (NaN == None included), `c != None` is True for every
    // row — fold them before the generic comparison rules can see None.
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*==\\s*None\\b", "false")
    s = s.replaceAll("(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*!=\\s*None\\b", "true")
    // Empty list literals are constant too: `c in []` is all-False,
    // `c not in []` all-True (SQL `IN ()` would not even parse).
    s = s.replaceAll("(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+not\\s+in\\s*\\[\\s*\\]", "true")
    s = s.replaceAll("(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+in\\s*\\[\\s*\\]", "false")
    // Pandas comparisons are null-REJECTING (every compare with NaN is
    // False, except != which is True); SQL comparisons are
    // null-PROPAGATING (NULL). Under a plain filter both drop the row,
    // but under NEGATION they diverge: pandas `not (Code > 5)` KEEPS a
    // NaN row, SQL `NOT (Code > 5)` drops it. Every ident-vs-LITERAL
    // predicate below is therefore rewritten to an explicitly two-valued
    // form so `~`/`not` composes with pandas semantics:
    //   c > v        -> (c IS NOT NULL AND c > v)     [< >= <= likewise]
    //   c == v       -> c <=> v                       [null-safe equal]
    //   c != v       -> (c IS NULL OR c != v)
    //   c in [..]    -> (c IS NOT NULL AND c IN (..))
    //   c not in [..]-> (c IS NULL OR c NOT IN (..))
    // The literal RHS class is quoted strings, numbers, True/False ONLY:
    // an identifier RHS must NOT become <=> (pandas NaN == NaN is False,
    // but NULL <=> NULL is TRUE — a plain-filter divergence, not just a
    // negated one), so col-vs-col comparisons fall through to plain SQL.
    // numeric alternative covers exponents and leading dots (1e6, .5,
    // -1.5E-3): a missed form here silently falls through to plain SQL
    // null semantics, which diverges from pandas under negation
    val lit = "('[^']*'|\"[^\"]*\"|-?(?:[0-9][0-9.]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?|True|False)"
    s = s.replaceAll(
      "(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+not\\s+in\\s*\\[([^\\]]*)\\]",
      "($1 IS NULL OR $1 NOT IN ($2))")
    s = s.replaceAll(
      "(?i)(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+in\\s*\\[([^\\]]*)\\]",
      "($1 IS NOT NULL AND $1 IN ($2))")
    s = s.replaceAll(
      s"(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*!=\\s*$lit",
      "($1 IS NULL OR $1 != $2)")
    // ordered comparisons (>= <= before > < so the wrap sees whole ops;
    // must run BEFORE == becomes <=>, whose <=/> would false-match)
    s = s.replaceAll(
      s"(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*(>=|<=|>|<)\\s*$lit",
      "($1 IS NOT NULL AND $1 $2 $3)")
    // null-safe equality (literal RHS only — see above)
    s = s.replaceAll(
      s"(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*==\\s*$lit",
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
    s = s.replaceAll("\\s+", " ").trim
    // restore the protected string literals
    ("'([0-9]+)'").r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(literals(m.group(1).toInt)))
  }
}
