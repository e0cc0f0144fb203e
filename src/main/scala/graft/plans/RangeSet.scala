package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: binary search of a long value in a static
  * sorted set of disjoint half-open ranges, returning the matched range's
  * index (null when unmatched).
  *
  * Motivation (SURVEY §2 D1 plan (b)): compiling a classification level
  * to a column expression instead of a join. The reference's occupation
  * classification has hundreds of ranges per level — an OR-chain / `when`
  * ladder evaluates O(ranges) comparisons per row and bloats generated
  * code past JIT limits, while this expression is O(log ranges) with a
  * tight codegen'd loop over two primitive arrays shared via reference
  * objects (no per-row allocation).
  *
  * The mapping to labels happens outside: `element_at(labels, idx + 1)`.
  */
final case class RangeSetSearch(
    child: Expression,
    los: Array[Long],
    his: Array[Long], // exclusive upper bounds, parallel to los
) extends UnaryExpression {

  require(los.length == his.length, "parallel range arrays required")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // Array fields compare by REFERENCE under the case-class equals, so
  // two semantically identical searches would never canonicalize equal
  // — cache lookups, subexpression elimination, and exchange reuse all
  // depend on this. Compare contents.
  override def equals(obj: Any): Boolean = obj match {
    case r: RangeSetSearch =>
      child == r.child && los.sameElements(r.los) && his.sameElements(r.his)
    case _ => false
  }
  override def hashCode(): Int =
    (child.hashCode, los.toSeq.hashCode, his.toSeq.hashCode).hashCode

  override protected def withNewChildInternal(newChild: Expression): RangeSetSearch =
    copy(child = newChild)

  /** Binary search over range starts; check containment in the candidate. */
  private def search(v: Long): Any = {
    var lo = 0
    var hi = los.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (v < los(mid)) hi = mid - 1
      else if (v >= his(mid)) lo = mid + 1
      else return mid
    }
    null
  }

  override def nullSafeEval(input: Any): Any = search(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("los", los, "long[]")
    val hisRef = ctx.addReferenceObj("his", his, "long[]")
    // fresh names: with a NON-nullable child, nullSafeCodeGen emits this
    // block unbraced at method scope — hardcoded locals would collide
    // when two searches share one generated method (Janino redefinition
    // error -> silent interpreted fallback)
    val lo = ctx.freshName("rsLo")
    val hi = ctx.freshName("rsHi")
    val mid = ctx.freshName("rsMid")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int $lo = 0; int $hi = $losRef.length - 1;
         |${ev.isNull} = true;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($v < $losRef[$mid]) { $hi = $mid - 1; }
         |  else if ($v >= $hisRef[$mid]) { $lo = $mid + 1; }
         |  else { ${ev.isNull} = false; ${ev.value} = $mid; break; }
         |}
       """.stripMargin
    })
  }
}

object RangeSet {

  /** Index of the range containing `value` in sorted disjoint
    * [lo, hi) ranges; null when none contains it. Resolves through the
    * session-registered `range_set_search` function
    * ([[GraftExtensions]] must be installed via `spark.sql.extensions`).
    */
  def search(value: Column, ranges: Seq[(Long, Long)]): Column = {
    import org.apache.spark.sql.functions._
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) =>
        require(h1 <= l2, s"ranges overlap: [$h1 > $l2)")
      case _ =>
    }
    call_function("range_set_search", value.cast("long"),
      array(sorted.map(r => lit(r._1)): _*),
      array(sorted.map(r => lit(r._2)): _*))
  }

  /** Label of the containing range: ranges paired with labels, unmatched
    * values -> defaultLabel (or null).
    */
  def lookup(
      value: Column,
      ranges: Seq[(Long, Long, String)],
      defaultLabel: Option[String] = None,
  ): Column = {
    import org.apache.spark.sql.functions._
    val sorted = ranges.sortBy(_._1)
    val idx = search(value, sorted.map(r => (r._1, r._2)))
    val labels = array(sorted.map(r => lit(r._3)): _*)
    // explicit null guard: element_at with a null index mis-reports
    // nullability under constant-folded local relations (and ANSI mode
    // dislikes speculative indexing)
    val found = when(idx.isNotNull, element_at(labels, idx + lit(1)))
    defaultLabel.fold(found)(d => coalesce(found, lit(d)))
  }
}
