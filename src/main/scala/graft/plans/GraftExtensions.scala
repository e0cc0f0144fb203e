package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Session extensions registering the library's native expressions.
  * Install with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * `range_set_search(value, array(lo...), array(hi...))` — the ranges must
  * be foldable literals (they come from compiled classification metadata);
  * the builder folds them into primitive arrays at resolution time so the
  * per-row path is the codegen'd binary search in [[RangeSetSearch]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("range_set_search"),
      new ExpressionInfo(classOf[RangeSetSearch].getName, "range_set_search"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "range_set_search(value, array(lo...), array(hi...))")
        def longs(e: Expression): Array[Long] = {
          require(e.foldable, s"range bounds must be literal arrays, got $e")
          e.eval().asInstanceOf[ArrayData].toLongArray()
        }
        RangeSetSearch(args.head, longs(args(1)), longs(args(2)))
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("ngram_jaccard_text"),
      new ExpressionInfo(classOf[NgramJaccardText].getName, "ngram_jaccard_text"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "ngram_jaccard_text(a, b, k)")
        require(args(2).foldable, "k must be a literal")
        NgramJaccardText(args.head, args(1), args(2).eval().asInstanceOf[Int])
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_text(text)")
        SimHashText(args.head)
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b)")
        VecDot(args.head, args(1))
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleText].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(text, k)")
        require(args(1).foldable, "k must be a literal")
        ShingleText(args.head, args(1).eval().asInstanceOf[Int])
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_hashes"),
      new ExpressionInfo(classOf[JaccardHashes].getName, "jaccard_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaccard_hashes(a, b)")
        JaccardHashes(args.head, args(1))
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[MinHashText].getName, "minhash_text"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_text(text, numHashes, k)")
        require(args(1).foldable && args(2).foldable, "numHashes/k must be literals")
        MinHashText(args.head,
          args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])
      },
    ))
  }
}
