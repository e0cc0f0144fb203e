package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Dedup.dedupSpans]] — exact substring-span dedup (Lee et al.
  * ExactSubstr at fixed k-token window granularity) — and its
  * [[graft.plans.SlidingWindows]] kernel.
  */
class DedupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def texts(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

  test("sliding_windows kernel: windows, short arrays, codegen/interpreted parity") {
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c"),     // shorter than k -> no windows
      (3L, ""),
    ).toDF("doc_id", "text")
    val wins = df.select($"doc_id",
      Dedup.slidingWindows(split($"text", " "), 4).as("w"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(wins(1L) == Seq("a b c d", "b c d e"))
    assert(wins(2L) == Seq.empty)
    // interpreted path (nullSafeEval) must agree with codegen
    import graft.plans.SlidingWindows
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Array[Any]("a", "b", "c", "d", "e").map(s => UTF8String.fromString(s.toString)))
    val out = SlidingWindows.compute(toks, 4, UTF8String.fromString(" "))
    assert((0 until out.numElements()).map(out.getUTF8String(_).toString) ==
      Seq("a b c d", "b c d e"))
  }

  test("cross-document span: corpus-first occurrence keeps it, later ones lose it") {
    val span = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"intro words here $span"),
      (2L, s"$span and a different tail"),
      (3L, "nothing shared with anyone at all here"),
    ).toDF("doc_id", "text")
    val out = texts(Dedup.dedupSpans(df, k = 8))
    assert(out(1L) == s"intro words here $span") // first (doc 1, pos 3) wins
    assert(out(2L) == "and a different tail")
    assert(out(3L) == "nothing shared with anyone at all here")
  }

  test("intra-document repetition: second copy excised within one doc") {
    val df = Seq((7L, "a b c d a b c d")).toDF("doc_id", "text")
    assert(texts(Dedup.dedupSpans(df, k = 4))(7L) == "a b c d")
  }

  test("overlapping duplicate windows merge into one contiguous excision") {
    // a 12-token shared passage yields 5 overlapping 8-windows in each
    // doc; all positions they cover in doc 2 must go in one piece
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val df = Seq(
      (1L, s"$passage left tail"),
      (2L, s"right head $passage"),
    ).toDF("doc_id", "text")
    val out = texts(Dedup.dedupSpans(df, k = 8))
    assert(out(1L) == s"$passage left tail")
    assert(out(2L) == "right head")
  }

  test("every row survives: fully-deduplicated and empty docs keep their rows") {
    val span = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      (1L, span),
      (2L, span),          // identical doc -> fully excised
      (3L, ""),            // empty stays empty
      (4L, " \t  "),       // whitespace-only normalizes to empty
    ).toDF("doc_id", "text")
    val out = texts(Dedup.dedupSpans(df, k = 8))
    assert(out == Map(1L -> span, 2L -> "", 3L -> "", 4L -> ""))
  }

  test("whitespace is normalized, so tab/newline variants of a span still match") {
    val df = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      (2L, "x1\tx2  x3 x4\nx5 x6 x7 x8"),
    ).toDF("doc_id", "text")
    val out = texts(Dedup.dedupSpans(df, k = 8))
    assert(out(1L) == "x1 x2 x3 x4 x5 x6 x7 x8" && out(2L) == "")
  }

  test("hashKeys (the at-scale shuffle key) is output-identical on a collision-free corpus") {
    val span = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val df = (1L to 40L).map { i =>
      (i, if (i % 4 == 0) s"doc $i carries the shared passage $span" else s"doc $i plain text body ${i * 31}")
    }.toDF("doc_id", "text")
    val exact = texts(Dedup.dedupSpans(df, k = 8))
    val hashed = texts(Dedup.dedupSpans(df, k = 8, hashKeys = true))
    assert(exact == hashed)
    assert(exact(4L).contains(span) && !exact(8L).contains("s1 s2"))
  }

  test("non-text columns pass through; k below 2 refused") {
    val df = Seq((1L, "m1 m2 m3 m4", "en")).toDF("doc_id", "text", "lang")
    val out = Dedup.dedupSpans(df, k = 2).collect().head
    assert(out.getAs[String]("lang") == "en")
    intercept[IllegalArgumentException](Dedup.dedupSpans(df, k = 1))
  }
}
