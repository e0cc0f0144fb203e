package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("tokens handles runs of whitespace and edges") {
    val r = one("  a  b \t c ").select(TextOps.tokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("tokens and subwords drop tab/newline edges (non-space whitespace)") {
    // Spark's trim() strips only 0x20 — the tokenizer must strip ALL
    // whitespace before splitting or "foo\n" grows a phantom "" token
    val r = one("\tfoo bar\n").select(
      size(TextOps.tokens(col("text"))).as("n"),
      TextOps.subwordCount(col("text")).as("sw")).collect()(0)
    assert(r.getAs[Int]("n") == 2)
    assert(r.getAs[Int]("sw") == 2)
    val stats = TextOps.textStats(one("\tfoo  bar\n")).collect()(0)
    assert(stats.getAs[Int]("n_tokens") == 2)
    assert(stats.getAs[Int]("n_distinct_tokens") == 2)
  }

  test("text stats") {
    val r = TextOps.textStats(one("one two two 3")).collect()(0)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_distinct_tokens") == 3)
    assert(r.getAs[Int]("n_digits") == 1)
  }

  test("language id picks marker language, und on no hits") {
    val en = one("the cat and the dog is in that house")
      .select(TextOps.languageId(col("text"))).collect()(0).getString(0)
    val de = one("der hund ist nicht zu haus und die katze")
      .select(TextOps.languageId(col("text"))).collect()(0).getString(0)
    val und = one("zzz qqq xxx")
      .select(TextOps.languageId(col("text"))).collect()(0).getString(0)
    assert(en == "en" && de == "de" && und == "und")
  }

  test("quality score bounded and monotone-ish in length") {
    val short = one("hi").select(TextOps.qualityScore(col("text"))).collect()(0).getDouble(0)
    val long = one(("meaningful words " * 40).trim)
      .select(TextOps.qualityScore(col("text"))).collect()(0).getDouble(0)
    assert(short >= 0.0 && short <= 1.0 && long >= 0.0 && long <= 1.0)
    assert(long > short)
  }

  test("fingerprint ignores case and punctuation") {
    import spark.implicits._
    val df = Seq((1L, "Hello, World!"), (2L, "hello world")).toDF("doc_id", "text")
      .select(TextOps.fingerprint(col("text")).as("f")).distinct()
    assert(df.count() == 1)
  }

  test("pandas query translation: null-safe negatives") {
    assert(PandasQuery.toSql("Code not in [18888, 28888]")
      .contains("(Code IS NULL OR Code NOT IN ( 18888, 28888))")
      || PandasQuery.toSql("Code not in [18888, 28888]")
        .contains("(Code IS NULL OR Code NOT IN (18888, 28888))"))
    val neq = PandasQuery.toSql("Flag != 'N'")
    assert(neq.contains("Flag IS NULL OR"))
    assert(PandasQuery.toSql("Imputed_Rent.notnull() & (Rent > 0)")
      == "Imputed_Rent IS NOT NULL AND ((Rent IS NOT NULL AND Rent > 0))")
  }

  test("language id: null text labels null, not the first marker language") {
    import spark.implicits._
    val out = Seq((1L, null: String), (2L, "the cat and the dog is in the house"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.languageId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == null && out(2L) == "en")
  }

  test("subword count splits letter/digit boundaries") {
    val r = one("abc123 def").select(TextOps.subwordCount(col("text"))).collect()(0).getInt(0)
    assert(r == 3) // abc, 123, def
  }
}
