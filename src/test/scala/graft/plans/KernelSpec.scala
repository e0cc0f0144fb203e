package graft.plans

import graft.SparkSpec
import graft.ops.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Edge cases for the native expression kernels (registered through
  * GraftExtensions).
  */
class KernelSpec extends SparkSpec {

  test("ngram jaccard kernel: identity, disjoint, empty, null") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox", "the quick brown fox"),
      (2L, "alpha beta gamma delta", "completely different words here"),
      (3L, "", "some words at all"),
      (4L, "", ""),
      (5L, null.asInstanceOf[String], "x y z"),
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Dedup.ngramJaccard(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == Some(0.0))
    assert(out(3L) == Some(0.0))
    assert(out(4L) == Some(1.0)) // both empty -> identical (empty) shingle sets
    assert(out(5L) == None) // null input -> null (nullIntolerant)
  }

  test("ngram jaccard kernel ignores case and punctuation like the column version") {
    import spark.implicits._
    val df = Seq((1L, "Hello, World! Again & again", "hello world again again")).toDF("id", "a", "b")
    val j = df.select(Dedup.ngramJaccard(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(j == 1.0)
  }

  test("minhash/simhash kernels: null text yields null, empty text deterministic") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "a b c d e")).toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val sigs = Dedup.minHashSignatures(df).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(sigs(1L).isDefined && sigs(2L).isDefined)
    assert(sigs(3L).isEmpty)
    val sh = Dedup.simHashes(df).collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(sh(3L).isEmpty)
  }

  test("vec_dot kernel: mixed float/double sides, empty arrays") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0, 0.5, 1.0))).toDF("f", "d")
    val dot = df.select(Ann.dot(col("f"), col("d"))).collect()(0).getDouble(0)
    assert(dot == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
    val empty = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
      .select(Ann.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(empty == 0.0)
  }

  test("all four kernels compile under strict codegen (no interpreted fallback)") {
    import spark.implicits._
    // Regression for the MODULE$ Janino bug: doGenCode must emit a call
    // the generated Java can compile (static forwarder on the companion
    // class). With fallback=false a compile failure throws instead of
    // silently knocking the stage out of whole-stage codegen.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // repartition forces an exchange so the projection above it is
      // planned inside WholeStageCodegen (local relations get collapsed)
      // NB: count() would prune the kernel column and never run it —
      // aggregate over the computed value so the kernel must evaluate
      val docs = (1 to 20).map(i => (i.toLong, s"alpha beta gamma doc $i body"))
        .toDF("doc_id", "text").repartition(2)
      assert(Dedup.minHashSignatures(docs)
        .agg(count(xxhash64(col("_sig")))).collect()(0).getLong(0) == 20)
      assert(Dedup.simHashes(docs)
        .agg(count(col("_sh"))).collect()(0).getLong(0) == 20)
      assert(docs.select(Dedup.ngramJaccard(col("text"), col("text")).as("j"))
        .agg(sum(col("j"))).collect()(0).getDouble(0) == 20.0)
      val vecs = (1 to 20).map(i => (i.toLong, Seq(i.toFloat, 1.0f), Seq(1.0, i.toDouble)))
        .toDF("id", "f", "d").repartition(2)
      assert(vecs.select(Ann.dot(col("f"), col("d")).as("dot"))
        .agg(count(col("dot"))).collect()(0).getLong(0) == 20)
      assert(docs.select(call_function("shingle_hashes", col("text"), lit(3)).as("sh"))
        .agg(count(xxhash64(col("sh")))).collect()(0).getLong(0) == 20)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("shingle_hashes kernel agrees with ngram_jaccard's sets") {
    import spark.implicits._
    // |A∩B|/|A∪B| computed from the exploded hash arrays must equal the
    // pairwise kernel — same tokenizer, same rolling hash
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "a quick brown fox jumps over a sleeping dog"
    val df = Seq((a, b)).toDF("a", "b")
    val j = df.select(Dedup.ngramJaccard(col("a"), col("b"))).collect()(0).getDouble(0)
    val Array(sa, sb) = df.select(
      call_function("shingle_hashes", col("a"), lit(3)),
      call_function("shingle_hashes", col("b"), lit(3))).collect()(0)
      .toSeq.map(_.asInstanceOf[scala.collection.Seq[Long]].toSet).toArray
    assert(j == (sa & sb).size.toDouble / (sa | sb).size)
    // arrays are distinct + sorted (deterministic dumps)
    val arr = df.select(call_function("shingle_hashes", col("a"), lit(3)))
      .collect()(0).getSeq[Long](0)
    assert(arr == arr.distinct.sorted)
  }

  test("kernels work in both codegen and interpreted paths") {
    import spark.implicits._
    // local relations exercise interpreted eval; a shuffled frame
    // exercises whole-stage codegen
    val docs = (1 to 50).map(i => (i.toLong, s"token$i shared words across docs number $i"))
      .toDF("doc_id", "text")
    val local = Dedup.minHashSignatures(docs).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val shuffled = Dedup.minHashSignatures(docs.repartition(4)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(local == shuffled)
  }
}
