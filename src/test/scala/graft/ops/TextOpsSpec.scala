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

  test("repetition signals: duplicated lines and dominant bigram") {
    import spark.implicits._
    val docs = Seq(
      // "aa\naa\nbb": lines aa(×2, 2 chars each) + bb → dup 4/6
      (1L, "aa\naa\nbb"),
      // "x y x y x": bigrams "x y"(×2), "y x"(×2) → tie broken to
      // lexicographically smaller "x y"; chars = 2*3/9
      (2L, "x y x y x"),
      // no repetition anywhere
      (3L, "one two three"),
      // degenerate: empty and null
      (4L, ""),
      (5L, null: String),
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == math.round(4.0 / 6.0 * 1e6) / 1e6)
    assert(out(2L)._2 == math.round(2.0 * 3.0 / 9.0 * 1e6) / 1e6)
    assert(out(3L)._1 == 0.0)
    // "one two three": top bigram occurs once → 1*7/13
    assert(out(3L)._2 == math.round(7.0 / 13.0 * 1e6) / 1e6)
    assert(out(4L) == ((0.0, 0.0)) && out(5L) == ((0.0, 0.0)))
  }

  test("tfidf top terms: hand-computed scores, tie and k semantics") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple banana cherry dog"),
      (4L, null: String), // no terms -> no rows
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        ((r.getAs[Long]("tf"), r.getAs[Long]("n_docs_with_term"), r.getAs[Double]("score"))))
      .toMap
    // N=4 (null doc still counts in the corpus size): idf_scaled =
    // floor(ln(5/(df+1))*1e6+0.5); df: apple 2, banana 3, cherry 2, dog 1
    val idfAppleScaled = math.floor(math.log(5.0 / 3.0) * 1e6 + 0.5).toLong
    val idfDog = math.floor(math.log(5.0 / 2.0) * 1e6 + 0.5) / 1e6
    assert(out((1L, "apple")) == ((2L, 2L, (2 * idfAppleScaled).toDouble / 1e6)))
    // doc 3 has 4 distinct terms but k=3: banana (idf ln(5/4), lowest
    // score) must be cut; tie between apple and cherry (same tf, same
    // df) is broken by term asc — both survive ahead of banana
    val doc3Terms = out.keys.filter(_._1 == 3L).map(_._2).toSet
    assert(doc3Terms == Set("dog", "apple", "cherry"))
    assert(out((3L, "dog"))._3 == idfDog)
    // the null-text doc contributes no rows
    assert(!out.keys.exists(_._1 == 4L))
  }

  test("top ngrams: counts, tie order, short docs, normalization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),     // bigrams: "a b", "b a", "a b"
      (2L, "B,a"),         // normalizes to tokens [b, a] -> "b a"
      (3L, "solo"),        // single token: no bigrams
      (4L, ""),            // empty: no rows
    ).toDF("doc_id", "text")
    val out = TextOps.topNgrams(docs, n = 2, k = 10).collect()
      .map(r => (r.getAs[String]("ngram"), r.getAs[Long]("n_occurrences")))
    // "a b" x2, "b a" x2 — equal counts, lexicographic ascending
    assert(out.toSeq == Seq(("a b", 2L), ("b a", 2L)))
    // k truncates at the deterministic (count desc, ngram asc) boundary
    val top1 = TextOps.topNgrams(docs, n = 2, k = 1).collect()
      .map(r => r.getAs[String]("ngram")).toSeq
    assert(top1 == Seq("a b"))
    // trigrams
    val tri = TextOps.topNgrams(docs, n = 3, k = 10).collect()
      .map(r => (r.getAs[String]("ngram"), r.getAs[Long]("n_occurrences"))).toSeq
    assert(tri == Seq(("a b a", 1L), ("b a b", 1L)))
  }

  // ---------------------------------------------------------- winnowing

  private def winnowOf(texts: (Long, String)*): Map[Long, Seq[(Int, String)]] = {
    import spark.implicits._
    TextOps.winnowFingerprints(texts.toSeq.toDF("doc_id", "text"), k = 3, w = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Int]("pos"), r.getAs[String]("fp"))))
      .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSeq.sorted }
  }

  test("winnowing edge cases: short docs") {
    // < k tokens: no shingles, no fingerprints
    assert(winnowOf((1L, "a b")).isEmpty)
    // exactly k tokens: one shingle, m=1 < w -> one whole-doc window, one selection at pos 0
    val exact = winnowOf((1L, "a b c"))(1L)
    assert(exact.map(_._1) == Seq(0))
    // m=4 shingles == w: exactly one window start (pos 0), one selected fingerprint
    val one = winnowOf((1L, "a b c d e f"))(1L)
    assert(one.size == 1 && one.head._1 >= 0 && one.head._1 <= 3)
  }

  test("winnowing coverage guarantee: every w-window of shingles contains a selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val docs = (1L to 8L).map(i => (i, Seq.fill(20 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")))
    val sel = winnowOf(docs: _*)
    docs.foreach { case (id, text) =>
      val m = text.split(" ").length - 3 + 1 // shingle count, k=3
      val positions = sel(id).map(_._1).toSet
      (0 to math.max(m - 4, 0)).foreach { i =>
        assert(positions.exists(p => p >= i && p < i + 4),
          s"doc $id: window starting at $i has no selected fingerprint (m=$m, sel=$positions)")
      }
      // density: winnowing selects far fewer than all shingles on long docs
      if (m > 10) assert(positions.size < m)
    }
  }

  test("winnowing detection guarantee: docs sharing a w+k-1 token run share a fingerprint") {
    import spark.implicits._
    // 6 shared tokens (w+k-1 = 4+3-1) embedded in fully distinct contexts
    val shared = "q1 q2 q3 q4 q5 q6"
    val docs = Seq(
      (1L, s"x1 x2 x3 x4 $shared y1 y2 y3"),
      (2L, s"z1 z2 $shared u1 u2 u3 u4 u5 u6"))
    val pairs = TextOps.winnowNearDups(docs.toDF("doc_id", "text"),
      k = 3, w = 4, minShared = 1, maxDf = 20).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("doc_a") == 1L && pairs(0).getAs[Long]("doc_b") == 2L)
  }

  test("winnowing near-dups: maxDf drops boilerplate fingerprints") {
    import spark.implicits._
    // one unique head token, then an identical 8-token boilerplate tail:
    // every window past the head holds only shared shingles, so every
    // SHARED fingerprint is selected by all 6 docs (df exactly 6); the
    // head shingle is doc-unique (df 1) and can never pair
    val docs = (1L to 6L).map(i => (i, s"u$i aa bb cc dd ee ff gg hh"))
    val capped = TextOps.winnowNearDups(docs.toDF("doc_id", "text"),
      k = 3, w = 4, minShared = 1, maxDf = 5).collect() // shared fps df=6 > 5 -> dropped
    assert(capped.isEmpty)
    val uncapped = TextOps.winnowNearDups(docs.toDF("doc_id", "text"),
      k = 3, w = 4, minShared = 1, maxDf = 6).collect()
    assert(uncapped.length == 15) // all C(6,2) pairs share the boilerplate mins
  }

  test("incremental near-dups equal the one-shot run restricted to cross pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    // random docs + planted near-dup pairs crossing the base/increment boundary
    val noise = (1L to 30L).map(i =>
      (i, Seq.fill(15 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")))
    val planted = Seq(
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 x3a x3b"),
      (25L, "z1 z2 p1 p2 p3 p4 p5 p6 p7 p8"), // crosses the boundary with doc 3
      (26L, "q1 q2 q3 q4 q5 q6 q7 q8 y1 y2"),
      (28L, "y9 q1 q2 q3 q4 q5 q6 q7 q8"))    // new-new pair: must NOT appear
    val docs = (noise.filterNot(d => planted.exists(_._1 == d._1)) ++ planted).toDF("doc_id", "text")
    val bound = 20L
    val oneShot = TextOps.winnowNearDups(docs, minShared = 1, maxDf = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(t => t._1 < bound && t._2 >= bound)
    val index = TextOps.winnowIndex(docs.where($"doc_id" < bound))
    val inc = TextOps.incrementalNearDups(docs.where($"doc_id" >= bound), index,
      minShared = 1, maxDf = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == oneShot)
    assert(inc.exists { case (a, b, _) => a == 3L && b == 25L }) // the planted cross pair surfaced
    assert(!inc.exists(_._1 >= bound)) // increment-internal pairs are out of contract
    assert(!inc.exists(t => t._1 == 26L && t._2 == 28L)) // the planted new-new pair stays out
  }

  test("winnowing is deterministic and the kernel path plans ZERO exchanges") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta iota kappa doc$i"))
    val a = winnowOf(docs: _*)
    val b = winnowOf(docs: _*)
    assert(a == b)
    // document-local computation: scan -> project -> explode, no shuffle
    val plan = TextOps.winnowFingerprints(docs.toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kernel path must be shuffle-free, plan:\n$plan")
    // the windowed sibling shares ONE doc_id exchange across its three
    // window specs (+1 for the distinct's aggregate exchange)
    val wplan = TextOps.winnowFingerprintsWindowed(docs.toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(wplan).size
    assert(exchanges <= 2, s"expected <= 2 exchanges, plan:\n$wplan")
  }

  test("native winnow kernel is bit-identical to the windowed formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st")
    val hostile = Seq(
      (100L, ""), (101L, "   "), (102L, "a b"), (103L, "a b c"),
      (104L, "Unicode éü中文 tab\there and MORE case"),
      (105L, "punct!!! heavy??? text,,, with... breaks"),
      (106L, "x " * 50), // degenerate repetition: every shingle identical
      (107L, null.asInstanceOf[String]))
    val docs = ((1L to 40L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(60))(words(rnd.nextInt(words.size))).mkString(" "))) ++ hostile)
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (2, 5), (1, 3), (4, 1))) {
      val kern = TextOps.winnowFingerprints(docs, k, w).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val wind = TextOps.winnowFingerprintsWindowed(docs, k, w).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(kern == wind, s"kernel != windowed for k=$k w=$w")
    }
  }
}
