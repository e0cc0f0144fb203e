package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import Dedup._

  private def docs() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in the tall green trees beside the quiet water"
    val nearDup = base.replace("quick", "fast") // one-token mutation
    val other = "completely different content about database engines and query " +
      "optimization with columnar storage formats and vectorized execution models"
    Seq(
      (1L, base), (2L, nearDup), (3L, other), (4L, base), // 4 = exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical normalized content") {
    val d = TextOps.exactDedup(docs())
    val byId = d.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_count")).toMap
    assert(byId(1L) == 2L) // docs 1 and 4 collapse, min id kept
    assert(d.count() == 3)
  }

  test("minhash LSH finds planted near-duplicate pair") {
    val pairs = minHashPairs(docs(), numHashes = 64, bands = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("est_jaccard")).toMap
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing from $pairs")
    assert(pairs((1L, 2L)) > 0.5)
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("minhash signatures are deterministic across runs") {
    val s1 = minHashSignatures(docs()).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val s2 = minHashSignatures(docs()).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(s1 == s2)
    assert(s1(1L) == s1(4L)) // identical docs, identical signatures
  }

  test("simhash: identical docs distance 0, near-dups close, unrelated far") {
    val sh = simHashes(docs()).collect().map(r => r.getAs[Long]("doc_id") -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) < 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 16)
  }

  test("simhash candidates include the near-dup pair") {
    val c = simHashCandidates(docs(), maxDistance = 16).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(c.contains((1L, 2L)))
    assert(c.contains((1L, 4L)))
  }

  test("simhash banding pigeonhole: candidates cover ALL pairs within distance bands-1") {
    import spark.implicits._
    // random-ish corpus: brute-force every pair's Hamming distance and
    // assert the banded candidate set is a superset at the guaranteed
    // bound (bands-1), for both 4x16 and 8x8 configurations
    val corpus = (1 to 60).map(i =>
      (i.toLong, s"shared base text ${"word " * (i % 7)} plus variant token$i and tail ${i % 5}"))
      .toDF("doc_id", "text")
    val sh = simHashes(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allPairs = for {
      a <- sh.keys.toSeq; b <- sh.keys.toSeq if a < b
    } yield (a, b, java.lang.Long.bitCount(sh(a) ^ sh(b)))
    for (bands <- Seq(4, 8)) {
      val bound = bands - 1
      val expected = allPairs.collect { case (a, b, d) if d <= bound => (a, b) }.toSet
      val got = simHashCandidates(corpus, maxDistance = bound, bands = bands)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.subsetOf(got),
        s"bands=$bands missed ${expected.diff(got)} (pigeonhole violated)")
    }
  }

  test("hot-bucket cap: all-identical corpus yields a linear star, not a quadratic bucket") {
    import spark.implicits._
    // 300 identical docs put ALL rows in one (band,key) bucket per band;
    // uncapped that is a 300²/2-pair self-join per band. With the cap the
    // oversized buckets are excluded from the pairwise join and recovered
    // by the full-hash star pass: exactly n-1 pairs, every doc linked to
    // the min id — downstream keepRepresentatives / duplicateClusters
    // still collapse the whole group.
    val same = "tuesday report all systems nominal and no anomalies were observed overnight"
    val distinct1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val distinct2 = distinct1.replace("quick", "fast")
    val corpus = ((1 to 300).map(i => (i.toLong, same)) ++
      Seq((900L, distinct1), (901L, distinct2))).toDF("doc_id", "text")
    val window = 8
    val out = simHashCandidates(corpus, maxDistance = 63, bands = 8, maxBucketSize = 50,
      neighborWindow = window)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    // the star links EVERY identical doc to the min id at hamming 0
    val stars = out.filter { case (a, b, _) => a == 1L && b <= 300L }
    assert(stars.length == 299, s"expected 299 star links, got ${stars.length}")
    assert(stars.forall(_._3 == 0), "star links must be hamming 0")
    // the distinct near-dup pair lives in small buckets and is still found pairwise
    assert(out.exists { case (a, b, _) => a == 900L && b == 901L },
      s"near-dup pair lost to the cap: ${out.length} pairs")
    // nothing quadratic leaked through: star (n-1) + sorted-neighbor
    // (≤ n·window) + the pairwise pair — linear in n, NOT 300²/2 = 44850
    assert(out.length <= 299 + 302 * window + 1,
      s"cap failed to bound the join: ${out.length} pairs")
  }

  test("hot-bucket sorted-neighbor pass recovers a hamming 1..k pair the cap would sacrifice") {
    import spark.implicits._
    // 300 identical docs make every one of their 8 (band,key) buckets hot
    // (> cap). A near-variant doc shares the hot buckets on its unchanged
    // bands and is ALONE in its others — so the capped pairwise join can
    // never see it, and the full-hash star skips it (different hash).
    // Only the sorted-neighbor pass inside the hot buckets can link it.
    val same = "tuesday report all systems nominal and no anomalies were observed overnight"
    val variant = same + " almost"
    val corpus = ((1 to 300).map(i => (i.toLong, same)) :+ (500L, variant))
      .toDF("doc_id", "text")
    // deterministic kernel -> the variant's hamming distance is a fixed
    // property of the two texts; measure it rather than hardcode
    val hashes = simHashes(corpus).where(col("doc_id").isin(1L, 500L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("_sh")).toMap
    val h = java.lang.Long.bitCount(hashes(1L) ^ hashes(500L))
    assert(h >= 1, "variant text must not simhash-collide for this test to bite")
    val out = simHashCandidates(corpus, maxDistance = h, bands = 8, maxBucketSize = 50,
      neighborWindow = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    val variantPairs = out.filter { case (a, b, _) => a == 500L || b == 500L }
    assert(variantPairs.nonEmpty, s"hamming-$h pair inside the hot bucket was sacrificed")
    assert(variantPairs.forall(_._3 == h), s"recovered pair must carry hamming $h")
  }

  test("keepRepresentatives drops near-dup copies, keeps first") {
    val pairs = minHashPairs(docs(), numHashes = 64, bands = 16)
      .where(col("est_jaccard") > 0.5).select("id_a", "id_b")
    val kept = keepRepresentatives(docs(), pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(3L))
    assert(!kept.contains(2L) && !kept.contains(4L))
  }

  test("duplicate clusters: chains collapse to the minimum id exactly") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; singleton 20
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("duplicate clusters: diameter far beyond the round count still labels exactly") {
    import spark.implicits._
    // a path graph of diameter 40 (0-1-2-...-40) — the shape that breaks
    // O(diameter) neighbor-min propagation capped at ~10 rounds; the
    // large-star/small-star alternation must collapse it in O(log² n)
    // rounds to the single minimum. Ids are presented in reversed pair
    // order so no accident of initial orientation can shortcut the test.
    val n = 40
    val ids = (0 to n).map(_.toLong).toDF("doc_id")
    val pairs = (0 until n).map(i => ((i + 1).toLong, i.toLong)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == n + 1)
    assert(clusters.values.forall(_ == 0L),
      s"every node of the path must label 0, got: ${clusters.filter(_._2 != 0L)}")
  }

  test("hot-bucket cap on a random corpus: no false pairs; hamming-0 components preserved") {
    import spark.implicits._
    // tiny vocabulary => many identical/near-identical docs => hot
    // (band, key) buckets well past the cap, exercising the star +
    // sorted-neighbor recovery passes on arbitrary data
    val rnd = new scala.util.Random(424242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 80).map { i =>
      val n = 3 + rnd.nextInt(4)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    def run(cap: Int) = Dedup.simHashCandidates(docs, maxDistance = 3, bands = 4,
      maxBucketSize = cap, neighborWindow = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = run(0)
    val capped = run(5)
    // the cap may SACRIFICE distant pairs but must never invent one
    assert(capped.subsetOf(exact),
      s"capped emitted pairs outside exact semantics: ${capped.diff(exact)}")
    // hamming-0 recall contract: star links close transitively, so the
    // capped distance-0 edge set must induce EXACTLY the equal-hash
    // components the exact run induces
    def components(ps: Set[(Long, Long, Int)]): Map[Long, Long] = {
      val parent = Array.tabulate(80)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      ps.filter(_._3 == 0).foreach { case (a, b, _) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until 80).map(i => i.toLong -> find(i).toLong).toMap
    }
    assert(components(capped) == components(exact))
  }

  test("duplicate clusters: random graph matches a union-find oracle") {
    import spark.implicits._
    // arbitrary topology (cycles, stars, chains, isolated nodes mixed) —
    // fixed seed for reproducibility; the oracle is driver-side
    // union-find with union-by-min, whose roots are exactly the
    // component minima the distributed labeling must produce
    val rnd = new scala.util.Random(12345)
    val n = 300
    val edges = Seq.fill(400)((rnd.nextInt(n), rnd.nextInt(n))).filter(p => p._1 != p._2)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = (0 until n).map(_.toLong).toDF("doc_id")
    val pairs = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    assert(got == expected)
  }

  test("duplicate clusters: filesystem-checkpointed rounds label exactly and clean up") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    // the same diameter-40 path graph, but every round materialized to
    // parquet: lineage (and recovery) is cut at the filesystem
    val n = 40
    val ids = (0 to n).map(_.toLong).toDF("doc_id")
    val pairs = (0 until n).map(i => ((i + 1).toLong, i.toLong)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == n + 1 && clusters.values.forall(_ == 0L))
    // rolling cleanup: only the final round's files may remain
    val rounds = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(rounds.count(_.startsWith("cc_round_")) == 1,
      s"previous rounds must be deleted as the loop advances, found $rounds")
  }

  test("checkpoint mode writes round files even for already-forest inputs") {
    import spark.implicits._
    // isolated pairs are already a star forest — the cache-mode fast
    // path may skip contraction, but checkpoint mode must still write
    // (the returned plan's contract is files-on-disk, not lineage)
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_ff").toString
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("cc_round_")),
      "checkpoint mode must materialize the result to the filesystem")
  }

  test("duplicate clusters: managed handle releases the star-forest cache") {
    import spark.implicits._
    // earlier tests run unmanaged pipelines whose caches are session-
    // lifetime BY DESIGN; drop them so the emptiness assertion below
    // sees only what THIS test's handle pinned
    spark.catalog.clearCache()
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val handle = StorageHandle()
    val out = Dedup.duplicateClusters(ids, pairs, handle = handle).collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    handle.release(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "release() must drop every cached frame the clustering pinned")
  }

  test("paragraph dedup: first occurrence wins, blanks exempt, empty docs drop out") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha\n\nshared footer"),
      (2L, "beta\nshared footer\n\nbeta"),   // footer dup'd from doc 1; 2nd "beta" dups its own 1st
      (3L, "alpha"),                          // fully duplicated -> drops out
      (4L, " \ngamma"),                       // blank-ish paragraph kept even though doc 1 had a blank
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\n\nshared footer",
      2L -> "beta\n",                          // trailing blank survives, dup'd footer + repeat beta gone
      4L -> " \ngamma",
    ), s"got $out")
  }

  test("frequent-line removal: df > maxDf drops ALL copies, boundary survives, blanks exempt") {
    import spark.implicits._
    // "boiler" appears in 3 distinct docs (doc 2 twice — still df 3);
    // "edge" in exactly 2; "  boiler  " trims to the frequent key.
    val df = Seq(
      (1L, "alpha\nboiler\nedge"),
      (2L, "boiler\nbeta\nboiler"),
      (3L, "  boiler  \n\ngamma"),
      (4L, "edge\ndelta"),
      (5L, "boiler"),                 // only-boilerplate doc -> vanishes
    ).toDF("doc_id", "text")
    val out = Dedup.removeFrequentLines(df, maxDf = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\nedge",            // edge df=2 = maxDf -> survives (strict >)
      2L -> "beta",
      3L -> "\ngamma",                // blank kept; trimmed-match drops the padded copy
      4L -> "edge\ndelta",
    ), s"got $out")
  }

  test("frequent-line removal differs from first-occurrence dedup on the first copy") {
    import spark.implicits._
    val df = Seq((1L, "footer\na"), (2L, "footer\nb"), (3L, "footer\nc"))
      .toDF("doc_id", "text")
    val freq = Dedup.removeFrequentLines(df, maxDf = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = Dedup.dedupParagraphs(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(freq == Map(1L -> "a", 2L -> "b", 3L -> "c"), s"got $freq")
    assert(first(1L) == "footer\na", s"got $first") // first copy survives there
  }

  test("exact ngram jaccard verifies candidates") {
    import spark.implicits._
    val df = docs().as("a").join(docs().as("b"),
      col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(ngramJaccard(col("a.text"), col("b.text")).as("j"))
    val j = df.collect()(0).getDouble(0)
    assert(j > 0.7 && j < 1.0)
  }

  test("near-dup auto-routing: cool corpus routes simhash, saturated routes minhash") {
    import spark.implicits._
    // cool: 4 docs — every census bucket is tiny at any positive cap
    assert(!simHashSaturated(docs(), maxBucketSize = 10))
    val (coolRoute, coolCands) = nearDupsAuto(docs(), maxBucketSize = 10)
    assert(coolRoute == "simhash")
    val coolPairs = coolCands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coolPairs.contains((1L, 4L)), s"exact-dup pair missing from $coolPairs")
    // saturated by DENSITY: 3000 distinct docs spread over the 2048
    // (band, key) buckets put the mean bucket at 3000·8/2048 ≈ 11.7,
    // and max ≥ mean > 8 = 8·cap at cap = 1 — the pigeonhole makes the
    // verdict deterministic, no tuning
    val sat = (1 to 3000).map(i => (i.toLong, s"token$i alpha beta gamma delta sample text $i"))
      .toDF("doc_id", "text")
    assert(simHashSaturated(sat, maxBucketSize = 1))
    val (satRoute, _) = nearDupsAuto(sat, maxBucketSize = 1)
    assert(satRoute == "minhash")
    // the threshold is the sub-band regime bound (8·cap), derived not
    // tuned: the same corpus under a cap that absorbs its buckets is cool
    assert(!simHashSaturated(sat, maxBucketSize = 3000))
  }
}
