package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("redactPii replaces emails, phones, IPv4s and leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+x@sub.example.org thanks"),
      (2L, "call 555-123-4567 or 800.555.0100 now"),
      (3L, "host 192.168.1.254 is down"),
      (4L, "perfectly clean prose with no identifiers"),
    ).toDF("id", "text").select(col("id"), Curation.redactPii(col("text")).as("r"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "reach me at <EMAIL> thanks")
    assert(m(2L) == "call <PHONE> or <PHONE> now")
    assert(m(3L) == "host <IP> is down")
    assert(m(4L) == "perfectly clean prose with no identifiers")
  }

  test("contaminationCheck finds n-gram overlap with a probe, skips unrelated docs") {
    import spark.implicits._
    val probeText = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (10L, s"prefix words then $probeText and a suffix"), // contains the probe verbatim
      (11L, "completely different content about spark catalyst plans"),
    ).toDF("doc_id", "text")
    val probes = Seq((1L, probeText)).toDF("probe_id", "text")
    val hits = Curation.contaminationCheck(docs, probes, k = 3, minShared = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("probe_id"), r.getAs[Long]("n_shared")))
    assert(hits.length == 1)
    val (d, p, n) = hits.head
    // the probe has 7 3-shingles, all present verbatim in doc 10
    assert(d == 10L && p == 1L && n == 7L)
    // the act half: the flagged doc is removed, the clean one kept
    val remaining = Curation.decontaminate(docs, probes, k = 3, minShared = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(remaining == Set(11L))
  }

  test("contamination plan: probe side broadcast, corpus side never hinted") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val docs = (0L until 100L).map(i => (i, s"some document body number $i with words")).toDF("doc_id", "text")
    val probes = Seq((1L, "benchmark item text")).toDF("probe_id", "text")
    val out = Curation.contaminationCheck(docs, probes)
    val hints = out.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    // exactly one hint, and it must be the probe side (carries probe_id),
    // never the corpus (which is unbounded at 100 TB)
    assert(hints.length == 1, s"expected exactly the probe-side hint, got ${hints.length}")
    assert(hints.head.child.output.exists(_.name == "probe_id"),
      "the broadcast hint must sit on the benchmark/probe side")
  }

  test("hashSample is deterministic, key-stable, and close to the target rate") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("doc_id")
    val a = Curation.hashSample(df, 0.25).collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(df, 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b, "same keys, same fraction -> identical sample")
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03, s"rate off: ${a.size}/4000")
    // monotone: a smaller fraction selects a subset of a larger one
    val small = Curation.hashSample(df, 0.10).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
    // boundary rates
    assert(Curation.hashSample(df, 1.0).count() == 4000L)
    assert(Curation.hashSample(df, 0.0).count() == 0L)
  }

  test("mixSources applies per-source rates and drops unlisted sources") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = Curation.mixSources(df, Map("src0" -> 1.0, "src1" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") == 1000, "rate-1.0 source kept whole")
    assert(math.abs(bySrc("src1") / 1000.0 - 0.5) < 0.06)
    assert(!bySrc.contains("src2"), "unlisted source dropped")
  }

  test("packShards fills 10-token shards greedily per stratum") {
    import spark.implicits._
    // srcA docs: 4, 5, 4, 9 tokens -> exclusive prefix sums 0,4,9,13 -> shards 0,0,0,1
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "A", words(4)), (2L, "A", words(5)), (3L, "A", words(4)), (4L, "A", words(9)),
      (5L, "B", words(11)), (6L, "B", words(2)),
    ).toDF("doc_id", "source", "text")
    val out = Curation.packShards(df, budget = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"), r.getAs[Int]("shard"))).toMap
    assert(out(1L) == (4L, 0) && out(2L) == (5L, 0) && out(3L) == (4L, 0))
    assert(out(4L) == (9L, 1), "13 tokens already consumed -> second shard")
    // stratum B packs independently: 0 -> shard 0, then 11 consumed -> shard 1
    assert(out(5L) == (11L, 0) && out(6L) == (2L, 1))
  }

  test("chunkDocuments: overlapping token windows with short tail") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3: [0..3], [3..6], [6..9], [9]
    val df = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, chunkTokens = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(out.keySet.map(_._1) == Set(1L), "empty/null docs yield no chunks")
    assert(out((1L, 0)) == ((4, "t0 t1 t2 t3")))
    assert(out((1L, 1)) == ((4, "t3 t4 t5 t6")))
    assert(out((1L, 2)) == ((4, "t6 t7 t8 t9")))
    assert(out((1L, 3)) == ((1, "t9")))
  }

  test("assignSplit labels every row, near the target fractions, consistent with hashSample") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    val out = Curation.assignSplit(df, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 2000L, "every row must carry exactly one label")
    assert(out("train") > 1500 && out("train") < 1700, s"train ~80%: $out")
    assert(out("val") > 120 && out("val") < 280, s"val ~10%: $out")
    // the train split IS the 0.8 hash sample — same keys, same space
    val sampled = Curation.hashSample(df, 0.8).collect().map(_.getLong(0)).toSet
    val trained = Curation.assignSplit(df, Seq("train" -> 0.8, "rest" -> 0.2))
      .where(col("split") === "train").collect().map(_.getLong(0)).toSet
    assert(sampled == trained)
    // interior thresholds are decimal-exact: train+val of a 0.7/0.2/0.1
    // split lands on hashSampleThreshold(0.9) exactly (not the float sum
    // 0.8999999999999999, which only coincidentally floors to the same
    // bucket), so train ∪ val equals the 0.9 hash sample KEY-FOR-KEY
    val threeWay = Curation.assignSplit(df, Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1))
      .where(col("split") =!= "test").collect().map(_.getLong(0)).toSet
    val nine = Curation.hashSample(df, 0.9).collect().map(_.getLong(0)).toSet
    assert(threeWay == nine)
  }

  test("chunkDocuments: disjoint packing when stride equals window") {
    import spark.implicits._
    val df = Seq((1L, (0 until 7).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, chunkTokens = 3, stride = 3).collect()
      .map(r => r.getInt(1) -> r.getString(3)).toMap
    assert(out == Map(0 -> "t0 t1 t2", 1 -> "t3 t4 t5", 2 -> "t6"))
  }

  test("stratifiedSample: exact k per stratum, whole stratum when smaller, nested prefixes") {
    import spark.implicits._
    val df = ((1L to 40L).map(i => (i, "big")) ++ (100L to 102L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val out = Curation.stratifiedSample(df, k = 5).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rank")))
    assert(out.count(_._1 == "big") == 5)
    assert(out.count(_._1 == "small") == 3) // stratum smaller than k: keep all
    assert(out.filter(_._1 == "big").map(_._3).sorted.toSeq == (1 to 5))
    // determinism + prefix nesting: the k=3 sample IS ranks 1..3 of the k=5 sample
    val k3 = Curation.stratifiedSample(df, k = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(k3 == out.filter(_._3 <= 3).map(t => (t._1, t._2)).toSet)
  }

  test("stratifiedSample plans a WindowGroupLimit (map-side per-stratum top-k)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val plan = Curation.stratifiedSample(df, k = 4).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter should push a per-group limit below the exchange:\n$plan")
  }
}
