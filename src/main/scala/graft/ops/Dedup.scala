package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection at corpus scale: MinHash+LSH banding, SimHash,
  * and exact n-gram Jaccard verification. Everything is built from native
  * higher-order functions (transform/aggregate/zip_with + xxhash64) so the
  * hot path stays in codegen — no UDFs, no driver loops, and crucially
  * NEVER an all-pairs comparison: candidate generation is a hash-bucket
  * self-join on LSH band keys, so cost is O(n·bands + Σ bucket²) with
  * bucket sizes bounded by collision probability, not O(n²).
  */
object Dedup {

  /** Compute-heavy projections (signatures) are CPU-bound per row; when
    * the input arrives as a handful of small files (fewer partitions than
    * cores) the work serializes onto one task. Scatter to the session's
    * parallelism first — at real corpus scale the input already has
    * enough partitions and this no-ops.
    *
    * The partition estimate comes from the optimizer's size statistics
    * (sizeInBytes / files.maxPartitionBytes — exactly how the file scan
    * itself splits), NOT from `df.rdd`: building the RDD materializes a
    * physical plan + lineage per call, which round-4/5 profiling showed
    * as pure overhead on every signature stage.
    */
  private[graft] def scatter(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Plans without real stats report defaultSizeInBytes (Long.MaxValue):
    // the estimate is meaningless there, so fall back to the physical
    // partition-count probe (costs an RDD lineage, but file scans always
    // carry real stats so this branch is rare). Compare as BigInt: join
    // estimates can exceed Long range and .toLong would wrap negative.
    val few =
      if (sizeBytes >= BigInt(spark.sessionState.conf.defaultSizeInBytes))
        df.rdd.getNumPartitions < target
      else sizeBytes / maxPartBytes + 1 < target
    if (few) df.repartition(target) else df
  }

  /** Word k-shingles of the normalized text (k consecutive tokens joined
    * by a space). Documents shorter than k tokens yield their whole text
    * as the single shingle.
    *
    * PERF: this is a higher-order-function expression and evaluates
    * INTERPRETED — fine for inspection/debugging at small scale, but
    * never use it in a per-row hot path: every internal pipeline
    * (minhash, contamination) goes through the codegen'd kernels
    * (`minhash_text`, `shingle_hashes`) instead, which are ~60×
    * faster and carry 8-byte hashes rather than shingle strings.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextOps.tokens(regexp_replace(lower(text), "[^a-z0-9\\s]+", " "))
    val n = size(toks)
    when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - k + 1),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: `numHashes` independent permutations approximated
    * by seeded xxhash64; signature[i] = min over shingles of
    * hash(shingle, i).
    *
    * Computed as explode(shingles) -> hash aggregate with `numHashes`
    * partial-min aggregates — NOT as `numHashes` array-transforms over the
    * shingle expression (which duplicates the tokenize+concat subtree 64×
    * and blows codegen out of whole-stage limits). Map-side partial mins
    * make the shuffle tiny (one row per doc), so this scales linearly.
    */
  def minHashSignatures(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      k: Int = 3,
  ): DataFrame = {
    // One native kernel per row (graft.plans.MinHashText via
    // GraftExtensions): normalize -> tokenize -> rolling k-shingle
    // hashes -> numHashes running minima, zero shuffles. The
    // higher-order-function formulations (transform/aggregate) evaluate
    // INTERPRETED in Spark and were measured ~100× slower at sf0.1.
    scatter(df).select(col(idCol),
      call_function("minhash_text", col(textCol), lit(numHashes), lit(k)).as("_sig"))
  }

  /** LSH band keys: the signature split into `bands` bands of
    * `numHashes/bands` rows each; each band hashed to one bucket key.
    * Two documents share a band key iff that band of their signatures
    * matches exactly — P(candidate) ≈ 1-(1-j^r)^b for Jaccard j.
    */
  def bandKeys(signature: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    require(bands * r == numHashes, s"bands=$bands must divide numHashes=$numHashes")
    // static unrolling with element_at keeps this in codegen — a
    // transform/slice formulation evaluates interpreted (higher-order
    // functions have no doGenCode)
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(((b * r) until ((b + 1) * r)).map(i => element_at(signature, i + 1)) :+ lit(b): _*).as("key"))
    }: _*)
  }

  /** Candidate near-duplicate pairs via banded LSH. Returns distinct
    * (idCol_a, idCol_b) with a < b plus the estimated Jaccard from
    * signature agreement. The self-join is on (band, key) — an equi
    * shuffle join on a high-cardinality key, the 100 TB-safe shape.
    */
  def minHashCandidates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      bands: Int = 16,
      k: Int = 3,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): DataFrame =
    minHashPairs(df, textCol, idCol, numHashes, bands, k, handle).select("id_a", "id_b")

  /** Candidate pairs with the MinHash Jaccard estimate (fraction of
    * agreeing signature positions).
    */
  def minHashPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 64,
      bands: Int = 16,
      k: Int = 3,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): DataFrame = {
    // persist signatures: computed once, reused by both join sides and
    // the estimate join (one small row per document — the thing you'd
    // write to disk at corpus scale)
    val sigs = handle.persist(minHashSignatures(df, textCol, idCol, numHashes, k))
    // candidate generation on SLIM rows (id, band, key) only: band
    // collisions at low jaccard can be ~1000× the final pair count, so
    // the wide signature arrays must not ride through this join
    val banded = sigs.select(col(idCol),
      explode(bandKeys(col("_sig"), numHashes, bands)).as("_band"))
      .select(col(idCol), col("_band.band").as("_b"), col("_band.key").as("_k"))
    val a = banded.select(col(idCol).as("id_a"), col("_b"), col("_k"))
    val b = banded.select(col(idCol).as("id_b"), col("_b"), col("_k"))
    // persist: the pair set feeds both the participant-id prune and the
    // final estimate join
    val candidates = handle.persist(a.join(b, Seq("_b", "_k"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct())
    // signature agreement only for surviving distinct pairs: prune the
    // cached signatures to pair participants. Unmanaged mode materializes
    // the pair-bounded result and releases the FULL-CORPUS signature
    // cache eagerly (the largest cached intermediate — same discipline as
    // Ann.cosineNearDupPairs); a managed handle stays lazy and defers
    // every release to the caller.
    val pairIds = candidates.select(col("id_a").as(idCol))
      .union(candidates.select(col("id_b").as(idCol))).distinct()
    val pruned = handle.persist(sigs.join(pairIds, Seq(idCol), "left_semi"))
    if (!handle.managed) {
      pruned.count()
      sigs.unpersist()
    }
    val sa = pruned.select(col(idCol).as("id_a"), col("_sig").as("_sig_a"))
    val sb = pruned.select(col(idCol).as("id_b"), col("_sig").as("_sig_b"))
    // static unrolling (numHashes is a plan-time constant): the
    // aggregate(zip_with(...)) form runs BOTH lambdas interpreted per
    // surviving pair — this chain of element_at comparisons stays in
    // whole-stage codegen
    val agree = (0 until numHashes).map { i =>
      when(element_at(col("_sig_a"), i + 1) === element_at(col("_sig_b"), i + 1), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    candidates.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), (agree / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** 64-bit SimHash per document: bit i of the result is the sign of
    * Σ_tokens (bit i of the token hash ? +1 : -1). One native kernel
    * call per row (graft.plans.SimHashText via GraftExtensions) — no
    * shuffle, no interpreted higher-order functions.
    */
  def simHashes(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
  ): DataFrame =
    scatter(df).select(col(idCol),
      call_function("simhash_text", col(textCol)).as("_sh"))

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: bucket by the `bands` equal bit-slices
    * of the 64-bit hash (any pair within Hamming distance `bands - 1`
    * shares at least one exact slice — pigeonhole), then verify distance
    * ≤ maxDistance. Equi-join on bucket keys, never all-pairs.
    *
    * Pick `bands` from the distance bound you need: 4×16-bit slices
    * guarantee recall to distance 3; 8×8-bit to distance 7. More bands
    * = stronger guarantee but smaller key space (2^(64/bands)) and so
    * quadratically more bucket collisions.
    *
    * `maxBucketSize` (> 0 to enable) is the hot-bucket cap that makes
    * the self-join safe at corpus scale: templated corpora concentrate
    * SimHash bytes (the sf0.1 testdata puts 22% of all documents into
    * ONE (band,key) bucket at bands=8), so Σ bucket² grows quadratically
    * with corpus size unless bounded. Buckets larger than the cap are
    * excluded from the pairwise join — capping the join at
    * Σ bucket² ≤ n·cap, linear in n — and recovered by two linear
    * passes over the oversized buckets' members:
    *
    *   1. a FULL-HASH STAR: members grouped by the full 64-bit hash,
    *      everyone linked to the group's min id — hamming-0 recall
    *      inside hot buckets is COMPLETE (as rep->member links, which
    *      close transitively), linear in group size;
    *   2. a SORTED-NEIGHBOR pass: within each oversized bucket, members
    *      sorted by full hash and each compared to its next
    *      `neighborWindow` neighbors (the sorted-window technique of
    *      Manku et al.'s SimHash dedup) — recovers hamming
    *      1..maxDistance pairs whose remaining bits sort nearby, at
    *      cost hot-membership × window, linear in n;
    *   3. a SUB-BAND pass: each oversized bucket's members re-bucket by
    *      8 slices of the REMAINING 64−width bits (7-bit slices at
    *      bands = 8), and sub-buckets back under the cap run the
    *      ordinary pairwise join. This keeps the pigeonhole guarantee
    *      alive INSIDE hot buckets: a pair at hamming ≤ 7 total has ≤ 7
    *      differing bits in the 56 non-band bits, which cannot corrupt
    *      all 8 sub-slices — so it shares a clean sub-slice and meets
    *      in that sub-bucket (unless the sub-bucket is itself still
    *      hot, where the sorted-neighbor window applies within the
    *      refined group). Cost is bounded exactly like the main join:
    *      Σ sub-bucket² ≤ (8·hot-membership)·cap. Added after the 100×
    *      sweep measured the residual for real: at 500k docs the
    *      corpus's agreeing-band buckets crossed the cap (1603–2541
    *      members vs cap 1000) and 61/255 true pairs fell into the
    *      sacrificed tail; all 61 carried an agreeing sub-slice, and
    *      this pass restores them (SCALE.md round 15). The pass is
    *      gated to the CAP-ADJACENT regime (parent ≤ 8·cap) — round 16
    *      measured why on both sides; see the pass-3 comment.
    *
    * The residual sacrificed tail, in the CAP-ADJACENT regime the
    * sub-band pass covers (hot buckets of size ≤ 8·maxBucketSize), is
    * pairs at distance 1..maxDistance that meet ONLY inside oversized
    * buckets, disagree on EVERY sub-slice there (possible only at
    * hamming ≥ 8 — outside the banding guarantee to begin with), and
    * sort more than `neighborWindow` apart in every hot (sub-)bucket.
    * (One birthday-negligible caveat: an xxhash64 sub-key collision
    * (~2^-13/run) that pushes a merged sub-bucket past maxBucketSize
    * can demote a cool sub-bucket and sacrifice hamming ≤ 7 pairs —
    * the characterization above holds up to that probability.)
    * Buckets hotter than 8·maxBucketSize fall back to the
    * star+sorted-neighbor passes alone, where pairs at any hamming
    * 1..maxDistance can still be sacrificed if their hashes sort more
    * than `neighborWindow` apart — MEASURED at sf100 as 65.2% recall
    * with perfect precision at full saturation (SCALE.md round 16);
    * at that density the recall contract belongs to MinHash banding.
    * With the cap the output is a documented subset; with
    * maxBucketSize = 0 semantics are exact.
    */
  /** The banding projection shared by [[simHashCandidates]] and
    * [[simHashBucketCensus]]: one row per (doc, band) carrying the
    * band's bit-slice key. Static unrolling (bands is a plan-time
    * constant): the transform(sequence(...)) form would evaluate its
    * lambda interpreted per row — the bandKeys discipline.
    */
  private def bandedSlices(hashed: DataFrame, idCol: String, bands: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashed.select(col(idCol), col("_sh"),
      explode(array((0 until bands).map { q =>
        struct(lit(q).as("q"),
          call_function("shiftright", col("_sh"), lit(q * width)).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("_band"))
      .select(col(idCol), col("_sh"), col("_band.q").as("_q"), col("_band.key").as("_k"))
  }

  /** Per-(band, key) bucket census of [[simHashCandidates]]'s banding:
    * `(_q, _k, _n)` rows, at most bands·2^(64/bands) of them.
    * Introspection for gates and specs that pin WHICH hot-bucket
    * regime a corpus puts the operator in (cool / cap-adjacent /
    * saturated past 8·cap) and derive candidate-volume bounds from the
    * same bit algebra the operator runs — without replicating it.
    */
  def simHashBucketCensus(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      bands: Int = 4,
  ): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    bandedSlices(simHashes(df, textCol, idCol), idCol, bands)
      .groupBy("_q", "_k").agg(count(lit(1)).as("_n"))
  }

  /** Census verdict for [[nearDupsAuto]]: is this corpus SATURATED for
    * bands-banded SimHash at this cap — i.e. does any (band, key)
    * bucket exceed the sub-band recovery regime (`n > 8·maxBucketSize`,
    * the bound [[simHashCandidates]]'s pass 3 is gated to)? Past that
    * boundary NO pass guarantees recall (star + sorted-window only —
    * measured 65.2 % recall at full sf100 saturation, SCALE.md round
    * 16), so the threshold is the operator's own documented contract
    * boundary, not a tuned constant. One tiny aggregate over the slim
    * banded rows (≤ bands·2^(64/bands) groups) and a 1-row readout —
    * the decision is bounded driver traffic at any corpus size.
    */
  def simHashSaturated(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      bands: Int = 8,
      maxBucketSize: Int = 1000,
  ): Boolean = {
    require(maxBucketSize > 0, "saturation is defined relative to a positive cap")
    !simHashBucketCensus(df, textCol, idCol, bands)
      .where(col("_n") > 8L * maxBucketSize)
      .isEmpty
  }

  /** Census-driven near-dup candidate routing — the engine ACTING on
    * the saturation boundary round 16 measured instead of documenting
    * the hand-off: run the SimHash bucket census; if the corpus is
    * COOL (every bucket within the recovery passes' contract regime,
    * [[simHashSaturated]] = false) use banded SimHash candidates (one
    * 64-bit hash per doc — the cheaper signature); if SATURATED, the
    * 8-bit band keyspace has collapsed under corpus density and the
    * recall contract belongs to MinHash banding, whose 2^64-keyed
    * buckets track TRUE shingle-similarity groups rather than
    * corpus/2^8 — hash-exact at sf100 where SimHash measured 65.2 %
    * (`minhash_near_dups_sample`, CORRECTNESS_sf100_r16).
    *
    * Returns (route, candidate pairs (id_a, id_b)); callers verify
    * candidates with exact Jaccard exactly as with either operator
    * alone. The corpus is hashed and banded ONCE (persisted via
    * `handle`): the routing census and, on the cool route, candidate
    * generation both read that single pass — at 100 TB the census is
    * then a near-free aggregate over cached slim rows, the price of
    * not discovering mid-job that the banded join's hot buckets have
    * quadratic mass.
    */
  def nearDupsAuto(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDistance: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      minhashBands: Int = 32,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): (String, DataFrame) = {
    val (route, cands, _) = nearDupsAutoDetail(df, textCol, idCol, maxDistance,
      bands, maxBucketSize, minhashBands, handle)
    (route, cands)
  }

  /** [[nearDupsAuto]] plus the routing census itself —
    * (route, candidate pairs, (_q, _k, _n) census). The census is the
    * already-persisted ≤ bands·2^(64/bands)-row frame the routing
    * decision aggregated, handed out so callers that need a saturation
    * readout (the gate queries) don't re-hash the corpus a second time
    * to reconstruct it (guide §2.4: the census costs a full
    * corpus-hash pass at scale).
    */
  def nearDupsAutoDetail(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDistance: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      minhashBands: Int = 32,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): (String, DataFrame, DataFrame) = {
    require(maxBucketSize > 0, "saturation is defined relative to a positive cap")
    val banded = handle.persist(bandedSlices(simHashes(df, textCol, idCol), idCol, bands))
    // persist the census too (≤ bands·2^(64/bands) slim rows): the
    // saturation readout below is the action that fills it, and on the
    // cool route simHashCandidatesFromBanded consumes it THREE more
    // times (cool filter, hot filter, cap-adjacent filter) — without the
    // persist each consumer re-aggregates the full banded frame, three
    // extra passes over n·bands rows at corpus scale (guide §2.4)
    val counts = handle.persist(banded.groupBy("_q", "_k").agg(count(lit(1)).as("_n")))
    // count(), not isEmpty: isEmpty's limit-1 job can leave the census
    // cache PARTIALLY filled, and on the saturated route banded is
    // dropped next — un-filled census partitions would then recompute
    // through a fresh corpus-hash pass. The full count (over the cached
    // banded rows, ≤ bands·2^width groups) materializes every census
    // partition in one tiny job.
    val saturated = counts.where(col("_n") > 8L * maxBucketSize).count() > 0
    if (saturated) {
      // MinHash keys on shingle content, not SimHash slices — the
      // banded cache is useless on that route; drop it before the
      // heavy pass rather than letting it squat on executor memory.
      // `counts` stays: the isEmpty readout above already materialized
      // its (tiny) cache independent of banded, and detail callers
      // aggregate it for the saturation evidence.
      banded.unpersist()
      ("minhash",
        minHashCandidates(df, textCol, idCol, bands = minhashBands, handle = handle),
        counts)
    } else
      ("simhash", simHashCandidatesFromBanded(banded, counts, idCol, maxDistance, bands,
        maxBucketSize, neighborWindow = 8, handle).select("id_a", "id_b"),
        counts)
  }

  def simHashCandidates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDistance: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 0,
      neighborWindow: Int = 8,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val banded = handle.persist(bandedSlices(simHashes(df, textCol, idCol), idCol, bands))
    // bucket census: one tiny aggregate over the cached slim rows (at
    // most bands·2^width groups); joined back as a left-semi filter so
    // no count column rides the pairwise join. Persisted: the capped
    // path consumes it three times (cool/hot/cap-adjacent filters) and
    // re-aggregating the banded frame per consumer is three extra
    // full passes at corpus scale (guide §2.4)
    val counts =
      if (maxBucketSize <= 0) null
      else handle.persist(banded.groupBy("_q", "_k").agg(count(lit(1)).as("_n")))
    simHashCandidatesFromBanded(banded, counts, idCol, maxDistance, bands,
      maxBucketSize, neighborWindow, handle)
  }

  /** [[simHashCandidates]] from an already-banded (and persisted) slice
    * frame plus its census — the shared-pass entry point
    * [[nearDupsAuto]] routes through so the corpus is hashed once for
    * BOTH the routing census and candidate generation, not twice.
    * `counts` may be null only when `maxBucketSize <= 0` (exact,
    * uncapped semantics).
    */
  private[graft] def simHashCandidatesFromBanded(
      banded: DataFrame,
      counts: DataFrame,
      idCol: String,
      maxDistance: Int,
      bands: Int,
      maxBucketSize: Int,
      neighborWindow: Int,
      handle: StorageHandle = StorageHandle.unmanaged,
  ): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val width = 64 / bands
    val joinable =
      if (maxBucketSize <= 0) banded
      else banded.join(counts.where(col("_n") <= maxBucketSize), Seq("_q", "_k"), "left_semi")
    val a = joinable.select(col(idCol).as("id_a"), col("_sh").as("_sh_a"), col("_q"), col("_k"))
    val b = joinable.select(col(idCol).as("id_b"), col("_sh").as("_sh_b"), col("_q"), col("_k"))
    val joined = a.join(b, Seq("_q", "_k"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("_sh_a"), col("_sh_b")).as("hamming"))
    val all =
      if (maxBucketSize <= 0) joined
      else {
        import org.apache.spark.sql.expressions.Window
        val hot = banded.join(counts.where(col("_n") > maxBucketSize), Seq("_q", "_k"), "left_semi")
        // pass 1 — full-hash star: group hot members by the full hash,
        // link everyone to the group's min id. Window-min over the hash
        // partition — one shuffle bounded by hot-bucket membership,
        // never a pairwise join; hamming-0 recall is complete.
        val hotDocs = hot.select(col(idCol), col("_sh")).distinct()
        val starWin = Window.partitionBy("_sh")
        val stars = hotDocs.withColumn("_rep", min(col(idCol)).over(starWin))
          .where(col(idCol) =!= col("_rep"))
          .select(col("_rep").as("id_a"), col(idCol).as("id_b"),
            lit(0).cast(IntegerType).as("hamming"))
        // pass 2 — sorted neighbors: within each oversized bucket, order
        // members by full hash and compare each to its next
        // `neighborWindow` neighbors (lead() over one window sort — a
        // single shuffle bounded by hot membership, output bounded by
        // membership × window). Recovers hamming 1..k pairs the capped
        // join sacrificed, when their non-band bits sort them nearby.
        val sortWin = Window.partitionBy("_q", "_k").orderBy(col("_sh"), col(idCol))
        val leads = array((1 to neighborWindow).map(i =>
          lead(struct(col(idCol).as("nid"), col("_sh").as("nsh")), i).over(sortWin)): _*)
        // window exprs are illegal inside a generator: project the lead
        // array first, explode in a second select
        val neighbors = hot.select(col(idCol), col("_sh"), leads.as("_leads"))
          .select(col(idCol), col("_sh"), explode(col("_leads")).as("_nb"))
          .where(col("_nb.nid").isNotNull)
          .select(
            least(col(idCol), col("_nb.nid")).as("id_a"),
            greatest(col(idCol), col("_nb.nid")).as("id_b"),
            hammingDistance(col("_sh"), col("_nb.nsh")).as("hamming"))
        // pass 3 — sub-band refinement of hot buckets (see Scaladoc):
        // re-key each hot member by 8 slices of the non-band bits and
        // run the ordinary capped pairwise join inside the refined
        // groups; still-hot sub-buckets get their own sorted-neighbor
        // window (a strictly more local sort than pass 2's).
        //
        // Refinement targets the CAP-ADJACENT regime only (buckets up
        // to 8·cap). Round 16 MEASURED both sides of this gate at
        // sf100 (5M docs — ALL 2048 (band,key) buckets saturated, max
        // 29,095 members, zero cool/cap-adjacent membership; SCALE.md):
        //
        //  - WITH the gate, the pass recovers nothing at that density
        //    and recall vs the exact All-Pairs truth is 65.2%
        //    (167/256 window pairs, zero false positives), 84 of the
        //    89 losses inside the hamming ≤ 7 envelope — the measured
        //    PRICE of the gate;
        //  - WITHOUT the gate (tried this round), the refined
        //    sub-buckets are individually cool (~227 members) and the
        //    join is feasible, but its SURVIVOR SET is not: on a
        //    templated corpus the ~5·10¹⁰ sub-pair evaluations pass
        //    the hamming filter in bulk (shared-template tokens pin
        //    hashes together regardless of true Jaccard — the same
        //    force that saturated the buckets), and two runs exhausted
        //    47 GB and then 60 GB of shuffle spill before the
        //    candidate set even reached verification. The explosion is
        //    SEMANTIC — past saturation density the 64-bit signal no
        //    longer discriminates, so candidate volume is inherently
        //    quadratic — not an implementation artifact.
        //
        // The gate is therefore load-shedding at SimHash's semantic
        // boundary: beyond it the pass degrades to star+sorted-
        // neighbor, and the Jaccard-recall contract at that density
        // belongs to MinHash banding, which keys on shingle content,
        // does not saturate, and is hash-exact at sf100
        // (minhash_near_dups_sample).
        val subBandMaxBucket = 8L * maxBucketSize
        val subWidth = (64 - width) / 8
        // at maxDistance = 0 the star pass already gives COMPLETE recall
        // inside hot buckets (equal hashes land in one star group), so
        // the sub-band machinery would explode hot members 8× to
        // recover nothing — skip it
        val subRecovered = if (subWidth < 1 || maxDistance == 0) joined.limit(0) else {
          val subMask = (1L << subWidth) - 1
          // _sh with band _q's slice compacted out; static when-chain
          // over q (bands is a plan-time constant), codegen-friendly
          val rem = (0 until bands).map { q =>
            val hi =
              if (q == bands - 1) lit(0L)
              else shiftleft(shiftrightunsigned(col("_sh"), (q + 1) * width), q * width)
            val lo =
              if (q == 0) lit(0L)
              else col("_sh").bitwiseAND(lit((1L << (q * width)) - 1))
            q -> hi.bitwiseOR(lo)
          }.foldLeft(lit(0L)) { case (acc, (q, e)) => when(col("_q") === q, e).otherwise(acc) }
          // the (q, k, r, sk) identity collapses to ONE 64-bit hashed
          // key: the sub machinery shuffles its rows three times
          // (census, the pairwise join's two sides, the sub-window
          // sort) — one 8-byte key column instead of four narrows
          // every one of those exchanges. A hash collision between two
          // of the ≤ bands·2^width·8·2^subWidth live keys (~2^26 at
          // the defaults, ~2^-13 birthday probability per run) MERGES
          // two sub-buckets. Usually that only means extra candidates
          // (filtered by the same hamming bound — pure cost), but if
          // the merged census count crosses maxBucketSize it can
          // demote a genuinely cool sub-bucket to the sorted-window
          // path and sacrifice hamming≤7 pairs that path misses — so
          // the sub-band contract below holds up to this negligible
          // collision probability, not absolutely.
          val hotAdjacent = banded.join(
            counts.where(col("_n") > maxBucketSize && col("_n") <= subBandMaxBucket),
            Seq("_q", "_k"), "left_semi")
          // persisted: `sub` feeds THREE consumers (its census, the
          // cool pairwise join, the hot sorted-window) and `subCounts`
          // two — without the persists each consumer re-runs the
          // hot-adjacent semi-join + 8-way explode from the banded
          // cache, three more passes over hot membership (guide §2.4)
          val sub = handle.persist(hotAdjacent
            .select(col(idCol), col("_sh"), col("_q"), col("_k"), rem.as("_rem"))
            .select(col(idCol), col("_sh"),
              explode(array((0 until 8).map { r =>
                xxhash64(col("_q"), col("_k"), lit(r),
                  shiftrightunsigned(col("_rem"), r * subWidth)
                    .bitwiseAND(lit(subMask)))
              }: _*)).as("_skey")))
          val subCounts = handle.persist(sub.groupBy("_skey").agg(count(lit(1)).as("_n")))
          val subCool = sub.join(
            subCounts.where(col("_n") <= maxBucketSize), Seq("_skey"), "left_semi")
          val sa2 = subCool.select(col(idCol).as("id_a"), col("_sh").as("_sh_a"), col("_skey"))
          val sb2 = subCool.select(col(idCol).as("id_b"), col("_sh").as("_sh_b"), col("_skey"))
          val subJoined = sa2.join(sb2, Seq("_skey"))
            .where(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"),
              hammingDistance(col("_sh_a"), col("_sh_b")).as("hamming"))
          val subHot = sub.join(
            subCounts.where(col("_n") > maxBucketSize), Seq("_skey"), "left_semi")
          val subSortWin = Window.partitionBy("_skey")
            .orderBy(col("_sh"), col(idCol))
          val subLeads = array((1 to neighborWindow).map(i =>
            lead(struct(col(idCol).as("nid"), col("_sh").as("nsh")), i).over(subSortWin)): _*)
          val subNeighbors = subHot
            .select(col(idCol), col("_sh"), subLeads.as("_leads"))
            .select(col(idCol), col("_sh"), explode(col("_leads")).as("_nb"))
            .where(col("_nb.nid").isNotNull)
            .select(
              least(col(idCol), col("_nb.nid")).as("id_a"),
              greatest(col(idCol), col("_nb.nid")).as("id_b"),
              hammingDistance(col("_sh"), col("_nb.nsh")).as("hamming"))
          subJoined.union(subNeighbors)
        }
        joined.union(stars).union(neighbors).union(subRecovered)
      }
    // hamming is a pure function of the two full hashes, so every copy
    // of a pair (one per shared band) carries the SAME distance — filter
    // BEFORE the dedup aggregate: far collisions (the vast majority on
    // narrow band keys) never enter the shuffle, and the groupBy only
    // dedups surviving near pairs
    all.where(col("hamming") <= maxDistance)
      .groupBy("id_a", "id_b")
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Keep one representative per near-duplicate cluster: drop every row
    * whose id appears as the GREATER side of a candidate pair. For a
    * chain a<b<c with pairs (a,b),(b,c) this keeps only a — the standard
    * single-pass approximation of connected-component dedup (exact CC
    * needs iterative label propagation; at corpus scale the 1-hop rule
    * removes ≥ the pairwise duplicates without iteration).
    */
  def keepRepresentatives(df: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** One large-star round: every node u links each STRICTLY LARGER
    * neighbor to the minimum of its closed neighborhood
    * min(Γ(u) ∪ {u}). Edges come in canonical (big, small) orientation
    * and leave the same way (the emitted (v, m) always has m < v).
    *
    * Shape: ONE exchange (the per-node window min), not the
    * groupBy + join + distinct formulation's three. The bidirectional
    * view is an explode (one input scan, not a two-scan union), the
    * neighborhood min rides the window, and the output is NOT deduped
    * here — duplicate (v, m) rows (same pair reachable via different
    * centers) are bounded by the degree sum 2|E| and fall out in
    * [[smallStar]]'s terminal distinct, one exchange later. Min
    * aggregation is insensitive to duplicate edges, so correctness is
    * untouched; only the probe needs distinct edges, and it runs on
    * smallStar's output.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bidir = edges.select(explode(array(
      struct(col("_eu").as("u"), col("_ev").as("v")),
      struct(col("_ev").as("u"), col("_eu").as("v")))).as("_e"))
      .select(col("_e.u").as("u"), col("_e.v").as("v"))
    val m = least(min(col("v")).over(Window.partitionBy("u")), col("u"))
    bidir.withColumn("m", m)
      .where(col("v") > col("u"))
      .select(col("v").as("_eu"), col("m").as("_ev"))
      .where(col("_eu") =!= col("_ev"))
  }

  /** One small-star round: every node u links its SMALLER neighbors —
    * and itself — to the minimum of those neighbors. Input and output
    * are canonical (big, small) edges.
    *
    * Two exchanges: the per-node window min and the terminal distinct
    * (which also dedups [[largeStar]]'s undeduped output — the round's
    * ONLY dedup, and the probe's precondition: duplicate (leaf, center)
    * rows would falsely read as two parents).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // canonical edges already point big -> small, so the smaller
    // neighborhood of u is exactly its outgoing edge list
    val withM = edges
      .withColumn("m", min(col("_ev")).over(Window.partitionBy("_eu")))
    withM.select(explode(array(
      struct(col("_ev").as("a"), col("m").as("b")),
      struct(col("_eu").as("a"), col("m").as("b")))).as("_e"))
      .select(col("_e.a").as("_eu"), col("_e.b").as("_ev"))
      .where(col("_eu") =!= col("_ev"))
      .distinct()
  }

  /** Exact duplicate-cluster labeling via alternating
    * LARGE-STAR / SMALL-STAR rounds over the candidate-pair graph
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * each round rewires edges toward the component minimum while
    * preserving connectivity, and the edge set converges to a star
    * forest — every node linked directly to its component's minimum id —
    * in O(log² n) rounds REGARDLESS OF DIAMETER (plain neighbor-min
    * propagation needs O(diameter) rounds, which silently truncates on
    * chain-shaped crawl-boilerplate clusters). Returns
    * (idCol, cluster_id). Use when chains matter (a~b~c must collapse to
    * ONE representative exactly); [[keepRepresentatives]] is the cheaper
    * single-pass approximation.
    *
    * Each round is a constant number of shuffles bounded by the CURRENT
    * edge count — which only shrinks: both operations map every edge to
    * (node, smaller-label) and dedup, so hot components collapse toward
    * their star early. Intermediate edge sets are persisted and
    * unpersisted per round, and each round's result is RE-ROOTED as a
    * fresh leaf plan: the star-contraction expression references its
    * input ~5× per round, so chaining rounds symbolically grows the
    * Catalyst tree EXPONENTIALLY — canonicalization alone OOMs the
    * driver near round 10, long before any data moves. The re-root
    * (row-roundtrip to a LogicalRDD leaf) keeps every round's plan
    * constant-size; unlike `localCheckpoint` its backing blocks are the
    * explicit per-round persists, released deterministically, not on GC.
    * Cache-backed rounds still CHAIN RDD lineage (a lost block
    * recomputes through every earlier round) — for long jobs on
    * preemptible clusters pass `checkpointDir` to materialize rounds to
    * the filesystem instead, cutting recovery to a file re-read.
    *
    * Convergence is tested as the correctness property ITSELF: a round's
    * output is checked to be a STAR FOREST (no center appears as a leaf,
    * no leaf has two parents) — connectivity preservation per round
    * keeps each star a full component, and the canonical orientation
    * makes each center its star's minimum, so star forest ⇒ labels
    * exact. This needs no extra confirmation round the way a
    * fixed-point (next == edges) test does, and it can never falsely
    * converge. If `maxIter` rounds pass without a star forest this
    * THROWS rather than returning partially-merged labels — at the
    * default 24 rounds the O(log² n) bound makes that unreachable for
    * any physically storable graph, so a throw means a logic bug, never
    * data scale.
    */
  def duplicateClusters(
      ids: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIter: Int = 24,
      handle: StorageHandle = StorageHandle.unmanaged,
      /** When set, each round materializes to parquet under this dir
        * instead of the cache — truncating RDD lineage at the
        * FILESYSTEM, so an executor loss re-reads one round's files
        * rather than recomputing the whole round chain (cache-only mode
        * keeps the lineage link between rounds). The long-job-at-scale
        * option; previous rounds are deleted as the loop advances, the
        * FINAL round's files back the returned plan — consume the
        * result, then delete the dir.
        */
      checkpointDir: Option[String] = None,
  ): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = ids.sparkSession
    // re-root: truncate the symbolic plan at a LogicalRDD leaf (see
    // scaladoc). `.rdd` is lazy — no job runs until the round's count.
    def reRoot(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    def roundPath(i: Int) = s"${checkpointDir.get}/cc_round_$i"
    def deleteRound(i: Int): Unit = if (i >= 0) {
      val p = new org.apache.hadoop.fs.Path(roundPath(i))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    // Convergence/validity probe: the edge set IS a star forest iff no
    // center appears as a leaf (a node on both edge sides) and no leaf
    // has two parents. Computed as ONE map-combined aggregation over
    // exploded per-side markers — a single scan of the input (the
    // union-of-two-selects formulation this replaced scanned it twice)
    // and a single shuffle of (node, 2 longs) rows. The single scan is
    // load-bearing for the round loop below: the probe over a
    // just-persisted frame IS the action that fills its cache, so one
    // pass materializes AND probes (the separate count() it replaced
    // cost a full extra pass through the round's shuffle chain).
    def starForestViolations(df: DataFrame): Long = {
      val sides = df.select(explode(array(
        struct(col("_eu").as("_n"), lit(1L).as("_leaf"), lit(0L).as("_ctr")),
        struct(col("_ev").as("_n"), lit(0L).as("_leaf"), lit(1L).as("_ctr")))).as("_s"))
        .select(col("_s._n").as("_n"), col("_s._leaf").as("_leaf"), col("_s._ctr").as("_ctr"))
      sides.groupBy("_n")
        .agg(sum(col("_leaf")).as("_leaves"), sum(col("_ctr")).as("_ctrs"))
        .where(col("_leaves") > 1 || (col("_leaves") > 0 && col("_ctrs") > 0))
        .count()
    }
    // canonical (big, small) edge list, self-loops dropped
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("_eu"),
        least(col("id_a"), col("id_b")).as("_ev"))
      .where(col("_eu") =!= col("_ev"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    // round-0 fast path (cache mode only): near-dup pair sets are often
    // ALREADY star forests (isolated (a, b) duplicate pairs are one-leaf
    // stars under the canonical orientation) — probe before contracting
    // and skip the machinery entirely for the common case. Bounded: on
    // non-forest inputs it short-circuits, and the initial cache fills
    // during round 1's contraction regardless. NOT taken in checkpoint
    // mode — the parquet-files-back-the-result contract requires at
    // least one written round.
    var converged = checkpointDir.isEmpty &&
      starForestViolations(edges) == 0
    try {
      while (iter < maxIter && !converged) {
        val contracted = smallStar(largeStar(edges))
        val next = checkpointDir match {
          case Some(_) =>
            contracted.write.mode("overwrite").parquet(roundPath(iter))
            spark.read.parquet(roundPath(iter))
          case None =>
            reRoot(contracted).persist(StorageLevel.MEMORY_AND_DISK)
        }
        // the probe's single scan (see starForestViolations) fully
        // materializes the fresh persist before the previous round's is
        // dropped — one action per round does both jobs
        converged = starForestViolations(next) == 0
        edges.unpersist() // no-op for a parquet-backed round
        if (checkpointDir.isDefined) deleteRound(iter - 1)
        edges = next
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"duplicateClusters did not reach a star forest in $maxIter " +
            "large-star/small-star rounds — this indicates a logic bug, not " +
            "data scale (the bound is O(log² n) rounds)")
    } catch {
      case e: Throwable =>
        // no surviving consumer on ANY failure (mid-round job error or
        // the non-convergence throw): release the current frame and the
        // written rounds the rolling deletion hasn't reached
        edges.unpersist()
        if (checkpointDir.isDefined) { deleteRound(iter); deleteRound(iter - 1) }
        throw e
    }
    // The converged star forest backs the returned (lazy) plan, so it
    // must STAY persisted past this call: hand it to the caller's handle
    // (managed mode releases it on handle.release(); the unmanaged
    // default keeps it for the session — it is already materialized and
    // pair-bounded, far smaller than the iteration inputs just dropped).
    val stars = handle.persist(edges).groupBy(col("_eu").as(idCol))
      .agg(min(col("_ev")).as("_root"))
    ids.select(col(idCol))
      .join(stars, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_root"), col(idCol)).as("cluster_id"))
  }

  /** Exact n-gram Jaccard similarity between two text columns —
    * |A∩B| / |A∪B| over distinct k-shingles. Use to verify LSH
    * candidates; O(pair count), not O(n²). Resolves to the native
    * kernel (graft.plans.NgramJaccardText) — the array_intersect-over-
    * HOF-shingles formulation re-shingles interpreted per pair and was
    * ~40× slower at sf0.1.
    */
  def ngramJaccard(textA: Column, textB: Column, k: Int = 3): Column =
    call_function("ngram_jaccard_text", textA, textB, lit(k))

  /** The sorted-distinct k-shingle hash array of a text — the
    * precomputed verify-side input for [[jaccardHashes]]. One codegen'd
    * kernel call per row (graft.plans.ShingleText).
    */
  def shingleHashes(text: Column, k: Int = 3): Column =
    call_function("shingle_hashes", text, lit(k))

  /** Exact Jaccard over two [[shingleHashes]] arrays: a merge walk, no
    * per-pair tokenization. Equal by construction to
    * `ngramJaccard(textA, textB, k)` on the source texts — use this when
    * documents participate in many candidate pairs, so each document is
    * shingled once instead of once per pair.
    */
  def jaccardHashes(a: Column, b: Column): Column =
    call_function("jaccard_hashes", a, b)

  /** Paragraph-level exact dedup across the corpus (the sub-document
    * granularity web-scale curation dedupes at — boilerplate headers,
    * navigation blocks, and license texts repeat across documents whose
    * full texts never match): each document is split into newline
    * paragraphs, every non-blank paragraph that already occurred at an
    * earlier (doc, position) is dropped, and documents are reassembled
    * from their surviving paragraphs in order. Blank paragraphs are
    * never treated as duplicates (deduping them would collapse
    * unrelated blank lines corpus-wide). A document whose every
    * paragraph was seen earlier drops out of the result entirely — it
    * carries no content; callers that must preserve doc rows can
    * left-join the output back onto the input ids.
    *
    * Scale shape: shuffle volume is LINEAR in total paragraphs — one
    * exchange keyed by paragraph content for the first-occurrence
    * window, one keyed by document id for reassembly. No all-pairs
    * anything; skew (one paragraph duplicated across millions of docs)
    * bounds a single window partition by that paragraph's occurrence
    * count, the same exposure as the exact-dedup groupBy.
    */
  def dedupParagraphs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      out: String = "text",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_para")))
    val firstWin = Window.partitionBy(col("_para"))
      .orderBy(col(idCol).asc, col("_pos").asc)
    val kept = paras
      .withColumn("_occ", row_number().over(firstWin))
      .where(trim(col("_para")) === "" || col("_occ") === 1)
    kept
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_para")))).as("_sorted"))
      // GetArrayStructFields, not transform(...): the lambda evaluates
      // interpreted; the field pull over the sorted array stays codegen'd
      .select(col(idCol), concat_ws("\n", col("_sorted").getField("_para")).as(out))
  }

  /** Corpus-frequency boilerplate removal (the C4/RefinedWeb line rule):
    * drop EVERY occurrence of any line whose document frequency — the
    * number of DISTINCT documents containing that trimmed line — exceeds
    * `maxDf`, and reassemble each document from its surviving lines in
    * order. The complement of [[dedupParagraphs]]: first-occurrence
    * dedup keeps one canonical copy of a repeated block, while a
    * frequency threshold treats the block as boilerplate and removes
    * ALL copies, including the first — the semantics web-crawl
    * curation wants for navigation chrome, cookie banners, and license
    * footers that are noise wherever they appear. Lines at exactly
    * `maxDf` documents survive (strict >): legitimate short quotations
    * repeat across a few documents, so the threshold is the caller's
    * boilerplate prior, not a dedup rule.
    *
    * Frequency is per-DOCUMENT, not per-occurrence — a line repeated
    * inside one document is intra-document repetition (see
    * TextOps.repetitionSignals), not corpus boilerplate. Matching keys
    * on the TRIMMED line (indentation-insensitive) but reassembles the
    * original text; blank lines are exempt, as in [[dedupParagraphs]].
    * A document whose every line was boilerplate drops out entirely;
    * callers that must preserve doc rows left-join back onto the input.
    *
    * Scale shape: one explode (linear in lines), one distinct on
    * (line, doc) + partial-agg count (linear shuffle, the same volume
    * bound as the paragraph window), and the frequent-line set is
    * OUTPUT-BOUNDED — boilerplate vocabularies are tiny relative to
    * the corpus — so its anti-join is deliberately UNHINTED: AQE
    * broadcasts while it fits under autoBroadcastJoinThreshold and
    * degrades to a shuffle join past it. Skew (one line in millions of
    * docs) is absorbed by the partial aggregation; no per-key window
    * partition ever materializes the occurrence list.
    */
  def removeFrequentLines(
      df: DataFrame,
      maxDf: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      out: String = "text",
  ): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val frequent = lines
      .where(trim(col("_line")) =!= "")
      .select(trim(col("_line")).as("_key"), col(idCol))
      .distinct()
      .groupBy("_key").agg(count(lit(1)).as("_df"))
      .where(col("_df") > maxDf)
      .select("_key")
    // reassembly stays codegen'd: GetArrayStructFields (the `._line`
    // field pull over the sorted array) has doGenCode, where a
    // transform(...) lambda would evaluate interpreted
    lines
      .join(frequent, trim(col("_line")) === col("_key"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_line")))).as("_sorted"))
      .select(col(idCol),
        concat_ws("\n", col("_sorted").getField("_line")).as(out))
  }

  /** Sliding k-token windows of a token array as window strings —
    * `sliding_windows(tokens, k, sep)`, the [[graft.plans.SlidingWindows]]
    * codegen kernel (requires [[graft.plans.GraftExtensions]]).
    */
  def slidingWindows(tokens: Column, k: Int, sep: String = " "): Column =
    call_function("sliding_windows", tokens, lit(k), lit(sep))

  /** Exact substring-span deduplication (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr rule, re-expressed relationally): any k-token window
    * that occurs MORE THAN ONCE in the corpus — across documents or
    * within one — is removed from every occurrence except the corpus-
    * first (minimal `(doc_id, position)`), by deleting the token
    * positions the duplicate occurrences cover. Overlapping duplicated
    * windows merge naturally through the per-position deletion marks, so
    * a long repeated passage disappears as one contiguous span.
    * Documents are reassembled from the surviving tokens in order.
    *
    * The reference implementation builds a corpus suffix array — a
    * global sorted structure with no good distributed analogue. The
    * relational form trades the suffix array's arbitrary-length match
    * for a fixed window granularity k (the paper's 50-token threshold ≈
    * the k here): every duplicated run of ≥ k tokens is caught (it
    * contains a duplicated k-window); runs shorter than k are kept,
    * which IS the threshold semantic.
    *
    * Tokenization is whitespace-normalizing (`\s+` → single space, ends
    * trimmed), and reassembly joins surviving tokens with single spaces
    * — output text is whitespace-normalized even for untouched
    * documents, the standard pre-dedup canonicalization. Every input
    * row survives (a fully-deduplicated document keeps its row with
    * empty text).
    *
    * Scale shape, at 100 TB: window materialization is a per-row
    * codegen projection (no shuffle), and the corpus-wide duplicate
    * search runs ENTIRELY on 8-byte `xxhash64(window)` keys — one
    * partial-aggregated count keyed by hash over slim (id, pos, hash)
    * rows (a boilerplate window in millions of docs partial-aggs to
    * one row per map task). The sf100 probe forced this shape: keying
    * the corpus-wide aggregation by window STRING intermittently OOMed
    * the 32-thread sort at 5M docs (~6·k bytes per key through
    * exchange + sort buffers) while the identical run on hashes
    * completed. The exact path (default) then re-derives window text
    * ONLY for rows whose hash is duplicated — a pruned second scan,
    * the [[graft.ops.Ann]].cosineNearDupPairs re-attach shape — and
    * re-verifies the duplicate count on the true text, so hash
    * collisions cost a little extra work, never a wrong deletion;
    * hash-unique rows are provably text-unique and never touch a
    * string exchange. `hashKeys = true` skips the verification pass
    * and trusts the hash (collision risk ≈ (#windows)²/2⁶⁵ of one
    * extra span wrongly deleted — the configuration for corpora where
    * the duplicate volume itself is corpus-scale, e.g. crawl snapshots
    * with mirror sites).
    *
    * PRECONDITION — deterministic input: `df` is re-scanned up to four
    * times (token explode, window pass, the exact path's token
    * re-derivation, the final re-join), deliberately UNPERSISTED — at
    * 5M docs the (id, tokens) projection is multi-GB and caching it
    * traded the sf100 probe's scan-bound linearity for eviction churn;
    * re-reading columnar text is cheaper than materializing token
    * arrays. A non-deterministic source (upstream `sample`/`limit`/
    * non-deterministic UDF) could present different rows to different
    * passes and mark wrong spans — persist such inputs (or land them
    * via [[graft.ops.StorageHandle]]) before calling. Every shipped
    * caller reads at-rest parquet, which is deterministic.
    *
    * Deletion marks are OUTPUT-BOUNDED by the
    * duplicated-token volume (explode of `sequence` sits after the
    * duplicate filter, the [[removeFrequentLines]] precedent); the
    * final anti-join + reassembly are linear shuffles on
    * `(doc, position)` / doc. The gate runs both configurations
    * against one oracle; the spec pins their identity on a
    * collision-free fixture.
    */
  def dedupSpans(
      df: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      out: String = "text",
      hashKeys: Boolean = false,
  ): DataFrame = {
    require(k >= 2, s"window size must be >= 2 tokens, got $k")
    val toksOf = {
      // normalize BEFORE trimming: trim() strips spaces only, so a
      // leading tab must first collapse to a space or it yields a
      // phantom empty first token
      val norm = trim(regexp_replace(coalesce(col(textCol), lit("")), "\\s+", " "))
      when(norm === "", array().cast("array<string>")).otherwise(split(norm, " "))
    }
    // scatter each tokenize/window pass: they are per-row kernel work
    // with no upstream exchange, so an under-partitioned input (the sf
    // fixtures are one row group) serializes them onto a single task.
    // Deterministic (round-robin repartition local-sorts its input, so
    // every re-scan places rows identically); no-ops at corpus scale.
    val sdf = scatter(df)
    val toks = sdf
      .select(col(idCol), posexplode(toksOf).as(Seq("_pos", "_tok")))
    // hash AFTER the explode — a scalar codegen'd xxhash64 in the same
    // stage (no interpreted transform(...) lambda); the window string
    // is a transient between generator and projection and — on the slim
    // pass — never reaches the exchange
    val occSlim = sdf
      .select(col(idCol), posexplode(slidingWindows(toksOf, k)).as(Seq("_pos", "_w")))
      .select(col(idCol), col("_pos"), xxhash64(col("_w")).as("_h"))
    // duplicate occurrences + the (doc, pos)-minimal first per window.
    // BOTH paths count on the 8-byte hash first: the corpus-wide
    // exchange/aggregation only ever carries (id, pos, hash) rows. The
    // sf100 probe showed why — grouping 5M docs' window STRINGS
    // intermittently OOMed the 32-thread sort, while the identical run
    // on hashes completed: string keys cost ~6·k bytes each through
    // exchange + sort buffers. The exact path re-derives strings ONLY
    // for rows whose hash is duplicated (a pruned second scan, the
    // Ann.cosineNearDupPairs re-attach shape) and verifies the
    // duplicate count on the true window text — hash-unique rows are
    // provably string-unique, so exact semantics are preserved with the
    // hashed path's memory profile.
    val dupH = occSlim
      .groupBy(col("_h")).agg(count(lit(1)).as("_nh"))
      .where(col("_nh") > 1)
      .select(col("_h"))
    // occurrences whose key is (hash-)duplicated, carrying the FINAL
    // identity column: the hash itself (hashKeys) or the re-derived
    // window text (exact — a pruned second scan). dupH is unhinted:
    // AQE broadcasts while it fits, so the common case has NO
    // corpus-wide join shuffle at all.
    val occDup =
      if (hashKeys)
        occSlim.join(dupH, Seq("_h"))
          .select(col(idCol), col("_pos"), col("_h").as("_win"))
      else {
        // the slim rows join FIRST; window text is then re-derived per
        // flagged position from the owning doc's token array
        // (slice + concat_ws — both codegen'd, no lambda), so string
        // bytes exist ONLY for dup-hash occurrences. A full-window
        // string projection feeding the join instead would put the
        // corpus-wide string stream one AQE degradation (dup-hash set
        // past the broadcast threshold → SMJ) away from a sort/spill
        // of every window string — the sf100 disk-wall.
        val flagged = occSlim.join(dupH, Seq("_h")).select(col(idCol), col("_pos"))
        val docToks = sdf.select(col(idCol), toksOf.as("_toks"))
        flagged.join(docToks, Seq(idCol))
          .select(col(idCol), col("_pos"),
            concat_ws(" ", slice(col("_toks"), col("_pos") + 1, lit(k))).as("_win"))
      }
    // first = min (doc, pos) per surviving window; the exact path's
    // string count here drops hash-duplicated-but-text-unique rows, so
    // collisions cost a little extra work, never a wrong deletion. The
    // min(struct) SortAggregate now runs over the dup-bounded subset
    // only, never corpus-wide.
    val firsts = occDup
      .groupBy(col("_win"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col(idCol), col("_pos"))).as("_first"))
      .where(col("_n") > 1)
      .select(col("_win"), col("_first"))
    val dupOcc = occDup
      .join(firsts, "_win")
      .where(struct(col(idCol), col("_pos")) =!= col("_first"))
    // deletion marks: explode AFTER the duplicate filter (bounded by
    // duplicated-token volume, not corpus volume)
    val deleted = dupOcc
      .select(col(idCol), explode(sequence(col("_pos"), col("_pos") + lit(k - 1))).as("_pos"))
    val rebuilt = toks
      .join(deleted, Seq(idCol, "_pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_tok")))).as("_sorted"))
      // GetArrayStructFields, not transform(...): stays codegen'd
      .select(col(idCol), concat_ws(" ", col("_sorted").getField("_tok")).as("_rebuilt"))
    df.join(rebuilt, Seq(idCol), "left")
      .select(df.columns.filter(c => c != textCol && c != out).map(col) :+
        coalesce(col("_rebuilt"), lit("")).as(out): _*)
  }
}
