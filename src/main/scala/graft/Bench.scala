package graft
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** Benchmark main: runs the headline queries ([[Queries.benchNames]]) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced to FULL evaluation with a noop-format write —
  * every operator and projection executes (a bare .count() would let
  * Catalyst prune compute columns). Failures are recorded per query in an
  * `errors` map instead of being silently folded into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // subset-key co-partitioning (see Verify.scala): lets the
      // bucketed-by-ID layout carry (Year, ID) joins without re-shuffle
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = Queries.catalog.map { case (n, fn, _) => n -> fn }.toMap ++ Queries.benchExtra
    // optional dev filter: `runMain graft.Bench name1,name2` times just
    // those queries (same shape as Verify's filter)
    val filter = args.headOption.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = Queries.benchNames.filter(byName.contains)
      .filter(n => filter.forall(_.contains(n)))
    // untimed warmup: initializes parquet reader, codegen, and the noop
    // committer so the first timed query measures the query, not JVM
    // startup (reads one row, not the dataset)
    try spark.read.parquet(s"$sfDir/region.parquet").limit(1)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    var errors = ListMap.empty[String, String]
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try byName(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop any persisted intermediates (LSH signature caches) so the
      // next run starts cold and memory doesn't accumulate across queries
      spark.catalog.clearCache()
      sec
    }
    // each query runs three times and reports the min: single runs at
    // this scale are dominated by JIT/GC/scheduler noise (round 2
    // recorded a 39.7s outlier for a 5s hash aggregate; round 7's
    // driver runs showed 10s first-run outliers on a 0.2s query under
    // machine load), and min-of-three measures the plan, not the
    // hiccup — two samples were not enough when BOTH landed under
    // contention. All raw runs are kept in the output so a contaminated
    // run (min >> other runs' typical cost, or runs wildly apart) is
    // diagnosable from the artifact alone.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadBefore = osBean.getSystemLoadAverage
    // Per-query load sampling: BENCH_r08 recorded 2-11x "regressions"
    // that were pure machine contention (load_avg 2->11.7 across the
    // whole run, regressed queries contiguous in run order) — whole-run
    // before/after load could not localize it. Each run now records the
    // 1-min load average sampled right after it, and when every run of a
    // query landed under load (> cpus/4), up to two extra runs are taken
    // so at least one sample has a chance of clean machine state. min()
    // over all runs still measures the plan.
    val loadGate = cpus.toDouble / 4.0
    val results: Seq[(String, (Seq[Double], Seq[Double]))] = names.map { name =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
      def run(): Unit = { runs += runOnce(name); loads += osBean.getSystemLoadAverage }
      run(); run(); run()
      var extra = 0
      while (extra < 2 && loads.forall(_ > loadGate)) { run(); extra += 1 }
      System.err.println(f"[bench] $name%-24s ${runs.min}%8.2fs  (runs: ${runs.map(r => f"$r%.2f").mkString(", ")}; load: ${loads.map(l => f"$l%.1f").mkString(", ")})")
      name -> (runs.toSeq, loads.toSeq)
    }
    val loadAfter = osBean.getSystemLoadAverage
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = results.map { case (k, (v, _)) => "\"" + esc(k) + "\":" + f"${v.min}%.3f" }.mkString("{", ",", "}")
    val rs = results.map { case (k, (v, _)) =>
      "\"" + esc(k) + "\":[" + v.map(r => f"$r%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val ls = results.map { case (k, (_, l)) =>
      "\"" + esc(k) + "\":[" + l.map(x => f"$x%.2f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2._1.min).sum
    spark.stop()
    // Full artifact first (complete per-query mins + raw runs + load
    // samples) for any consumer capturing whole stdout...
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"load":$ls,"load_avg_before":$loadBefore,"load_avg_after":$loadAfter,"errors":$es,"sf":"$sfDir"}""")
    // ...then ONE compact summary as the FINAL stdout line. The driver
    // snapshots only the last 2000 bytes of stdout (BENCH_r01..r14 all
    // show tail=2000, parsed=null: the detailed line above is several KB,
    // so its head was always cut mid-JSON). This line stays well under
    // that budget (total + count + errors + the slowest rows), so the
    // tail capture always contains at least one complete JSON object.
    // Nothing may print to stdout after it (Spark logs go to stderr;
    // spark.stop() already ran above).
    val topN = results.map { case (k, (v, _)) => k -> v.min }.sortBy(-_._2).take(15)
    val topJson = topN.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    // error NAMES only here (full messages live in the detailed line
    // above) — a handful of 200-char messages would blow the 2000-byte
    // tail budget this line exists to respect
    val errNames = errors.keys.take(10).map(k => "\"" + esc(k) + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","n":${results.size},"error_count":${errors.size},"errored":$errNames,"top_slowest":$topJson,"sf":"$sfDir"}""")
  }
}
