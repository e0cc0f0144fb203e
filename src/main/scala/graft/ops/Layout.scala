package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional at-rest data layout: Z-order (Morton-curve)
  * clustering.
  *
  * A corpus partitioned or sorted by ONE key prunes scans on that key
  * only; the second dimension always reads everything. Interleaving the
  * bits of two (or more) bounded dimensions into a single z-value and
  * RANGE-partitioning + sorting the files by it gives every output file
  * a narrow min/max envelope in EVERY participating dimension — so
  * parquet/ORC row-group statistics prune scans filtered on any of
  * them. This is the standard lakehouse answer (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`) re-expressed with nothing but Spark built-ins:
  * a codegen'd bit-interleave expression + `repartitionByRange` +
  * `sortWithinPartitions`.
  *
  * At 100 TB the layout is written once (or per ingest increment) and
  * amortizes across every multi-dimensional slice query; the write
  * itself is one range shuffle — the same cost as any global sort —
  * and range boundaries come from Spark's reservoir sampling of the
  * z-value, so no dimension needs its distribution known in advance.
  */
object Layout {

  /** Morton z-value of `cols`: the low `bits` bits of each column,
    * bit-interleaved (column i contributes bit b to output position
    * b*n + i). Pure integer Column arithmetic — whole-stage codegen,
    * engine-portable (the identical shift/mask expression evaluates in
    * DuckDB), no UDF.
    *
    * Callers map each dimension to a non-negative bounded int first
    * (day number, id mod 2^bits, bucket/cell id, rank): z-ordering is
    * only meaningful over bounded grids, and the masking here makes
    * that contract explicit rather than silently wrapping negatives.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits must fit in a signed long (<= 63)")
    val n = cols.size
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val planes = for {
      b <- 0 until bits
      (c, i) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    planes.reduce(_ bitwiseOR _)
  }

  /** The same z-value as ANSI SQL text over column names — the oracle
    * side of the engine-portability contract (and documentation that
    * the expression is nothing exotic).
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    val planes = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield s"(((($c & ${(1L << bits) - 1}) >> $b) & 1) << ${b * n + i})"
    planes.mkString("(", " | ", ")")
  }

  /** Write `df` z-ordered by `dims` (each already mapped to a bounded
    * non-negative int Column): range-partition into `numFiles` tasks by
    * z-value, sort within each, write parquet. Files come out with
    * pairwise-disjoint z ranges (range partitioning) and therefore
    * narrow per-file envelopes in every dimension — min/max row-group
    * stats prune slices on ANY dim. The helper z column is dropped
    * before the write; it is derivable, not data.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[Column],
      bits: Int = 16,
      numFiles: Int = 8,
  ): Unit =
    df.withColumn("_z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetFileBytes) files. Streaming sinks, per-batch
    * ingests, and over-parallel writers leave thousands of tiny files;
    * every downstream scan then pays per-file open/footer/seek costs
    * and the scheduler pays per-split overhead — at 100 TB, file count
    * (not byte count) becomes the scan bottleneck. Sizing comes from a
    * driver-side filesystem LISTING (metadata only, no data read),
    * then a measured-bytes feedback pass corrects it once if
    * recompression moved the written size off target by more than 2x;
    * `coalesce` keeps the rewrite shuffle-free — each output task
    * concatenates whole input splits. Returns the number of data files
    * actually written. Use [[writeZOrdered]] or
    * [[graft.sources.RawSources.writeBucketed]] instead when the rewrite
    * should also fix the ORDER of the data, not just its granularity.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      dstPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
  ): Int = {
    import org.apache.hadoop.fs.Path
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    // The in-place guard must survive every spelling of "the same
    // directory": makeQualified normalizes scheme / authority /
    // relative-vs-absolute / trailing slash, and for the local
    // filesystem getCanonicalPath additionally resolves symlinks —
    // raw string inequality would let `dir/` vs `dir` (or a symlink)
    // through, and overwrite mode would then delete the directory the
    // lazy scan is still reading.
    def canonical(p: String): String = {
      val path = new Path(p)
      val q = path.getFileSystem(conf).makeQualified(path)
      if (q.toUri.getScheme == "file")
        new java.io.File(q.toUri.getPath).getCanonicalPath
      else q.toString
    }
    require(canonical(srcPath) != canonical(dstPath),
      "compact src and dst must resolve to different directories: " +
        "overwriting the directory being read is undefined")
    val fs = new Path(srcPath).getFileSystem(conf)
    def dataBytes(dir: String): (Long, Int) = {
      val it = fs.listFiles(new Path(dir), true)
      var bytes = 0L; var files = 0
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) { bytes += st.getLen; files += 1 }
      }
      (bytes, files)
    }
    val totalBytes = dataBytes(srcPath)._1
    // The scan must be able to produce AT LEAST the desired output file
    // count: coalesce only merges, so the read's split size (not the
    // session default, which byte-packs small files into few fat
    // partitions) is set to the per-output source-byte budget, and
    // coalesce then trims the over-partitioning that the per-file open
    // cost introduces. Still shuffle-free end to end.
    def rewrite(n: Int): Int = {
      // the split-size override lives in a CLONED session (shared
      // SparkContext, isolated SQL conf): mutating the caller's session
      // conf would leak a possibly tiny split size to any query planned
      // concurrently on it, and two concurrent compact() calls would
      // race on the save/restore
      val split = math.max(1L, math.ceil(totalBytes.toDouble / n).toLong)
      val scoped = spark.newSession()
      scoped.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
      scoped.read.parquet(srcPath).coalesce(n)
        .write.mode("overwrite").parquet(dstPath)
      dataBytes(dstPath)._2
    }
    val estimate = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    var written = rewrite(estimate)
    // Sizing feedback: the first pass sizes from SOURCE bytes, but
    // recompression (codec change, shattered-file header overhead
    // collapsing) can move the written size far from that estimate.
    // Measure what actually landed and, if mean output file size is
    // off by more than 2x from target, rewrite ONCE from the measured
    // bytes — still reading from src, so the guard above keeps the
    // rewrite safe.
    val (writtenBytes, writtenFiles) = dataBytes(dstPath)
    if (writtenFiles > 0) {
      val meanSize = writtenBytes.toDouble / writtenFiles
      if (meanSize > 2.0 * targetFileBytes || meanSize < targetFileBytes / 2.0) {
        val corrected = math.max(1, math.ceil(writtenBytes.toDouble / targetFileBytes).toInt)
        if (corrected != writtenFiles) written = rewrite(corrected)
      }
    }
    written
  }
}
