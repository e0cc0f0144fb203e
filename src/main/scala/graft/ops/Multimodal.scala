package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata alongside
  * (mime, width/height, duration, ...). Spark-side plumbing — schema,
  * partition sizing, batch-shaped per-partition processing — is real;
  * the codec itself is a pluggable [[MediaDecoder]] because media
  * libraries are environment-specific (the built-in [[StubDecoder]] is a
  * clearly-marked deterministic fake for tests).
  *
  * Scale notes: binary payloads dominate row size, so (a) metadata-only
  * queries must never read the payload column — keep payloads in their own
  * parquet column so column pruning skips the bytes; (b) partitions are
  * sized by `spark.sql.files.maxPartitionBytes`, not row count; (c)
  * decode/feature-extract runs per-partition (one decoder instance per
  * task, amortized init) via mapPartitions — the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch.
  */
object Multimodal {

  /** The standard multimodal document schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true),
  ))

  /** Per-item decoder contract: bytes -> fixed-length feature vector.
    * Implementations must be serializable (instantiated per task).
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decodeFeatures(mime: String, payload: Array[Byte]): Array[Float]
  }

  /** STUB: a deterministic fake decoder — real image/audio codecs are not
    * available in this environment. Features are a byte-histogram sketch,
    * so tests exercise real Spark plumbing with reproducible outputs.
    * With normalize=false the histogram stays raw integer counts
    * (exactly representable in Float), which lets an external oracle
    * reproduce the output bit-for-bit.
    */
  final class StubDecoder(val featureDim: Int = 16, val normalize: Boolean = true)
      extends MediaDecoder {
    def decodeFeatures(mime: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(java.lang.Byte.toUnsignedInt(payload(i)) % featureDim) += 1f
          i += 1
        }
        if (normalize) {
          val n = math.max(payload.length, 1).toFloat
          var j = 0
          while (j < featureDim) { out(j) /= n; j += 1 }
        }
      }
      out
    }
  }

  /** Decode features per partition: one decoder per task, rows streamed —
    * the batch shape that a vectorized (Arrow/Pandas-UDF) implementation
    * would also use. Adds `features: array<float>`; payload column is
    * dropped from the output so downstream stages don't carry the bytes.
    */
  def extractFeatures(
      df: DataFrame,
      decoder: MediaDecoder,
      mimeCol: String = "mime",
      payloadCol: String = "payload",
      out: String = "features",
  ): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == payloadCol) :+
        StructField(out, ArrayType(FloatType), nullable = false))
    val mimeIdx = inSchema.fieldIndex(mimeCol)
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == payloadCol).map(_._2)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val feats = decoder.decodeFeatures(
          r.getString(mimeIdx),
          if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keepIdx.toSeq.map(r.get) :+ feats.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Metadata-only projection — by reading only non-payload columns, the
    * parquet scan prunes the byte column entirely (verify via
    * `.explain`'s ReadSchema).
    */
  def metadataOnly(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.drop(payloadCol)

  /** Frame sampling for video-like payloads: deterministic every-nth
    * selection by media_id hash — a cheap row-level downsample that
    * happens before any decode cost.
    */
  def sampleEveryNth(df: DataFrame, n: Int, idCol: String = "media_id"): DataFrame =
    df.where(pmod(xxhash64(col(idCol)), lit(n)) === 0)
}
