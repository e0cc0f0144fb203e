package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private def media() = {
    val rows = Seq(
      Row(1L, "image/png", Array[Byte](1, 2, 3, 2, 1), 10, 10, null),
      Row(2L, "audio/wav", Array[Byte](5, 5, 5, 5), null, null, 1000L),
      Row(3L, "image/png", null, 8, 8, null),
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row.fromSeq(r.toSeq)), 1),
      Multimodal.mediaSchema)
  }

  test("stub feature extraction preserves rows, drops payload, is deterministic") {
    val out = Multimodal.extractFeatures(media(), new Multimodal.StubDecoder(8))
    assert(out.count() == 3)
    assert(!out.columns.contains("payload"))
    assert(out.columns.contains("features"))
    val f1 = out.where("media_id = 1").collect()(0).getSeq[Float](out.columns.indexOf("features"))
    assert(f1.length == 8)
    assert(math.abs(f1.sum - 1.0f) < 1e-5) // histogram normalized by length
    val again = Multimodal.extractFeatures(media(), new Multimodal.StubDecoder(8))
      .where("media_id = 1").collect()(0).getSeq[Float](out.columns.indexOf("features"))
    assert(f1 == again)
  }

  test("null payload yields zero vector, not a crash") {
    val out = Multimodal.extractFeatures(media(), new Multimodal.StubDecoder(4))
    val f3 = out.where("media_id = 3").collect()(0)
      .getSeq[Float](out.columns.indexOf("features"))
    assert(f3.forall(_ == 0f))
  }

  test("metadata-only projection prunes the payload column") {
    val out = Multimodal.metadataOnly(media())
    assert(!out.columns.contains("payload"))
    assert(out.count() == 3)
  }

  test("every-nth sampling is deterministic") {
    val a = Multimodal.sampleEveryNth(media(), 2).select("media_id").collect().map(_.getLong(0)).toSet
    val b = Multimodal.sampleEveryNth(media(), 2).select("media_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
