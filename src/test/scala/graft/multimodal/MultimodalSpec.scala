package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "tiny"), (1L, "a somewhat longer document body"), (2L, "video-ish payload text right here"))
      .toDF("doc_id", "text")
  }

  test("manifest has the typed multimodal schema") {
    val mf = Multimodal.manifestFrom(docs, "doc_id", "text")
    assert(mf.schema.fieldNames.toSeq === Seq("asset_id", "modality", "payload", "meta"))
    assert(mf.schema("payload").dataType.typeName === "binary")
    val mods = mf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mods === Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("decodeFeatures is deterministic, fixed-dim, and partition-local") {
    val mf = Multimodal.manifestFrom(docs, "doc_id", "text").repartition(3)
    val f1 = Multimodal.decodeFeatures(mf).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.decodeFeatures(mf.repartition(2)).collect().sortBy(_.getLong(0))
    assert(f1.map(_.getSeq[Float](3)).toSeq === f2.map(_.getSeq[Float](3)).toSeq)
    assert(f1.forall(_.getSeq[Float](3).length === Multimodal.StubCodec.featureDim))
    assert(f1.map(r => r.getLong(0) -> r.getInt(2)).toMap ===
      docs.collect().map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap)
  }

  test("frame sampling yields ceil(duration/step) frames for video assets only") {
    val mf = Multimodal.manifestFrom(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(mf, everyMs = 100L)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only doc 2 is video; duration = len*10 ms, step 100ms
    val len = "video-ish payload text right here".length
    assert(byAsset === Map(2L -> (((len * 10) - 1) / 100 + 1).toLong))
  }
}
