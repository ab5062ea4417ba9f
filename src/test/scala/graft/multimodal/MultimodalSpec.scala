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

  test("real javax.imageio decode rides the same plumbing: known PNG pixels, corrupt payloads null out, stub untouched") {
    import spark.implicits._
    // PNG bytes synthesized with the SAME public JDK API that decodes
    // them (deterministic, no binaries checked in): a 2x2 pure-red and
    // a 4x1 half-white/half-black image with exactly known channel means
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val red = png(2, 2, (_, _) => 0xff0000)
    val bw = png(4, 1, (x, _) => if (x < 2) 0xffffff else 0x000000)
    val manifest = Seq(
      (10L, "image", red), (11L, "image", bw),
      (12L, "image", "not a png at all".getBytes("UTF-8")), // corrupt
      (13L, "audio", "audio payload".getBytes("UTF-8"))) // no JDK codec -> stub
      .toDF("asset_id", "modality", "payload")
      .withColumn("meta", lit(null).cast(Multimodal.metaSchema))
    val out = Multimodal.decodeFeatures(manifest.repartition(3), real = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    val fRed = out(10L).getSeq[Float](3)
    assert(fRed(0) === 2f && fRed(1) === 2f) // width, height from PIXELS, not meta
    assert(fRed(2) === 1f && fRed(3) === 0f && fRed(4) === 0f) // mean RGB
    assert(math.abs(fRed(5) - 0.299f) < 1e-6) // Rec.601 luma of pure red
    val fBw = out(11L).getSeq[Float](3)
    assert(fBw(0) === 4f && fBw(2) === 0.5f && fBw(3) === 0.5f && fBw(4) === 0.5f)
    assert(fBw(7) === 4f) // aspect 4:1
    assert(out(12L).isNullAt(3)) // corrupt image -> NULL feature, no crash
    // audio passes through the stub even in real mode (per-modality boundary)
    assert(out(13L).getSeq[Float](3) ===
      Multimodal.StubCodec.decode("audio payload".getBytes("UTF-8"), "audio").toSeq)
    // and the default path is STILL the replayable stub (gates unchanged)
    val stub = Multimodal.decodeFeatures(manifest).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(stub(10L) === Multimodal.StubCodec.decode(red, "image").toSeq)
  }

  test("planResize: within-bounds is identity, oversize fits the box preserving aspect") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // craft manifests with explicit dims via a small struct projection
    val mf = Seq(
      (0L, 100, 50), // fits -> identity
      (1L, 512, 128), // wide -> 128 x 32
      (2L, 100, 400), // tall -> 32 x 128
      (3L, 256, 256)) // square oversize -> 128 x 128
      .toDF("asset_id", "w", "h")
      .select(col("asset_id"), lit("image").as("modality"),
        lit(null).cast("binary").as("payload"),
        struct(lit("stub").as("format"), col("w").as("width"), col("h").as("height"),
          lit(0).as("sample_rate"), lit(0L).as("duration_ms")).as("meta"))
    val got = Multimodal.planResize(mf, 128, 128).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    assert(got === Map(0L -> ((100, 50)), 1L -> ((128, 32)), 2L -> ((32, 128)), 3L -> ((128, 128))))
  }

  test("mm_knn: self is rank 0 at distance 0, distances ascend per query") {
    val rows = graft.SparkEntry.queries("mm_knn")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length === 3)
      assert(sorted.head._3 === qid && sorted.head._4 === 0.0,
        s"query $qid must find itself first")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
    }
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
