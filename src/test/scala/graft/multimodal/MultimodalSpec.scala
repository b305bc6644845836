package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, sf0001)

  test("binary media table has the typed schema and full coverage") {
    val n = media.count()
    assert(n === graft.Tables.documents(spark, sf0001).count())
    val types = media.map(_.media_type).distinct().collect().toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("batched featurization is deterministic and partition-count invariant") {
    val f1 = Multimodal.featurize(media).collect()
      .map(f => f.doc_id -> f.histogram.toSeq).toMap
    val f2 = Multimodal.featurize(media.repartition(7)).collect()
      .map(f => f.doc_id -> f.histogram.toSeq).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == Multimodal.histogramBins))
    // histograms are normalized
    f1.values.foreach(h => assert(math.abs(h.sum - 1.0f) < 1e-3f))
  }

  test("frame sampling explodes only video rows, deterministically") {
    val frames = Multimodal.sampleFrames(media, stepMs = 1000).collect()
    val videoIds = media.filter(_.media_type == "video").map(_.doc_id).collect().toSet
    assert(frames.map(_.doc_id).toSet === videoIds.filter(id =>
      media.filter(_.doc_id == id).head().duration_ms > 0))
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val dur = media.filter(_.doc_id == id).head().duration_ms
      assert(fs.length === ((dur - 1) / 1000 + 1))
    }
  }

  test("resize stub caps the max dimension and keeps aspect sanity") {
    val resized = Multimodal.resizeStub(media, maxDim = 100).collect()
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 100 || math.max(r.width, r.height) == 0)
    }
  }
}
