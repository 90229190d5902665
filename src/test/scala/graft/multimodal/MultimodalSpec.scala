package graft.multimodal

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.syntheticMediaTable(
    Tables.table(spark, TestSpark.sfDir, "documents"), "doc_id", "text")

  test("media table has binary payloads and typed metadata") {
    val r = media.limit(3).collect()
    assert(r.forall(_.getAs[Array[Byte]]("content").nonEmpty))
    assert(media.select($"modality").distinct().count() == 3)
  }

  test("extractFeatures yields fixed-dim vectors, deterministic") {
    val ds = media.as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(ds).collect()
      .sortBy(_.media_id)
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    assert(f1.forall(_.n_bytes > 0))
    val f2 = Multimodal.extractFeatures(ds.repartition(7)).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames only emits for video, bounded by maxFrames") {
    val ds = media.as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(ds, fps = 1.0, maxFrames = 5)
      .toDF().cache()
    assert(frames.count() > 0)
    val joined = frames.join(media, "media_id")
    assert(joined.where($"modality" =!= "video").count() == 0)
    val perMedia = frames.groupBy($"media_id").count()
    assert(perMedia.agg(max($"count")).head().getLong(0) <= 5)
  }

  test("resizePlan computes scales") {
    val r = Multimodal.resizePlan(media, 224, 224)
      .select($"width", $"target_width", $"scale_x").limit(1).head()
    assert(r.getInt(1) == 224)
    assert(math.abs(r.getDouble(2) - 224.0 / r.getInt(0)) < 1e-9)
  }
}
