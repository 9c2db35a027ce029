package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkSpec {

  test("decode runs batch-wise over binary rows with the fake decoder") {
    val media = MediaPipeline.mediaFromDocuments(spark, sf("sf0.001"))
    val feats = MediaPipeline.decode(spark, media, MediaPipeline.fakeDecoder)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.nBytes > 0)
      assert(f.width >= 32 && f.width < 96)
      assert(f.height >= 32 && f.height < 96)
      assert(f.channels == 3)
      assert(f.meanLuma > 0.0 && f.meanLuma < 256.0)
    }
    // deterministic: same input -> same features
    val again = MediaPipeline.decode(spark, media, MediaPipeline.fakeDecoder).collect()
    assert(rows.sortBy(_.id).toSeq == again.sortBy(_.id).toSeq)
  }

  test("mapPartitions decoder agrees with the columnar x03 query") {
    val media = MediaPipeline.mediaFromDocuments(spark, sf("sf0.001"))
    val viaDecoder = MediaPipeline.decode(spark, media, MediaPipeline.fakeDecoder)
      .collect().map(f => f.id -> ((f.nBytes, f.width, f.height, f.meanLuma))).toMap
    val viaQuery = graft.queries.MultimodalQueries
      .queries("x03_decode_features")(spark, sf("sf0.001"))
      .collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_bytes"),
          r.getAs[Long]("width").toInt, r.getAs[Long]("height").toInt,
          r.getAs[Float]("mean_luma").toDouble))
      }.toMap
    assert(viaDecoder.keySet == viaQuery.keySet)
    viaDecoder.foreach { case (id, (nb, w, h, luma)) =>
      val (nb2, w2, h2, luma2) = viaQuery(id)
      assert(nb == nb2 && w == w2 && h == h2)
      assert(math.abs(luma - luma2) < 1e-3)
    }
  }

  test("empty blob is handled without crashing") {
    import spark.implicits._
    val df = Seq((1L, Array.empty[Byte])).toDF("id", "content")
    val out = MediaPipeline.decode(spark, df, MediaPipeline.fakeDecoder).collect()
    assert(out.head.nBytes == 0 && out.head.meanLuma == 0.0)
  }

  test("repartitionByBytes bounds bytes per task") {
    val media = MediaPipeline.mediaFromDocuments(spark, sf("sf0.001"))
    val total = media.agg(sum(octet_length(col("content")))).head.getLong(0)
    val target = total / 7 + 1
    val parts = MediaPipeline.repartitionByBytes(media, "content", target)
      .rdd.getNumPartitions
    assert(parts >= 7 && parts <= 8)
  }

  test("native decoder is an explicit stub") {
    intercept[NotImplementedError] { MediaPipeline.nativeDecoder }
  }
}
