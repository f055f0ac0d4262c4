package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  lazy val media = {
    import spark.implicits._
    Seq(
      MediaRow(1, "payload-one".getBytes("UTF-8"), "image"),
      MediaRow(2, "payload-two-longer".getBytes("UTF-8"), "video"),
      MediaRow(3, Array.emptyByteArray, "audio")).toDS()
  }

  test("batched decode stub is deterministic and schema-stable") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(3)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
    assert(f1.find(_.media_id == 2).get.n_frames >= 1) // video gets frames
    assert(f1.find(_.media_id == 3).get.byte_len == 0) // empty payload survives
  }

  test("stub dimensions derive from the portable md5 hash family") {
    // the mapPartitions stub's manual digest fold must equal the
    // column-level portableHash64 (what the DuckDB oracle replays)
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("width"), col("height"))
    val expect = media.toDF().select(col("media_id"),
      graft.operators.Dedup.portableHash64(col("payload")).as("h"))
      .select(col("media_id"),
        (lit(64L) + col("h") % 1024).as("width"),
        (lit(64L) + shiftright(col("h"), 10) % 1024).as("height"))
    assert(feats.exceptAll(expect).isEmpty && expect.exceptAll(feats).isEmpty)
  }

  test("frame sampling includes frame 0 and respects stride") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val sampled = Multimodal.sampleFrames(feats, everyN = 7)
      .groupBy(col("media_id")).agg(
        min(col("frame_idx")).as("first"),
        count(lit(1)).as("n"),
        max(col("n_frames")).as("nf"))
      .collect()
    sampled.foreach { r =>
      assert(r.getAs[Long]("first") == 0L)
      val expected = (r.getAs[Long]("nf") + 6) / 7
      assert(r.getAs[Long]("n") == expected)
    }
  }

  test("resize plan preserves aspect and never upscales") {
    val feats = Multimodal.extractFeatures(media).toDF()
    Multimodal.resizePlan(feats, maxDim = 128).collect().foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (rw, rh) = (r.getAs[Long]("resized_w"), r.getAs[Long]("resized_h"))
      assert(r.getAs[Double]("scale") <= 1.0)
      assert(rw <= 128 && rh <= 128)
      assert(rw <= w && rh <= h)
    }
  }
}
