package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(spark, 90, partitions = 6)

  test("synthesize: deterministic distributed media table with binary content") {
    val rows = media.select("media_id", "kind", "mime").collect()
    assert(rows.length == 90)
    val first = media.filter(col("media_id") === 0)
      .select("content").head.getAs[Array[Byte]](0)
    val again = Multimodal.synthesize(spark, 90).filter(col("media_id") === 0)
      .select("content").head.getAs[Array[Byte]](0)
    assert(first.sameElements(again)) // deterministic bytes
    assert(first.length == 64)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("decodeAndFeaturize: map-only (no shuffle), unit-norm features, stable") {
    val decoded = Multimodal.decodeAndFeaturize(media)
    assert(decoded.rdd.getNumPartitions == 6) // partitioning preserved
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
    val rows = decoded.collect()
    assert(rows.length == 90)
    rows.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      val norm = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
      assert(f.width >= 1 && f.height >= 1)
    }
  }

  test("ImageIoCodec decodes real PNG bytes to actual pixel dimensions") {
    val pngs = Multimodal.synthesizePngs(spark, 50, partitions = 4)
    val decoded = Multimodal.decodeAndFeaturize(pngs)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
    val rows = decoded.collect()
    assert(rows.length == 50)
    rows.foreach { f =>
      // ACTUAL decoded dimensions, not a hash of the bytes: the
      // generator wrote an (id%64+1)×(id%48+2) image
      assert(f.width == (f.media_id % 64 + 1).toInt, s"media ${f.media_id}")
      assert(f.height == (f.media_id % 48 + 2).toInt, s"media ${f.media_id}")
      assert(f.n_frames == 1)
      val norm = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5) // pixel-luminance histogram, unit norm
    }
    // determinism across regeneration (encoder + decoder are pure)
    val again = Multimodal.decodeAndFeaturize(
      Multimodal.synthesizePngs(spark, 50, partitions = 4)).collect()
    assert(rows.map(f => (f.media_id, f.width, f.height, f.features.toSeq)).toSet ==
      again.map(f => (f.media_id, f.width, f.height, f.features.toSeq)).toSet)
    // undecodable "image" bytes (the generic synthetic corpus) still flow
    // through the stub fallback rather than failing the batch
    val junk = Multimodal.synthesize(spark, 9).filter(col("kind") === "image")
    assert(Multimodal.decodeAndFeaturize(junk).count() == 3)
  }

  test("RiffAviCodec walks real AVI containers: header geometry + counted frame chunks") {
    val avis = Multimodal.synthesizeAvis(spark, 50, partitions = 4)
    val decoded = Multimodal.decodeAndFeaturize(avis)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
    val rows = decoded.collect()
    assert(rows.length == 50)
    rows.foreach { f =>
      // ACTUAL parsed container fields: the generator wrote an
      // (id%32+16)×(id%24+12) AVI with id%24+1 frame chunks
      assert(f.width == (f.media_id % 32 + 16).toInt, s"media ${f.media_id}")
      assert(f.height == (f.media_id % 24 + 12).toInt, s"media ${f.media_id}")
      assert(f.n_frames == (f.media_id % 24 + 1).toInt, s"media ${f.media_id}")
      val norm = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5) // frame-payload histogram, unit norm
    }
    // direct codec checks: junk and truncated bytes → None (stub route),
    // never an exception
    assert(Multimodal.RiffAviCodec.tryDecode("not an avi".getBytes).isEmpty)
    val valid = avis.filter(col("media_id") === 1)
      .select("content").head.getAs[Array[Byte]](0)
    assert(Multimodal.RiffAviCodec.tryDecode(valid).isDefined)
    assert(Multimodal.RiffAviCodec.tryDecode(valid.take(30)).isEmpty)
    // adversarial chunk size (u32 0xFFFFFFF8 → negative Int): must reject,
    // not spin the walk forever (the decode runs inside 100 TB sweeps)
    val evil = valid.clone()
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // first LIST size field
    assert(Multimodal.RiffAviCodec.tryDecode(evil).isEmpty)
    // non-AVI "video" bytes (the generic synthetic corpus) keep flowing
    // via the stub fallback
    val junk = Multimodal.synthesize(spark, 9).filter(col("kind") === "video")
    assert(Multimodal.decodeAndFeaturize(junk).count() == 3)
  }

  test("RiffAviCodec aborts a nested-LIST bomb instead of overflowing the stack") {
    // thousands of nested LIST chunks: an unbounded recursive walk dies
    // with a fatal StackOverflowError that ESCAPES the Try guard and
    // kills the task — the depth cap must turn it into a clean None
    val depth = 10000
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val total = 12 + depth * 12
    cc("RIFF"); u32(total - 8L); cc("AVI ")
    var remaining = total - 12
    (0 until depth).foreach { _ =>
      cc("LIST"); u32(remaining - 8L); cc("hdrl")
      remaining -= 12
    }
    assert(Multimodal.RiffAviCodec.tryDecode(bos.toByteArray).isEmpty)
  }

  test("extractFrames: exact generator payloads back, in order, map-only") {
    val avis = Multimodal.synthesizeAvis(spark, 20, partitions = 4)
    val frames = Multimodal.extractFrames(avis)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame extraction must not shuffle:\n$plan")
    val rows = frames.collect()
    // one row per movi chunk the generator wrote
    assert(rows.length == (0 until 20).map(id => id % 24 + 1).sum)
    rows.foreach { f =>
      assert(f.frame_len == 16)
      assert(f.frame_bytes.length == 16)
      // byte k of frame f of video id is (id*31 + f*7 + k*13) mod 256
      (0 until 16).foreach { k =>
        val expect = ((f.media_id * 31 + f.frame_idx * 7 + k * 13) & 0xff).toByte
        assert(f.frame_bytes(k) == expect,
          s"media ${f.media_id} frame ${f.frame_idx} byte $k")
      }
      assert(f.byte_sum == f.frame_bytes.map(java.lang.Byte.toUnsignedInt).sum)
    }
    // frame_idx is dense per video, starting at 0, container order
    rows.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until (id % 24 + 1).toInt),
        s"media $id")
    }
    // non-AVI "video" bytes produce no frames — and no exception
    val junk = Multimodal.synthesize(spark, 9).filter(col("kind") === "video")
    assert(Multimodal.extractFrames(junk).count() == 0)
  }

  test("sampleFrames: one row per sampled frame, video only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000)
    val perVideo = frames.groupBy("media_id").count().collect()
    val videos = media.filter(col("kind") === "video")
      .select("media_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVideo.nonEmpty)
    perVideo.foreach { r =>
      val expect = (videos(r.getLong(0)) + 4999) / 5000
      assert(r.getLong(1) == expect)
    }
  }

  test("features feed the similarity stack end-to-end") {
    val decoded = Multimodal.decodeAndFeaturize(media).toDF()
    val queries = decoded.filter(col("media_id") < 2)
      .select(col("media_id").as("query_id"), col("features").as("qvec"))
    val top = Similarity.topKForQueries(decoded, "media_id", "features",
      queries, "query_id", "qvec", k = 3).collect()
    assert(top.length == 6)
    top.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Double]("cosine") == 1.0) // self-match first
    }
  }

  test("withResizeTarget: aspect-preserving bounds") {
    val resized = Multimodal.withResizeTarget(
      Multimodal.decodeAndFeaturize(media), maxSide = 256)
    resized.collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(w <= 256 && h <= 256 && w >= 1 && h >= 1)
      assert(w == r.getAs[Int]("width") || h == r.getAs[Int]("height") ||
        (w <= 256 && h <= 256))
    }
  }
}
