package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal decode, frame extraction, frame sampling, and resize
  * planning under the driver's hard gate.
  *
  * [[Multimodal.synthesizePngs]] generates REAL PNG bytes whose pixel
  * dimensions are a pure function of the id (w = id%64+1, h = id%48+2),
  * and [[Multimodal.decodeAndFeaturize]] decodes them with the genuine
  * `javax.imageio` codec. The oracle re-derives the expected dimensions
  * from id arithmetic in DuckDB — so the hash compare verifies the
  * decode path recovered EXACTLY the encoded geometry. A silent
  * regression to the stub codec (hash-derived fake dims) or a codec
  * misread fails the gate; the synthesized inputs make the check
  * deterministic with zero external files.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  private val nImages = 300L
  private val nWavs = 200L
  private val nAvis = 150L

  /** All three REAL decode paths under one gate: PNG dims
    * (`javax.imageio`), WAV sample-rate/channels/frames
    * (`javax.sound.sampled`), and AVI container geometry + walked frame
    * count ([[Multimodal.RiffAviCodec]]) are all generator-known
    * functions of the id, so a regression of ANY decode path to the
    * stub (or a codec misread) fails the hash. */
  val multimodalDecode: Q = (s, _) =>
    Multimodal.decodeAndFeaturize(
        Multimodal.synthesizePngs(s, nImages)
          .unionByName(Multimodal.synthesizeWavs(s, nWavs))
          .unionByName(Multimodal.synthesizeAvis(s, nAvis)))
      .toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("kind"), col("media_id"))

  /** REAL frame extraction under the gate: every frame payload the
    * generator wrote into the `movi` list must come back, in order, with
    * its exact bytes — `byte_sum` is the oracle's probe into the payload
    * (byte k of frame f of video id is (id·31 + f·7 + k·13) mod 256, so
    * the sum is re-derivable in SQL). A walk that miscounts chunks,
    * misreads a size field, or returns the wrong slice fails the hash. */
  val multimodalFrames: Q = (s, _) =>
    Multimodal.extractFrames(Multimodal.synthesizeAvis(s, nAvis))
      .toDF()
      .select(col("media_id"), col("frame_idx"), col("frame_len"),
        col("byte_sum"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Frame-sampling plan under the gate: one row per `everyMs` tick
    * below the row's duration — duration_ms is generator-known
    * ((id%24+1)·100 ms at 10 fps), so the explode/sequence arithmetic is
    * re-derivable exactly. */
  val multimodalFrameSample: Q = (s, _) =>
    Multimodal.sampleFrames(Multimodal.synthesizeAvis(s, nAvis), everyMs = 250L)
      .select(col("media_id"), col("frame_ms"))
      .orderBy(col("media_id"), col("frame_ms"))

  /** Aspect-preserving resize targets under the gate: decoded PNG
    * geometry (id-derivable) through the scale/ceil arithmetic, both
    * sides in IEEE doubles so the hash compare is exact. */
  val multimodalResize: Q = (s, _) =>
    Multimodal.withResizeTarget(
        Multimodal.decodeAndFeaturize(Multimodal.synthesizePngs(s, nImages)),
        maxSide = 32)
      .select(col("media_id"), col("width"), col("height"),
        col("target_width"), col("target_height"))
      .orderBy(col("media_id"))

  val queries: ListMap[String, Q] = ListMap(
    "q_multimodal_decode" -> multimodalDecode,
    "q_multimodal_frames" -> multimodalFrames,
    "q_multimodal_frame_sample" -> multimodalFrameSample,
    "q_multimodal_resize" -> multimodalResize)

  val oracles: ListMap[String, String] = ListMap(
    // dimensions are generator-known: decode must reproduce them exactly.
    // audio modality mapping: width = sample rate (8 kHz), height =
    // channels (mono), n_frames = (id%50+10) ms at 8 frames/ms. video:
    // container geometry, n_frames = movi chunk count.
    "q_multimodal_decode" ->
      s"""SELECT r.range AS media_id, 'image' AS kind,
         CAST(r.range % 64 + 1 AS INTEGER) AS width,
         CAST(r.range % 48 + 2 AS INTEGER) AS height,
         1 AS n_frames
         FROM range(0, $nImages) r
         UNION ALL
         SELECT r.range AS media_id, 'audio' AS kind,
         8000 AS width, 1 AS height,
         CAST((r.range % 50 + 10) * 8 AS INTEGER) AS n_frames
         FROM range(0, $nWavs) r
         UNION ALL
         SELECT r.range AS media_id, 'video' AS kind,
         CAST(r.range % 32 + 16 AS INTEGER) AS width,
         CAST(r.range % 24 + 12 AS INTEGER) AS height,
         CAST(r.range % 24 + 1 AS INTEGER) AS n_frames
         FROM range(0, $nAvis) r
         ORDER BY kind, media_id""",
    // frame payloads are generator-known: byte k of frame f of video id
    // is (id*31 + f*7 + k*13) mod 256, 16 bytes per frame, id%24+1
    // frames per video — the sum probes the exact extracted bytes.
    "q_multimodal_frames" ->
      s"""SELECT r.range AS media_id, CAST(f.range AS INTEGER) AS frame_idx,
         16 AS frame_len,
         CAST(SUM((r.range * 31 + f.range * 7 + k.range * 13) % 256) AS BIGINT)
           AS byte_sum
         FROM range(0, $nAvis) r, range(0, 24) f, range(0, 16) k
         WHERE f.range < r.range % 24 + 1
         GROUP BY 1, 2
         ORDER BY 1, 2""",
    // duration_ms = (id%24+1)*100 (10 fps); one tick every 250 ms below it
    "q_multimodal_frame_sample" ->
      s"""SELECT r.range AS media_id, CAST(s.range AS BIGINT) AS frame_ms
         FROM range(0, $nAvis) r, range(0, 2400, 250) s
         WHERE s.range < (r.range % 24 + 1) * 100
         ORDER BY 1, 2""",
    // same IEEE-double scale/ceil arithmetic as withResizeTarget (the
    // DOUBLE casts matter: a bare 32.0 literal is DECIMAL in DuckDB)
    "q_multimodal_resize" ->
      s"""SELECT r.range AS media_id,
         CAST(r.range % 64 + 1 AS INTEGER) AS width,
         CAST(r.range % 48 + 2 AS INTEGER) AS height,
         CAST(CEIL((r.range % 64 + 1) * LEAST(
           CAST(32 AS DOUBLE) / GREATEST(r.range % 64 + 1, r.range % 48 + 2),
           CAST(1 AS DOUBLE))) AS INTEGER) AS target_width,
         CAST(CEIL((r.range % 48 + 2) * LEAST(
           CAST(32 AS DOUBLE) / GREATEST(r.range % 64 + 1, r.range % 48 + 2),
           CAST(1 AS DOUBLE))) AS INTEGER) AS target_height
         FROM range(0, $nImages) r
         ORDER BY 1""")
}
