package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal decode under the driver's hard gate.
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

  val queries: ListMap[String, Q] = ListMap(
    "q_multimodal_decode" -> multimodalDecode)

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
         ORDER BY kind, media_id""")
}
