package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (extension surface).
  *
  * Design: media content is an opaque `binary` column with a typed
  * metadata struct riding next to it; decode/feature-extraction run as
  * per-partition batch transforms (`mapPartitions` over a typed Dataset —
  * the JVM analog of arrow-batched Python UDFs): one iterator per
  * partition, so a codec can amortize init across the batch, and the
  * operation is map-only (no shuffle; `.explain` shows no Exchange).
  *
  * All three decode paths are REAL: images via `javax.imageio`
  * ([[ImageIoCodec]], JDK-builtin), audio via `javax.sound.sampled`
  * ([[JavaSoundCodec]], JDK-builtin WAV/AIFF/AU), and video containers
  * via [[RiffAviCodec]] — a pure-JVM parser for the public RIFF AVI
  * format (geometry from the `avih` header, frame count by walking the
  * `movi` chunks). Each has a `synthesize*` twin generating genuine
  * bytes to exercise it. Only FRAME-PIXEL video decode (MJPEG/H.26x
  * bitstreams) stays out of scope — the JDK ships no video bitstream
  * codec; non-AVI video and undecodable bytes fall back to the
  * deterministic [[StubCodec]] so one bad blob never kills a sweep, and
  * a real bitstream codec (e.g. javacv) can slot in without touching
  * any plumbing.
  *
  * [[MediaFeatures]] dimension mapping is modality-specific: images use
  * (width, height, n_frames = 1); audio uses (width = sample rate,
  * height = channels, n_frames = sample frames); video uses the
  * container's (width, height) with n_frames = walked frame chunks
  * (stub fallback: hash-derived dims, duration-derived frames).
  */
object Multimodal {

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, content: Array[Byte],
      mime: String, duration_ms: Long)

  /** Decoded features: fixed-width embedding + decoded dimensions. */
  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, features: Array[Float])

  val FeatureDim = 16

  /** Deterministic fake codec: every output is a pure function of the
    * content bytes, so tests are stable and the pipeline is runnable
    * anywhere. CLEARLY A STUB — a real deployment replaces exactly these
    * three functions with codec calls. */
  object StubCodec {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }

    def frameCount(kind: String, durationMs: Long): Int =
      if (kind == "video") math.max(1, (durationMs / 1000).toInt) else 1

    /** Fake feature extractor: a strided byte histogram, L2-normalized —
      * shaped exactly like a real embedding head's output. */
    def features(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        acc(java.lang.Byte.toUnsignedInt(content(i)) % FeatureDim) += 1f
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0f) acc else acc.map(_ / norm)
    }
  }

  /** REAL image codec — `javax.imageio` (JDK-builtin, zero new deps):
    * decodes PNG/JPEG/BMP/GIF bytes to actual pixel dimensions and a
    * 16-bin luminance histogram over the decoded pixels (L2-normalized,
    * same shape as [[StubCodec.features]]). Returns None when no
    * registered reader claims the bytes — the caller falls back to the
    * stub, so non-image (or synthetic junk) content keeps flowing.
    * Audio/video decode remains stubbed: the JDK ships an image codec
    * but no audio/video ones. */
  object ImageIoCodec {
    // ImageIO's default read path spills every stream to a temp-file
    // cache — one executor-disk file created+deleted PER RECORD, and a
    // hard failure when java.io.tmpdir is unwritable. Decode from memory:
    // the records are already in-heap byte arrays.
    javax.imageio.ImageIO.setUseCache(false)

    /** None when the bytes aren't a decodable image (no registered
      * reader, or a corrupt file) — per-record resilience is deliberate:
      * one bad blob must not kill a 100 TB sweep; the caller routes the
      * record to the stub path, whose hash-derived dims are recognizably
      * fake. */
    def tryDecode(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
      scala.util.Try(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))).toOption
        .flatMap(Option(_)).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val acc = new Array[Float](FeatureDim)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              acc(lum * FeatureDim / 256) += 1f
              x += 1
            }
            y += 1
          }
          val norm = math.sqrt(acc.map(v => v.toDouble * v).sum).toFloat
          (w, h, if (norm == 0f) acc else acc.map(_ / norm))
        }
  }

  /** REAL audio codec — `javax.sound.sampled` (JDK-builtin Java Sound,
    * zero new deps): decodes WAV/AIFF/AU bytes to actual sample rate /
    * channels / frame count and a 16-bin absolute-amplitude histogram
    * over the decoded 16-bit PCM samples (L2-normalized, same shape as
    * the other codecs' features). Returns None when the bytes aren't a
    * parseable audio stream — per-record resilience, caller falls back
    * to the stub (same contract as [[ImageIoCodec]]). */
  object JavaSoundCodec {
    def tryDecode(content: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
      scala.util.Try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
          val nSamples = bytes.length / bytesPerSample
          val acc = new Array[Float](FeatureDim)
          var i = 0
          while (i < nSamples) {
            // 16-bit PCM little/big-endian per the stream format
            val sample: Int =
              if (bytesPerSample == 2) {
                val b0 = bytes(i * 2)
                val b1 = bytes(i * 2 + 1)
                if (fmt.isBigEndian) (b0 << 8) | (b1 & 0xff)
                else (b1 << 8) | (b0 & 0xff)
              } else java.lang.Byte.toUnsignedInt(bytes(i)) - 128
            val mag = math.min(math.abs(sample), 32767)
            acc(mag * FeatureDim / 32768) += 1f
            i += 1
          }
          val norm = math.sqrt(acc.map(v => v.toDouble * v).sum).toFloat
          val feats = if (norm == 0f) acc else acc.map(_ / norm)
          val frames = (in.getFrameLength match {
            case n if n >= 0 => n
            case _ => nSamples / math.max(1, fmt.getChannels)
          }).toInt
          (fmt.getSampleRate.toInt, fmt.getChannels, frames, feats)
        } finally in.close()
      }.toOption
  }

  /** REAL video container codec — a pure-JVM parser for the PUBLIC RIFF
    * AVI format (Microsoft "AVI RIFF File Reference"): validates the
    * `RIFF....AVI ` envelope, reads frame dimensions from the `avih`
    * MainAVIHeader inside the `hdrl` list, and counts the actual frame
    * chunks (`##db`/`##dc`) inside the `movi` list — so n_frames comes
    * from walking the container, not from trusting a header field.
    * Features = byte histogram over the frame payloads (same shape as
    * the other codecs'). Returns None for anything that isn't a
    * well-formed AVI — per-record resilience, caller falls back to the
    * stub (same contract as [[ImageIoCodec]]/[[JavaSoundCodec]]). FRAME
    * PIXEL decode (MJPEG etc.) stays out of scope: the JDK ships no
    * video bitstream codec; container geometry + frame count are what
    * the pipeline consumes. */
  object RiffAviCodec {
    private def u32le(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def fourCC(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Shared container walk: validates the RIFF/AVI envelope, reads the
      * `avih` geometry, and invokes `onFrame(payloadOff, payloadLen)` for
      * every `##db`/`##dc` frame chunk inside a `movi` list. Returns
      * (width, height, frameCount) or aborts (require inside the caller's
      * Try) on anything malformed. LIST recursion is depth-capped so an
      * adversarial blob of thousands of nested LISTs aborts to None
      * instead of a fatal StackOverflowError escaping the guard — real
      * AVIs nest 2-3 deep. */
    private def walkAvi(content: Array[Byte])(
        onFrame: (Int, Int) => Unit): (Int, Int, Int) = {
      require(content.length >= 12 && fourCC(content, 0) == "RIFF" &&
        fourCC(content, 8) == "AVI ")
      var width = -1
      var height = -1
      var frames = 0
      val maxListDepth = 64
      def walk(off0: Int, end: Int, inMovi: Boolean, depth: Int = 0): Unit = {
        require(depth <= maxListDepth, s"LIST nesting exceeds $maxListDepth")
        var off = off0
        while (off + 8 <= end) {
          val id = fourCC(content, off)
          val size = u32le(content, off + 4).toInt
          // a corrupt size field (u32 overflowing Int to negative)
          // would stall or rewind the walk — the loop must always
          // ADVANCE or abort to None, never spin on a bad blob
          require(size >= 0, s"negative chunk size at $off")
          val payload = off + 8
          if (id == "LIST" && size >= 4) {
            val listType = fourCC(content, payload)
            walk(payload + 4, math.min(end, payload + size),
              inMovi || listType == "movi", depth + 1)
          } else if (id == "avih" && size >= 40) {
            // MainAVIHeader: dwWidth/dwHeight at payload offsets 32/36
            width = u32le(content, payload + 32).toInt
            height = u32le(content, payload + 36).toInt
          } else if (inMovi && id.length == 4 &&
              id(0).isDigit && id(1).isDigit &&
              id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')) {
            frames += 1
            onFrame(payload, math.min(end, payload + size) - payload)
          }
          off = payload + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(content.length, (u32le(content, 4) + 8).toInt), inMovi = false)
      require(width > 0 && height > 0 && frames > 0)
      (width, height, frames)
    }

    def tryDecode(content: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
      scala.util.Try {
        val acc = new Array[Float](FeatureDim)
        val (width, height, frames) = walkAvi(content) { (payload, len) =>
          var i = payload
          while (i < payload + len) {
            acc(java.lang.Byte.toUnsignedInt(content(i)) % FeatureDim) += 1f
            i += 1
          }
        }
        val norm = math.sqrt(acc.map(v => v.toDouble * v).sum).toFloat
        (width, height, frames, if (norm == 0f) acc else acc.map(_ / norm))
      }.toOption

    /** The frame PAYLOADS of a well-formed AVI, in container order — the
      * primitive under [[Multimodal.extractFrames]]. None on anything
      * malformed (same per-record-resilience contract as [[tryDecode]]). */
    def tryExtractFrames(content: Array[Byte]): Option[Vector[Array[Byte]]] =
      scala.util.Try {
        val out = Vector.newBuilder[Array[Byte]]
        walkAvi(content) { (payload, len) =>
          out += java.util.Arrays.copyOfRange(content, payload, payload + len)
        }
        out.result()
      }.toOption
  }

  /** Deterministic synthetic table of REAL (minimal, spec-conformant)
    * RIFF AVI containers, generated distributively like the PNG/WAV
    * twins: video id → (id%32+16)×(id%24+12) geometry with id%24+1
    * frame chunks of deterministic payload — every field the decode
    * path reports is id-derivable, so the container walk can be oracled
    * exactly like the PNG dimensions. */
  def synthesizeAvis(spark: SparkSession, n: Long, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 32 + 16).toInt
        val h = (id % 24 + 12).toInt
        val nFrames = (id % 24 + 1).toInt
        val fps = 10
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        def u32(v: Long): Unit = { // little-endian
          out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
          out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
        }
        def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
        val frameBytes = 16
        // sizes, innermost out: avih(56) strh(56) strf(40); strl list =
        // 4 + (8+56) + (8+40); hdrl list = 4 + (8+56) + (8 + strl)
        val strlSize = 4 + 64 + 48
        val hdrlSize = 4 + 64 + 8 + strlSize
        val moviSize = 4 + nFrames * (8 + frameBytes)
        val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
        cc("RIFF"); u32(riffSize); cc("AVI ")
        cc("LIST"); u32(hdrlSize); cc("hdrl")
        cc("avih"); u32(56)
        u32(1000000L / fps); u32(0); u32(0); u32(0) // usec/frame, maxBps, pad, flags
        u32(nFrames); u32(0); u32(1); u32(0)        // totalFrames, initial, streams, sugBuf
        u32(w); u32(h); u32(0); u32(0); u32(0); u32(0) // width, height, reserved[4]
        cc("LIST"); u32(strlSize); cc("strl")
        cc("strh"); u32(56)
        cc("vids"); cc("MJPG"); u32(0); u32(0)      // fccType, handler, flags, prio+lang
        u32(0); u32(1); u32(fps); u32(0)            // initFrames, scale, rate, start
        u32(nFrames); u32(0); u32(0); u32(0) // length, sugBuf, quality, sampleSize
        u32(0); u32(0)                       // rcFrame (4 × u16)
        cc("strf"); u32(40)
        u32(40); u32(w); u32(h); u32(1 | (24 << 16)) // biSize, w, h, planes|bitcount
        u32(0); u32(w.toLong * h * 3); u32(0); u32(0); u32(0); u32(0) // compression..clrImportant
        cc("LIST"); u32(moviSize); cc("movi")
        var f = 0
        while (f < nFrames) {
          cc("00dc"); u32(frameBytes)
          var k = 0
          while (k < frameBytes) {
            out.write(((id * 31 + f * 7 + k * 13) & 0xff).toInt); k += 1
          }
          f += 1
        }
        MediaRecord(id, "video", bos.toByteArray, "video/x-msvideo",
          nFrames.toLong * 1000 / fps)
      }
    }.toDF()
  }

  /** Deterministic synthetic table of REAL WAV files, generated
    * distributively like [[synthesizePngs]]: audio id → mono 16-bit PCM
    * at 8 kHz, `id % 50 + 10` ms of a 220·(id%8+1) Hz sine, encoded by
    * the JDK WAV writer. Frame count is id-derivable
    * (8000·(id%50+10)/1000 = (id%50+10)·8), so the decode path can be
    * oracled exactly like the PNG dimensions. */
  def synthesizeWavs(spark: SparkSession, n: Long, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val sampleRate = 8000f
        val ms = (id % 50 + 10).toInt
        val nFrames = (sampleRate * ms / 1000).toInt
        val freq = 220.0 * (id % 8 + 1)
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toInt
          pcm(i * 2) = (v & 0xff).toByte
          pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio", bos.toByteArray, "audio/wav", ms.toLong)
      }
    }.toDF()
  }

  /** Deterministic synthetic table of REAL PNG files, generated
    * distributively (mapPartitions over a range — the encoder init is
    * per-partition, like any real codec): image id → (id%64+1)×(id%48+2)
    * RGB image with position-derived pixels, encoded by the JDK PNG
    * writer. Exercises the genuine decode path end-to-end. */
  def synthesizePngs(spark: SparkSession, n: Long, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 2).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (x * 31 + y * 97 + id.toInt * 13) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", bos.toByteArray, "image/png", 0L)
      }
    }.toDF()
  }

  /** Deterministic synthetic media table, generated distributively (one
    * `spark.range` — no driver-side data): content bytes derive from
    * md5(media_id), kind cycles image/audio/video. */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame =
    spark.range(0, n, 1, partitions)
      .select(
        col("id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("id") % 3 + 1).cast("int")).as("kind"),
        // 64 deterministic pseudo-random bytes per row
        unhex(concat((0 until 4).map(i => md5(concat(col("id"), lit(i)))): _*))
          .as("content"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("id") % 3 + 1).cast("int")).as("mime"),
        (col("id") % 30000 + 1000).as("duration_ms"))

  /** Decode + featurize: per-partition batch transform over the typed
    * Dataset. Map-only — preserves the input partitioning. */
  def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content", "mime", "duration_ms")
      .as[MediaRecord]
      .mapPartitions { batch =>
        // per-partition init happens here (codec handles, model weights…)
        batch.map { m =>
          val real: Option[MediaFeatures] = m.kind match {
            case "image" => ImageIoCodec.tryDecode(m.content).map {
              case (w, h, feats) => MediaFeatures(m.media_id, m.kind, w, h, 1, feats)
            }
            case "audio" => JavaSoundCodec.tryDecode(m.content).map {
              // modality mapping: width = sample rate, height = channels
              case (rate, ch, frames, feats) =>
                MediaFeatures(m.media_id, m.kind, rate, ch, frames, feats)
            }
            case "video" => RiffAviCodec.tryDecode(m.content).map {
              // container geometry + walked frame count (AVI only; other
              // containers fall through to the stub)
              case (w, h, frames, feats) =>
                MediaFeatures(m.media_id, m.kind, w, h, frames, feats)
            }
            case _ => None
          }
          real.getOrElse { // stub: non-AVI video + undecodable bytes
            val (w, h) = StubCodec.decodeDims(m.content)
            MediaFeatures(m.media_id, m.kind, w, h,
              StubCodec.frameCount(m.kind, m.duration_ms),
              StubCodec.features(m.content))
          }
        }
      }
  }

  /** One decoded frame payload of one video row. `frame_len`/`byte_sum`
    * ride along so downstream filters (blank-frame drop, size caps) and
    * the correctness gate can work without touching the bytes again. */
  final case class FrameRecord(
      media_id: Long, frame_idx: Int, frame_len: Int, byte_sum: Long,
      frame_bytes: Array[Byte])

  /** REAL frame extraction for AVI video rows: one output row per
    * `##db`/`##dc` chunk in the container's `movi` list, payload bytes
    * included — the video analog of image decode (what a frame-level
    * embedding or caption model consumes). Per-partition batch transform
    * like [[decodeAndFeaturize]]: map-side flatMap, no shuffle, one
    * codec walk per record. Rows whose bytes aren't a well-formed AVI
    * produce NO frames (per-record resilience — one bad blob never
    * kills a sweep; undecodable containers are observable as media_ids
    * absent from the output, and [[decodeAndFeaturize]]'s stub route is
    * the place that surfaces them positively). */
  def extractFrames(media: DataFrame): Dataset[FrameRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "kind", "content", "mime", "duration_ms")
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.flatMap { m =>
          RiffAviCodec.tryExtractFrames(m.content).getOrElse(Vector.empty)
            .iterator.zipWithIndex.map { case (bytes, idx) =>
              var sum = 0L
              var i = 0
              while (i < bytes.length) {
                sum += java.lang.Byte.toUnsignedInt(bytes(i)); i += 1
              }
              FrameRecord(m.media_id, idx, bytes.length, sum, bytes)
            }
        }
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (every `everyMs` milliseconds) — a generate/explode, not a shuffle. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("content"))

  /** Resize plan: metadata-level transform (the stub records the target;
    * a real codec would re-encode content). Shape of a real resize op:
    * map-only, content column carried through. */
  def withResizeTarget(decoded: Dataset[MediaFeatures], maxSide: Int): DataFrame = {
    val d = decoded.toDF()
    val scale = least(
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
    d.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
