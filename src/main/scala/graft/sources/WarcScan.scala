package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC ingestion (ISO 28500 / WARC 1.1 — the public format real
  * crawls arrive in): a schema-first scan from raw `.warc` files to a
  * typed `(record_id, warc_type, url, fetch_ts, http_status,
  * content_type, body, corrupt)` relation, with per-record corruption
  * QUARANTINE mirroring the [[Scan.jsonl]] posture — a malformed
  * record becomes one row with the data columns null and a bounded
  * snippet of the bad bytes in `corrupt`, never a failed job
  * (FAILFAST poisons the whole 100 TB read for one bad record) and
  * never a silent drop (DROPMALFORMED loses rows unaccountably).
  *
  * Record grammar parsed (ISO 28500 §4): `WARC/<version>` line,
  * CRLF-separated case-insensitive named headers, `Content-Length`
  * (mandatory — it is the ONLY record-extent marker), CRLFCRLF, then
  * exactly that many content BYTES, then the CRLFCRLF record
  * separator. `response` records with an `application/http` payload
  * are split one level further: HTTP status line → `http_status`,
  * HTTP `Content-Type` header → `content_type`, HTTP body (decoded
  * UTF-8 — the charset-sniffing refinement is a documented cutoff) →
  * `body`; other record types (`warcinfo`, `request`, `metadata`)
  * carry their raw content as `body` with a null status.
  *
  * Quarantine + RESYNC: a record whose version line is not `WARC/…`
  * or whose `Content-Length` is missing/unparsable/overruns the file
  * cannot be skipped by length — the reader captures the bytes from
  * the failure point to the next `WARC/` magic at line start (the
  * standard WARC recovery heuristic; a body carrying a line-initial
  * `WARC/` would resync early — documented, and real WARC writers
  * length-prefix exactly so this never matters on well-formed files)
  * into one quarantine row and continues there. Corollary: two
  * CONSECUTIVE magic-less records collapse into one quarantine block
  * (there is no boundary to resync on between them) — honest reader
  * behavior; the hash gates keep their planted corruptions
  * non-adjacent by in-partition id order so the per-record oracle
  * stays exact. Parsing is strictly
  * deterministic — the `q_warc_scan` gate writes a fixture with
  * PLANTED corruptions and the DuckDB oracle re-derives every row,
  * quarantine snippets included, from the construction.
  *
  * Scale shape: `binaryFile` scan — one task per WARC file, thousands
  * of files at crawl scale ⇒ full cluster parallelism; parsing is
  * per-file streaming over the byte array, no shuffle, no driver
  * involvement. WARC files are conventionally rotated at ~1 GB, which
  * bounds per-task memory (the format is not block-splittable — the
  * per-record gzip variant that would stream within a file is a
  * documented cutoff). The writer mirrors the sharded-sink posture:
  * one `.warc` file per partition, records self-contained. */
object WarcScan {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("fetch_ts", TimestampType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("corrupt", StringType, nullable = true)))

  /** How many characters of a quarantined block `corrupt` keeps —
    * enough to identify the record, bounded so a huge broken record
    * cannot balloon the row. */
  val CorruptSnippetChars = 100

  /** Read `.warc` / `.warc.gz` files under `pathGlob` into the typed
    * relation. Gzipped files (detected by magic, not extension) are
    * the Common Crawl convention — each record its own gzip MEMBER,
    * members concatenated — which `GZIPInputStream` consumes
    * transparently (it reads concatenated members as one stream); a
    * truncated/garbled member quarantines the rest of the file with a
    * `GZIP-CORRUPT` snippet while everything decompressed before it
    * still parses. Empty/missing glob → typed empty relation (the
    * [[Scan.csv]] tolerance contract). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(pathGlob)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = fs.globStatus(new org.apache.hadoop.fs.Path(pathGlob))
    if (matched == null || matched.isEmpty)
      return Scan.emptyRelation(spark, schema)
    parsed(spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content"))
  }

  /** `(path, content)` rows → the typed relation: gunzip when the
    * magic says so, parse, append the `GZIP-CORRUPT` quarantine row
    * when a member died mid-file. Shared by [[read]] and
    * [[readStream]]. */
  private def parsed(bin: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    bin.flatMap { row =>
      val (bytes, gzErr) = gunzipIfNeeded(row.getAs[Array[Byte]](1))
      val rows = parseFile(row.getString(0), bytes)
      gzErr match {
        case None => rows
        case Some(msg) => rows ++ Iterator.single(Row(row.getString(0),
          null, null, null, null, null, null, null,
          s"GZIP-CORRUPT: $msg".take(CorruptSnippetChars)))
      }
    }(enc)
  }

  /** WARC files as a STREAM — the crawl loop's real input shape under
    * the streaming runner: each micro-batch parses the batch's
    * newly-arrived `.warc`/`.warc.gz` files into the same typed
    * relation as [[read]] (quarantine contract included). File-based
    * `binaryFile` source, so batch sizing is `maxFilesPerTrigger` and
    * a batch's parallelism is its file count — exactly the batch
    * scan's per-file task model, micro-batched. Parsing is stateless
    * per file, so the union of the stream's batches must equal the
    * one-shot batch read row-for-row (the `q_stream_warc_scan`
    * gate). */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    parsed(spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select("path", "content"))
  }

  /** Decompress when the gzip magic is present (per-record members
    * concatenate into one stream); returns the usable bytes plus an
    * error note when the stream dies mid-file — the bytes decoded
    * before the bad member still parse, the remainder quarantines. */
  private[graft] def gunzipIfNeeded(
      bytes: Array[Byte]): (Array[Byte], Option[String]) = {
    if (bytes.length < 2 ||
      (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B)
      return (bytes, None)
    // start at the compressed size and let the stream grow — a
    // multiplied preallocation overflows Int for ~0.5 GB files (the
    // normal Common Crawl rotation size) and eagerly burns memory
    val out = new java.io.ByteArrayOutputStream(
      math.max(64 * 1024, bytes.length))
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      (out.toByteArray, None)
    } catch {
      case e: java.io.IOException =>
        (out.toByteArray, Some(String.valueOf(e.getMessage)))
    }
  }

  /** Parse one WARC file's bytes into rows — exposed for specs. */
  private[graft] def parseFile(file: String,
      bytes: Array[Byte]): Iterator[Row] = new Iterator[Row] {
    private var i = 0
    skipSeparators()

    private def skipSeparators(): Unit = {
      while (i < bytes.length &&
        (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
    }

    override def hasNext: Boolean = i < bytes.length

    override def next(): Row = {
      val row = parseRecord()
      skipSeparators()
      row
    }

    /** The next `WARC/` magic at line start strictly after `from`;
      * file length when none — the quarantine resync target. */
    private def nextMagic(from: Int): Int = {
      var j = from + 1
      while (j + 5 <= bytes.length) {
        if (bytes(j) == 'W' && (j == 0 || bytes(j - 1) == '\n') &&
          bytes(j + 1) == 'A' && bytes(j + 2) == 'R' &&
          bytes(j + 3) == 'C' && bytes(j + 4) == '/') return j
        j += 1
      }
      bytes.length
    }

    private def quarantine(from: Int): Row = {
      val to = nextMagic(from)
      val snippet = new String(bytes, from, to - from, UTF_8)
        .take(CorruptSnippetChars)
      i = to
      Row(file, null, null, null, null, null, null, null, snippet)
    }

    private def indexOfCrlfCrlf(from: Int): Int = {
      var j = from
      while (j + 3 < bytes.length) {
        if (bytes(j) == '\r' && bytes(j + 1) == '\n' &&
          bytes(j + 2) == '\r' && bytes(j + 3) == '\n') return j
        j += 1
      }
      -1
    }

    private def parseRecord(): Row = {
      val start = i
      val hdrEnd = indexOfCrlfCrlf(start)
      if (hdrEnd < 0) return quarantine(start)
      val hdrText = new String(bytes, start, hdrEnd - start, UTF_8)
      val lines = hdrText.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/"))
        return quarantine(start)
      val headers = lines.drop(1).flatMap { l =>
        val at = l.indexOf(':')
        if (at <= 0) None
        else Some(l.substring(0, at).trim
          .toLowerCase(java.util.Locale.ROOT) -> l.substring(at + 1).trim)
      }.toMap
      // the upper bound also guards the Int conversion below — a
      // corrupt multi-GB Content-Length must quarantine, not wrap
      // negative and walk the cursor backwards
      val lenOpt = headers.get("content-length")
        .flatMap(v => v.toLongOption)
        .filter(l => l >= 0 && l <= bytes.length.toLong)
      if (lenOpt.isEmpty) return quarantine(start)
      val len = lenOpt.get.toInt
      val contentStart = hdrEnd + 4
      // Long arithmetic: the Int sum wraps for GB-scale files with a
      // corrupt near-file-size length, which would pass this check and
      // crash the slice instead of quarantining
      if (contentStart.toLong + len > bytes.length) return quarantine(start)
      i = contentStart + len
      val warcType = headers.get("warc-type").orNull
      val ts = headers.get("warc-date").flatMap { d =>
        try Some(java.sql.Timestamp.from(java.time.Instant.parse(d)))
        catch { case _: java.time.format.DateTimeParseException => None }
      }.orNull
      val isHttp = warcType == "response" &&
        headers.get("content-type").exists(_.startsWith("application/http")) &&
        len >= 5 && new String(bytes, contentStart, 5, UTF_8) == "HTTP/"
      if (!isHttp) {
        Row(file, headers.get("warc-record-id").orNull, warcType,
          headers.get("warc-target-uri").orNull, ts, null,
          headers.get("content-type").orNull,
          new String(bytes, contentStart, len, UTF_8), null)
      } else {
        val http = new String(bytes, contentStart, len, UTF_8)
        val bodyAt = http.indexOf("\r\n\r\n")
        val (head, body) =
          if (bodyAt < 0) (http, "")
          else (http.substring(0, bodyAt), http.substring(bodyAt + 4))
        val headLines = head.split("\r\n")
        val status = headLines(0).split(" ")
          .lift(1).flatMap(_.toIntOption).map(Int.box).orNull
        val httpCt = headLines.drop(1).collectFirst {
          case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith("content-type:") => l.substring(13).trim
        }.orNull
        Row(file, headers.get("warc-record-id").orNull, warcType,
          headers.get("warc-target-uri").orNull, ts, status, httpCt,
          body, null)
      }
    }
  }

  /** Write `(id, url, ts, html, status)` rows as WARC `response`
    * records, one `.warc` file per partition (the sharded-sink
    * posture — records are self-contained, so file assignment and
    * in-file order are free). `flagCol` plants CORRUPTIONS for the
    * quarantine gate: `'magic'` breaks the version line (`GARB/1.0`),
    * `'nolen'` omits `Content-Length`; `''` writes a well-formed
    * record. Content-Length counts UTF-8 BYTES per the spec.
    * `gzip = true` writes the Common Crawl `.warc.gz` convention —
    * each record its OWN gzip member, members concatenated — which is
    * what makes per-record random access and streaming decompression
    * possible on real archives. */
  def write(docs: DataFrame, idCol: String, urlCol: String, tsCol: String,
      htmlCol: String, statusCol: String, flagCol: String,
      path: String, gzip: Boolean = false): Unit = {
    Seq(idCol, urlCol, tsCol, htmlCol, statusCol, flagCol).foreach(c =>
      require(docs.columns.contains(c), s"column $c absent"))
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    import org.apache.spark.sql.functions.col
    docs.select(col(idCol).cast("long"), col(urlCol), col(tsCol),
        col(htmlCol), col(statusCol).cast("int"), col(flagCol))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          // executor-side FS from the default Hadoop config — on a real
          // cluster core-site.xml rides the executor classpath
          val p = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d.warc" + (if (gzip) ".gz" else ""))
          val efs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val out = efs.create(p, true)
          try it.foreach { r =>
            val rec = recordBytes(r.getLong(0), r.getString(1),
              r.getTimestamp(2), r.getString(3), r.getInt(4),
              r.getString(5))
            out.write(if (gzip) gzipMember(rec) else rec)
          } finally out.close()
        }
      }
  }

  /** One record as one complete gzip MEMBER (members concatenate into
    * the `.warc.gz` file). Compressed to bytes so each member's
    * Deflater is closed deterministically — a per-record
    * `GZIPOutputStream` over the file handle would leak native
    * Deflater memory until GC (`finish()` does not `end()` it). */
  private[graft] def gzipMember(rec: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec)
    gz.close() // ends the member AND its deflater; bos is unaffected
    bos.toByteArray
  }

  private def statusText(code: Int): String = code match {
    case 200 => "OK"
    case 404 => "Not Found"
    case other => s"Status $other"
  }

  private[graft] def recordBytes(id: Long, url: String,
      ts: java.sql.Timestamp, html: String, status: Int,
      flag: String): Array[Byte] = {
    val date = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(ts.toInstant)
    val http = s"HTTP/1.1 $status ${statusText(status)}\r\n" +
      s"Content-Type: text/html; charset=utf-8\r\n\r\n$html"
    val httpBytes = http.getBytes(UTF_8)
    val magic = if (flag == "magic") "GARB/1.0" else "WARC/1.0"
    val lenLine =
      if (flag == "nolen") "" else s"Content-Length: ${httpBytes.length}\r\n"
    val hdr = s"$magic\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      lenLine + "\r\n"
    val hdrBytes = hdr.getBytes(UTF_8)
    val sep = "\r\n\r\n".getBytes(UTF_8)
    val outArr = new Array[Byte](hdrBytes.length + httpBytes.length + sep.length)
    System.arraycopy(hdrBytes, 0, outArr, 0, hdrBytes.length)
    System.arraycopy(httpBytes, 0, outArr, hdrBytes.length, httpBytes.length)
    System.arraycopy(sep, 0, outArr, hdrBytes.length + httpBytes.length, sep.length)
    outArr
  }
}
