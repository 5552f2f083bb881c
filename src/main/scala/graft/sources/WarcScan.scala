package graft.sources

import java.nio.charset.{Charset, StandardCharsets}
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
  * HTTP `Content-Type` header → `content_type`, HTTP body → `body`,
  * decoded under the page's DECLARED charset — the `charset=`
  * parameter of the HTTP Content-Type when present, else a bounded
  * `<meta charset>` / `<meta http-equiv>` prescan of the body's first
  * 1024 bytes (the HTML5 §13.2.3.2 encoding-sniffing convention),
  * else UTF-8; a BOM outranks both, as in browsers. Other record
  * types (`warcinfo`, `request`, `metadata`) carry their raw content
  * as `body` decoded UTF-8 (WARC headers and warc-fields are UTF-8 by
  * spec) with a null status.
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
  * per-file streaming, no shuffle, no driver involvement. `.warc.gz`
  * files (the Common Crawl convention: one gzip MEMBER per record,
  * members concatenated) decompress MEMBER BY MEMBER through a raw
  * `Inflater` walk of the RFC 1952 grammar — peak task memory is the
  * compressed file plus ONE inflated member (≈ one record), never the
  * whole ~5× inflated archive; CRC32/ISIZE trailers are verified per
  * member, and a garbled member quarantines as `GZIP-CORRUPT` and
  * RESYNCS on the next member's gzip magic, so one bad member costs
  * its own records, not the rest of the file — and never silently
  * (the JDK's concatenated-`GZIPInputStream` reader treats a garbled
  * next-member header as clean EOF, which is exactly the silent drop
  * this reader exists to refuse). WARC files are conventionally
  * rotated at ~1 GB, which bounds the compressed-bytes term. The
  * writer mirrors the sharded-sink posture: one `.warc` file per
  * partition, records self-contained, task-attempt-unique temp paths
  * renamed on success so a speculative retry can never interleave. */
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
    // the HTTP Location header (3xx redirects — the input of
    // [[graft.operators.UrlCuration.resolveRedirects]]); NULL elsewhere
    StructField("location", StringType, nullable = true),
    StructField("corrupt", StringType, nullable = true)))

  /** How many characters of a quarantined block `corrupt` keeps —
    * enough to identify the record, bounded so a huge broken record
    * cannot balloon the row. */
  val CorruptSnippetChars = 100

  /** Read `.warc` / `.warc.gz` files under `pathGlob` into the typed
    * relation. Gzipped files are detected by magic, not extension.
    * Empty/missing glob → typed empty relation (the [[Scan.csv]]
    * tolerance contract). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(pathGlob)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = fs.globStatus(new org.apache.hadoop.fs.Path(pathGlob))
    if (matched == null || matched.isEmpty)
      return Scan.emptyRelation(spark, schema)
    parsed(spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content"))
  }

  /** `(path, content)` rows → the typed relation: the member-streaming
    * gunzip walk when the magic says so, the single-chunk parse
    * otherwise. Shared by [[read]] and [[readStream]]. */
  private def parsed(bin: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    bin.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](1)
      new WarcRecordIterator(row.getString(0), chunksOf(bytes))
    }(enc)
  }

  /** The decompression seam: gzip magic → per-member chunk walk;
    * plain bytes → one zero-copy chunk. */
  private[graft] def chunksOf(
      bytes: Array[Byte]): Iterator[Either[String, Chunk]] =
    if (bytes.length >= 2 &&
      (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
      gzipMemberChunks(bytes)
    else Iterator.single(Right(Chunk(bytes, 0, bytes.length)))

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

  /** A slice of decompressed bytes handed to the record parser. */
  private[graft] final case class Chunk(bytes: Array[Byte], off: Int, len: Int)

  /** Walk a `.warc.gz` file's RFC 1952 members one at a time with a
    * raw `Inflater`: each well-formed member yields its inflated bytes
    * as one `Right(Chunk)` (CRC32 + ISIZE verified against the
    * trailer); a garbled member yields whatever inflated before the
    * failure (a valid PREFIX of real data — deflate is sequential)
    * followed by a `Left(message)` STREAM BREAK, then RESYNCS on the
    * next `1F 8B 08` gzip magic in the compressed bytes. A member
    * whose data inflates cleanly but fails its CRC/ISIZE check yields
    * NO bytes (they inflate to plausible garbage that could parse as a
    * wrong-but-well-formed record — the one shape of corruption the
    * WARC layer cannot catch), only the break. Trailing non-member
    * garbage after the last member is a break too, never a silent
    * EOF. Peak memory: the compressed array plus one inflated member.
    */
  private[graft] def gzipMemberChunks(
      bytes: Array[Byte]): Iterator[Either[String, Chunk]] =
    new Iterator[Either[String, Chunk]] {
      private var p = 0
      private val queue =
        scala.collection.mutable.Queue.empty[Either[String, Chunk]]
      // ONE inflater + output/scratch buffer per FILE, reset between
      // members — a fresh 64 KB pair per member is ~64 GB of allocation
      // churn on a 500k-record archive (measured 2.3× on the gz
      // round-trip). The inflater's native memory is freed at
      // exhaustion below; an abandoned iterator falls to Inflater's
      // Cleaner.
      private val inf = new java.util.zip.Inflater(true)
      private val bos = new java.io.ByteArrayOutputStream(64 * 1024)
      private val tmp = new Array[Byte](64 * 1024)
      private var ended = false

      override def hasNext: Boolean = {
        val more = queue.nonEmpty || p < bytes.length
        if (!more && !ended) { ended = true; inf.end() }
        more
      }

      override def next(): Either[String, Chunk] = {
        if (queue.isEmpty) advance()
        queue.dequeue()
      }

      /** Parse one member at `p` into the queue and move `p`; on
        * failure enqueue the partial + break and resync. */
      private def advance(): Unit = {
        val memberAt = p
        def fail(msg: String, partial: Option[Array[Byte]]): Unit = {
          partial.filter(_.nonEmpty)
            .foreach(b => queue.enqueue(Right(Chunk(b, 0, b.length))))
          queue.enqueue(Left(s"$msg at member offset $memberAt"))
          // resync: the next 1F 8B 08 triple strictly after the
          // failed member's start
          var j = memberAt + 1
          var found = -1
          while (found < 0 && j + 3 <= bytes.length) {
            if ((bytes(j) & 0xFF) == 0x1F && (bytes(j + 1) & 0xFF) == 0x8B &&
              bytes(j + 2) == 8) found = j
            j += 1
          }
          p = if (found >= 0) found else bytes.length
        }
        // ── RFC 1952 member header
        if (p + 10 > bytes.length)
          return fail(s"truncated gzip header (${bytes.length - p} bytes)", None)
        if ((bytes(p) & 0xFF) != 0x1F || (bytes(p + 1) & 0xFF) != 0x8B)
          return fail("bad gzip member magic", None)
        if (bytes(p + 2) != 8)
          return fail(s"unsupported gzip compression method ${bytes(p + 2)}", None)
        val flg = bytes(p + 3) & 0xFF
        var q = p + 10
        if ((flg & 4) != 0) { // FEXTRA
          if (q + 2 > bytes.length) return fail("truncated gzip FEXTRA", None)
          val xlen = (bytes(q) & 0xFF) | ((bytes(q + 1) & 0xFF) << 8)
          q += 2 + xlen
        }
        if ((flg & 8) != 0) { // FNAME, NUL-terminated
          while (q < bytes.length && bytes(q) != 0) q += 1
          q += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT
          while (q < bytes.length && bytes(q) != 0) q += 1
          q += 1
        }
        if ((flg & 2) != 0) q += 2 // FHCRC
        if (q > bytes.length) return fail("truncated gzip header fields", None)
        // ── inflate the deflate stream (shared inflater, reset per member)
        inf.reset()
        bos.reset()
        inf.setInput(bytes, q, bytes.length - q)
        val crc = new java.util.zip.CRC32
        while (!inf.finished()) {
          val n =
            try inf.inflate(tmp)
            catch { case e: java.util.zip.DataFormatException =>
              return fail(s"corrupt deflate data (${e.getMessage})",
                Some(bos.toByteArray))
            }
          if (n > 0) { bos.write(tmp, 0, n); crc.update(tmp, 0, n) }
          else if (inf.needsInput())
            return fail("truncated gzip member", Some(bos.toByteArray))
        }
        // ── trailer: CRC32 + ISIZE, little-endian
        val trailerAt = q + inf.getBytesRead.toInt
        if (trailerAt + 8 > bytes.length)
          return fail("truncated gzip trailer", Some(bos.toByteArray))
        def le32(at: Int): Long =
          (bytes(at) & 0xFFL) | ((bytes(at + 1) & 0xFFL) << 8) |
            ((bytes(at + 2) & 0xFFL) << 16) | ((bytes(at + 3) & 0xFFL) << 24)
        if (le32(trailerAt) != crc.getValue)
          return fail("gzip CRC32 mismatch", None)
        if (le32(trailerAt + 4) != (bos.size.toLong & 0xFFFFFFFFL))
          return fail("gzip ISIZE mismatch", None)
        val b = bos.toByteArray
        queue.enqueue(Right(Chunk(b, 0, b.length)))
        p = trailerAt + 8
      }
    }

  /** Parse one WARC file's bytes into rows — exposed for specs; the
    * single-chunk form of [[WarcRecordIterator]]. */
  private[graft] def parseFile(file: String,
      bytes: Array[Byte]): Iterator[Row] =
    new WarcRecordIterator(file,
      Iterator.single(Right(Chunk(bytes, 0, bytes.length))))

  /** Incremental WARC record parser over a chunk supply: holds only
    * the unconsumed suffix of the decompressed stream (compacted as
    * records are emitted — peak [[maxPendingBytes]] ≈ one record plus
    * one chunk in the good path), demanding the next chunk whenever a
    * record spans a chunk boundary. A `Left` in the supply is a
    * STREAM BREAK (a garbled gzip member = a GAP in the logical
    * bytes): whatever is pending quarantines (a record crossing a gap
    * cannot be trusted), the break emits its own `GZIP-CORRUPT` row
    * in position, and parsing restarts clean on the next chunk. The
    * quarantine path may buffer up to the next resync magic — corrupt
    * records are the rare path and the next magic is one record away
    * on real archives. */
  private[graft] final class WarcRecordIterator(
      file: String, chunks: Iterator[Either[String, Chunk]])
    extends Iterator[Row] {

    private var buf = Array.emptyByteArray
    private var start = 0 // first unconsumed byte
    private var end = 0   // filled extent
    /** False while `buf` IS a supplied chunk's array (adopted
      * zero-copy — the plain-file whole-array and the one-record-per-
      * member steady states never copy at all); adopted arrays are
      * never mutated, so growth/compaction first switch to an owned
      * buffer. */
    private var ownsBuf = false
    private var breakMsg: String = null // a Left seen, not yet emitted
    private var supplyDone = false
    private var queued: Row = null
    /** High-water mark of the pending buffer — the spec-visible proof
      * that gz parsing streams instead of inflating whole-file. */
    private[graft] var maxPendingBytes = 0

    /** Pull the next chunk of the CURRENT segment into the buffer;
      * false at a stream break or end of supply. Appends PRESERVE
      * live offsets (growth copies in place, never shifts) — callers
      * hold indices across demand(); only [[advance]] compacts,
      * between records, when no index is live. */
    private def demand(): Boolean = {
      if (breakMsg != null || supplyDone) return false
      var got = false
      while (!got && chunks.hasNext) {
        chunks.next() match {
          case Right(c) if c.len == 0 => // empty member — keep pulling
          case Right(c) =>
            if (end == start) { // empty pending: adopt the chunk zero-copy
              buf = c.bytes; start = c.off; end = c.off + c.len
              ownsBuf = false
            } else {
              if (!ownsBuf || end + c.len > buf.length) {
                val cap = math.max(64 * 1024, math.max(end + c.len,
                  if (ownsBuf) buf.length * 2 else 0))
                val grown = new Array[Byte](cap)
                System.arraycopy(buf, start, grown, start, end - start)
                buf = grown; ownsBuf = true
              }
              System.arraycopy(c.bytes, c.off, buf, end, c.len)
              end += c.len
            }
            maxPendingBytes = math.max(maxPendingBytes, end - start)
            got = true
          case Left(msg) =>
            breakMsg = msg
            return false
        }
      }
      if (!got) supplyDone = true
      got
    }

    private def skipSeparators(): Unit = {
      var more = true
      while (more) {
        while (start < end && (buf(start) == '\r' || buf(start) == '\n'))
          start += 1
        more = start >= end && demand()
      }
    }

    override def hasNext: Boolean = {
      if (queued == null) queued = advance()
      queued != null
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = queued; queued = null; r
    }

    private def advance(): Row = {
      // compact between records (no live indices), amortized O(1)/byte:
      // each shift copies pending ≤ bytes consumed since the last one
      if (ownsBuf && start > 0 && start >= end - start) {
        System.arraycopy(buf, start, buf, 0, end - start)
        end -= start; start = 0
      }
      skipSeparators()
      if (start < end) return parseRecord()
      if (breakMsg != null) { // emit the break, then parse on clean
        val msg = breakMsg; breakMsg = null
        return Row(file, null, null, null, null, null, null, null, null,
          s"GZIP-CORRUPT: $msg".take(CorruptSnippetChars))
      }
      null
    }

    /** The next `WARC/` magic at line start strictly after `from`,
      * demanding more chunks while none is in view; `end` when the
      * segment runs out — the quarantine resync target. */
    private def nextMagic(from: Int): Int = {
      var j = from + 1
      while (true) {
        while (j + 5 <= end) {
          if (buf(j) == 'W' && buf(j - 1) == '\n' &&
            buf(j + 1) == 'A' && buf(j + 2) == 'R' &&
            buf(j + 3) == 'C' && buf(j + 4) == '/') return j
          j += 1
        }
        if (!demand()) return end
      }
      end // unreachable
    }

    private def quarantine(from: Int): Row = {
      val to = nextMagic(from)
      val snippet = new String(buf, from, to - from, UTF_8)
        .take(CorruptSnippetChars)
      start = to
      Row(file, null, null, null, null, null, null, null, null, snippet)
    }

    /** CRLFCRLF at/after `from`, strictly before `limit` (or `end`
      * when `limit` < 0), demanding as needed when `limit` < 0; -1
      * when not found. */
    private def indexOfCrlfCrlf(from: Int, limit: Int): Int = {
      var j = from
      var lim = if (limit < 0) end else limit
      while (true) {
        while (j + 3 < lim) {
          if (buf(j) == '\r' && buf(j + 1) == '\n' &&
            buf(j + 2) == '\r' && buf(j + 3) == '\n') return j
          j += 1
        }
        if (limit >= 0 || !demand()) return -1
        lim = end
      }
      -1 // unreachable
    }

    private def parseRecord(): Row = {
      val recStart = start
      val hdrEnd = indexOfCrlfCrlf(recStart, -1)
      if (hdrEnd < 0) return quarantine(recStart)
      val hdrText = new String(buf, recStart, hdrEnd - recStart, UTF_8)
      val lines = hdrText.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/"))
        return quarantine(recStart)
      val headers = lines.drop(1).flatMap { l =>
        val at = l.indexOf(':')
        if (at <= 0) None
        else Some(l.substring(0, at).trim
          .toLowerCase(java.util.Locale.ROOT) -> l.substring(at + 1).trim)
      }.toMap
      // Int.MaxValue guards the Int conversion — a corrupt multi-GB
      // Content-Length must quarantine, not wrap negative; the demand
      // loop below quarantines honest overruns at end-of-supply
      val lenOpt = headers.get("content-length")
        .flatMap(_.toLongOption)
        .filter(l => l >= 0 && l <= Int.MaxValue - 8)
      if (lenOpt.isEmpty) return quarantine(recStart)
      val len = lenOpt.get.toInt
      val contentStart = hdrEnd + 4
      // Long arithmetic: contentStart + a near-Int.MaxValue corrupt
      // length wraps negative in Int and would pass the bound check
      while (contentStart.toLong + len > end && demand()) ()
      if (contentStart.toLong + len > end) return quarantine(recStart)
      start = contentStart + len
      val warcType = headers.get("warc-type").orNull
      val ts = headers.get("warc-date").flatMap { d =>
        try Some(java.sql.Timestamp.from(java.time.Instant.parse(d)))
        catch { case _: java.time.format.DateTimeParseException => None }
      }.orNull
      val isHttp = warcType == "response" &&
        headers.get("content-type").exists(_.startsWith("application/http")) &&
        len >= 5 && new String(buf, contentStart, 5, UTF_8) == "HTTP/"
      if (!isHttp) {
        Row(file, headers.get("warc-record-id").orNull, warcType,
          headers.get("warc-target-uri").orNull, ts, null,
          headers.get("content-type").orNull,
          new String(buf, contentStart, len, UTF_8), null, null)
      } else {
        // split head/body in BYTES: the head is ASCII-safe by the HTTP
        // grammar, the body decodes under the page's declared charset
        val bodyAt = indexOfCrlfCrlf(contentStart, contentStart + len)
        val (headEnd, bodyOff) =
          if (bodyAt < 0) (contentStart + len, contentStart + len)
          else (bodyAt, bodyAt + 4)
        val head = new String(buf, contentStart, headEnd - contentStart,
          StandardCharsets.ISO_8859_1)
        val headLines = head.split("\r\n")
        val status = headLines(0).split(" ")
          .lift(1).flatMap(_.toIntOption).map(Int.box).orNull
        val httpCt = headLines.drop(1).collectFirst {
          case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith("content-type:") => l.substring(13).trim
        }.orNull
        val httpLoc = headLines.drop(1).collectFirst {
          case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith("location:") => l.substring(9).trim
        }.orNull
        val bodyLen = contentStart + len - bodyOff
        val cs = sniffCharset(httpCt, buf, bodyOff, bodyLen)
        Row(file, headers.get("warc-record-id").orNull, warcType,
          headers.get("warc-target-uri").orNull, ts, status, httpCt,
          new String(buf, bodyOff, bodyLen, cs), httpLoc, null)
      }
    }
  }

  private val CtCharsetRe =
    """(?i)charset\s*=\s*"?\s*([A-Za-z0-9._:\-]+)""".r
  private val MetaCharsetRe =
    ("""(?i)<meta[^>]*\bcharset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""").r

  /** The page's effective charset, HTML5-§13.2.3.2-shaped: a BOM wins
    * (as in browsers), then the HTTP Content-Type's `charset=`
    * parameter, then a bounded prescan of the body's first 1024 bytes
    * for `<meta charset=…>` / `<meta http-equiv … charset=…>` (both
    * spellings carry a `charset=` the one regex sees), then UTF-8.
    * Unknown/unsupported names fall back to UTF-8 — a bad label must
    * not fail the scan. Real crawls are ~5–10% legacy-charset pages;
    * decoding them as blind UTF-8 mojibakes the whole downstream text
    * stack, which is why this sits in the scan, not in curation. */
  private[graft] def sniffCharset(contentType: String,
      bytes: Array[Byte], off: Int, len: Int): Charset = {
    def named(n: String): Option[Charset] =
      try { if (Charset.isSupported(n)) Some(Charset.forName(n)) else None }
      catch { case _: java.nio.charset.IllegalCharsetNameException => None }
    if (len >= 3 && (bytes(off) & 0xFF) == 0xEF &&
      (bytes(off + 1) & 0xFF) == 0xBB && (bytes(off + 2) & 0xFF) == 0xBF)
      return UTF_8
    if (len >= 2 && (bytes(off) & 0xFF) == 0xFE && (bytes(off + 1) & 0xFF) == 0xFF)
      return StandardCharsets.UTF_16BE
    if (len >= 2 && (bytes(off) & 0xFF) == 0xFF && (bytes(off + 1) & 0xFF) == 0xFE)
      return StandardCharsets.UTF_16LE
    val declared = Option(contentType)
      .flatMap(ct => CtCharsetRe.findFirstMatchIn(ct).map(_.group(1)))
      .flatMap(named)
    declared.getOrElse {
      val scanLen = math.min(1024, len)
      val prefix = new String(bytes, off, scanLen, StandardCharsets.ISO_8859_1)
      MetaCharsetRe.findFirstMatchIn(prefix).map(_.group(1))
        .flatMap(named).getOrElse(UTF_8)
    }
  }

  /** Write `(id, url, ts, html, status)` rows as WARC `response`
    * records, one `.warc` file per partition (the sharded-sink
    * posture — records are self-contained, so file assignment and
    * in-file order are free). `flagCol` plants gate axes: `'magic'`
    * breaks the version line (`GARB/1.0`), `'nolen'` omits
    * `Content-Length` — the quarantine corruptions; `'latin1'`
    * declares and encodes the body as ISO-8859-1 (the HTTP-declared
    * legacy-charset axis), `'meta8859'` encodes ISO-8859-1 but
    * declares it ONLY in an in-body `<meta charset>` (the sniff-
    * fallback axis — the html must carry the tag); `''` writes a
    * well-formed UTF-8 record. Content-Length counts encoded BYTES
    * per the spec. `gzip = true` writes the Common Crawl `.warc.gz`
    * convention — each record its OWN gzip member, members
    * concatenated — which is what makes per-record random access and
    * member-streaming decompression possible on real archives.
    *
    * Cluster posture: executors resolve the FileSystem from the
    * DRIVER's Hadoop configuration (broadcast — `spark.hadoop.*`
    * session settings like object-store credentials don't exist in a
    * bare executor `Configuration`), and each task writes an
    * attempt-unique temp file renamed into place on success, so a
    * speculative or retried attempt can never interleave bytes with
    * the original (first rename wins; losers delete their temp). */
  def write(docs: DataFrame, idCol: String, urlCol: String, tsCol: String,
      htmlCol: String, statusCol: String, flagCol: String,
      path: String, gzip: Boolean = false): Unit = {
    Seq(idCol, urlCol, tsCol, htmlCol, statusCol, flagCol).foreach(c =>
      require(docs.columns.contains(c), s"column $c absent"))
    val dir = new org.apache.hadoop.fs.Path(path)
    val hadoopConf = docs.sparkSession.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(hadoopConf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val confBc = docs.sparkSession.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    import org.apache.spark.sql.functions.col
    docs.select(col(idCol).cast("long"), col(urlCol), col(tsCol),
        col(htmlCol), col(statusCol).cast("int"), col(flagCol))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val suffix = ".warc" + (if (gzip) ".gz" else "")
          val finalPath = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d$suffix")
          val tmpPath = new org.apache.hadoop.fs.Path(path,
            f".part-$pid%05d-attempt-${tc.taskAttemptId()}$suffix.tmp")
          val efs = tmpPath.getFileSystem(confBc.value.value)
          val out = efs.create(tmpPath, true)
          try it.foreach { r =>
            val rec = recordBytes(r.getLong(0), r.getString(1),
              r.getTimestamp(2), r.getString(3), r.getInt(4),
              r.getString(5))
            out.write(if (gzip) gzipMember(rec) else rec)
          } finally out.close()
          // commit: first attempt to land the final name wins; a
          // concurrent speculative attempt finds it present (or loses
          // the rename race) and discards its own temp
          if (efs.exists(finalPath) || !efs.rename(tmpPath, finalPath)) {
            efs.delete(tmpPath, false)
            ()
          }
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
    val (ctLine, bodyBytes) = flag match {
      case "latin1" =>
        ("Content-Type: text/html; charset=iso-8859-1",
          html.getBytes(StandardCharsets.ISO_8859_1))
      case "meta8859" =>
        ("Content-Type: text/html",
          html.getBytes(StandardCharsets.ISO_8859_1))
      case _ =>
        ("Content-Type: text/html; charset=utf-8", html.getBytes(UTF_8))
    }
    // the redirect axis: a 3xx response carries a Location header —
    // the input of UrlCuration.resolveRedirects; deterministic target
    // (the record's own URL + '/next') so the oracle reconstructs it
    val locLine =
      if (flag == "redir") s"Location: $url/next\r\n" else ""
    val headBytes = (s"HTTP/1.1 $status ${statusText(status)}\r\n" +
      locLine + s"$ctLine\r\n\r\n").getBytes(UTF_8)
    val httpLen = headBytes.length + bodyBytes.length
    val magic = if (flag == "magic") "GARB/1.0" else "WARC/1.0"
    val lenLine =
      if (flag == "nolen") "" else s"Content-Length: $httpLen\r\n"
    val hdr = s"$magic\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      lenLine + "\r\n"
    val hdrBytes = hdr.getBytes(UTF_8)
    val sep = "\r\n\r\n".getBytes(UTF_8)
    val outArr = new Array[Byte](
      hdrBytes.length + httpLen + sep.length)
    System.arraycopy(hdrBytes, 0, outArr, 0, hdrBytes.length)
    System.arraycopy(headBytes, 0, outArr, hdrBytes.length, headBytes.length)
    System.arraycopy(bodyBytes, 0, outArr,
      hdrBytes.length + headBytes.length, bodyBytes.length)
    System.arraycopy(sep, 0, outArr, hdrBytes.length + httpLen, sep.length)
    outArr
  }
}
