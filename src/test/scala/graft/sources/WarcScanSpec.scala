package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarcScanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1767225600L + s))

  test("write → read round-trip: typed rows, 404s, UTF-8 bodies") {
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString
    val docs = Seq(
      (1L, "http://a.com/1", ts(1), "hello <b>world</b>", 200, ""),
      (2L, "http://a.com/2", ts(2), "café ≠ cafe\nline2", 200, ""),
      (3L, "http://a.com/3", ts(3), "gone", 404, ""))
      .toDF("id", "url", "t", "html", "status", "flag")
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    val back = WarcScan.read(spark, dir + "/*.warc")
      .orderBy("record_id").collect()
    assert(back.length == 3)
    val r1 = back.head
    assert(r1.getAs[String]("record_id") == "<urn:graft:1>")
    assert(r1.getAs[String]("warc_type") == "response")
    assert(r1.getAs[String]("url") == "http://a.com/1")
    assert(r1.getAs[java.sql.Timestamp]("fetch_ts") == ts(1))
    assert(r1.getAs[Int]("http_status") == 200)
    assert(r1.getAs[String]("content_type") == "text/html; charset=utf-8")
    assert(r1.getAs[String]("body") == "hello <b>world</b>")
    assert(r1.getAs[String]("corrupt") == null)
    // multi-byte body survives the byte-exact Content-Length slice
    assert(back(1).getAs[String]("body") == "café ≠ cafe\nline2")
    assert(back(2).getAs[Int]("http_status") == 404)
  }

  test("planted corruptions quarantine with a bounded snippet and RESYNC") {
    val dir = java.nio.file.Files.createTempDirectory("warc_q").toString
    val docs = Seq(
      (1L, "http://a.com/1", ts(1), "ok one", 200, ""),
      (2L, "http://a.com/2", ts(2), "broken magic", 200, "magic"),
      (3L, "http://a.com/3", ts(3), "no length", 200, "nolen"),
      (4L, "http://a.com/4", ts(4), "ok two", 200, ""))
      .toDF("id", "url", "t", "html", "status", "flag")
      .coalesce(1) // one file: corrupt records sit BETWEEN good ones
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    val back = WarcScan.read(spark, dir + "/*.warc").collect()
    val good = back.filter(_.getAs[String]("corrupt") == null)
    val bad = back.filter(_.getAs[String]("corrupt") != null)
    // the reader resynced past BOTH corrupt records
    assert(good.map(_.getAs[String]("record_id")).sorted.toSeq ==
      Seq("<urn:graft:1>", "<urn:graft:4>"))
    assert(bad.length == 2)
    val snippets = bad.map(_.getAs[String]("corrupt")).sorted
    assert(snippets.forall(_.length == WarcScan.CorruptSnippetChars))
    assert(snippets.exists(_.startsWith("GARB/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:2>")))
    assert(snippets.exists(_.startsWith("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:3>")))
    // quarantined rows carry NO data columns
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("record_id")) &&
      r.isNullAt(r.fieldIndex("body"))))
  }

  test("non-HTTP records, truncated files, bad dates — tolerant typed rows") {
    val info = "WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:graft:info>\r\nWARC-Date: not-a-date\r\n" +
      "Content-Type: application/warc-fields\r\nContent-Length: 9\r\n\r\n" +
      "robots: x\r\n\r\n"
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort"
    val rows = WarcScan.parseFile("f",
      (info + truncated).getBytes(UTF_8)).toSeq
    assert(rows.length == 2)
    val r0 = rows.head
    assert(r0.getString(2) == "warcinfo") // warc_type
    assert(r0.get(4) == null) // unparsable date → null ts, not a failure
    assert(r0.get(5) == null) // no http status for non-http payload
    assert(r0.getString(6) == "application/warc-fields")
    assert(r0.getString(7) == "robots: x") // raw content as body
    // the overrunning Content-Length quarantines the tail
    assert(rows(1).getString(9) != null &&
      rows(1).getString(9).startsWith("WARC/1.0"))
  }

  test("warc.gz: per-record gzip members round-trip byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("warc_gz").toString
    val docs = Seq(
      (1L, "http://a.com/1", ts(1), "hello café ≠", 200, ""),
      (2L, "http://a.com/2", ts(2), "broken", 200, "magic"),
      (3L, "http://a.com/3", ts(3), "three", 404, ""))
      .toDF("id", "url", "t", "html", "status", "flag").coalesce(1)
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag",
      dir, gzip = true)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1)
    // raw bytes start with the gzip magic, not WARC text
    val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(2)
    assert((head(0) & 0xFF) == 0x1F && (head(1) & 0xFF) == 0x8B)
    val back = WarcScan.read(spark, dir + "/*.warc.gz").collect()
    assert(back.length == 3)
    val good = back.filter(_.getAs[String]("corrupt") == null)
      .sortBy(_.getAs[String]("record_id"))
    assert(good.map(_.getAs[String]("body")).toSeq ==
      Seq("hello café ≠", "three"))
    // the WARC-level corruption still quarantines through the gz layer
    assert(back.count(_.getAs[String]("corrupt") != null) == 1)
  }

  test("warc.gz: a truncated member quarantines, earlier records survive") {
    val dir = java.nio.file.Files.createTempDirectory("warc_gzc").toString
    val rec1 = WarcScan.gzipMember(WarcScan.recordBytes(
      1L, "http://a.com/1", ts(1), "ok", 200, ""))
    val rec2 = WarcScan.gzipMember(WarcScan.recordBytes(
      2L, "http://a.com/2", ts(2), "gone", 200, ""))
    // truncate the second member mid-stream
    val bytes = rec1 ++ rec2.take(rec2.length / 2)
    val f = java.nio.file.Paths.get(dir, "x.warc.gz")
    java.nio.file.Files.write(f, bytes)
    val back = WarcScan.read(spark, dir + "/*.warc.gz").collect()
    val good = back.filter(_.getAs[String]("corrupt") == null)
    assert(good.map(_.getAs[String]("record_id")).toSeq ==
      Seq("<urn:graft:1>"))
    // the inflater may surface a partial rec2 prefix before failing —
    // that prefix then quarantines at the WARC level too; the
    // contract is: a GZIP-CORRUPT row is present and NO partial
    // record ever parses as good
    val bad = back.filter(_.getAs[String]("corrupt") != null)
    assert(bad.nonEmpty &&
      bad.exists(_.getAs[String]("corrupt").startsWith("GZIP-CORRUPT:")))
  }

  test("warc.gz: a garbled member RESYNCS — later members' records survive") {
    // the JDK's concatenated-GZIPInputStream reader treats a garbled
    // next-member header as clean EOF (a SILENT drop of the rest of
    // the file); the member walk must instead quarantine the garbage
    // and resync on the next member's magic
    val dir = java.nio.file.Files.createTempDirectory("warc_gzr").toString
    val rec1 = WarcScan.gzipMember(WarcScan.recordBytes(
      1L, "http://a.com/1", ts(1), "ok one", 200, ""))
    val rec3 = WarcScan.gzipMember(WarcScan.recordBytes(
      3L, "http://a.com/3", ts(3), "ok three", 200, ""))
    val garbage = "THIS IS NOT A GZIP MEMBER AT ALL".getBytes(UTF_8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "x.warc.gz"), rec1 ++ garbage ++ rec3)
    val back = WarcScan.read(spark, dir + "/*.warc.gz").collect()
    val good = back.filter(_.getAs[String]("corrupt") == null)
    assert(good.map(_.getAs[String]("record_id")).sorted.toSeq ==
      Seq("<urn:graft:1>", "<urn:graft:3>"))
    val bad = back.filter(_.getAs[String]("corrupt") != null)
    assert(bad.length == 1 &&
      bad.head.getAs[String]("corrupt").startsWith("GZIP-CORRUPT:"))
  }

  test("warc.gz: a CRC-mismatched member yields NO records, only the break") {
    // data that inflates cleanly but fails its trailer CRC is the one
    // corruption shape the WARC layer cannot catch (it could parse as
    // a wrong-but-well-formed record) — the member's bytes must be
    // withheld, not emitted
    val dir = java.nio.file.Files.createTempDirectory("warc_gzcrc").toString
    val rec1 = WarcScan.gzipMember(WarcScan.recordBytes(
      1L, "http://a.com/1", ts(1), "ok one", 200, ""))
    val rec2 = WarcScan.gzipMember(WarcScan.recordBytes(
      2L, "http://a.com/2", ts(2), "poisoned", 200, ""))
    rec2(rec2.length - 6) = (rec2(rec2.length - 6) ^ 0x55).toByte // CRC32 byte
    val rec3 = WarcScan.gzipMember(WarcScan.recordBytes(
      3L, "http://a.com/3", ts(3), "ok three", 200, ""))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "x.warc.gz"), rec1 ++ rec2 ++ rec3)
    val back = WarcScan.read(spark, dir + "/*.warc.gz").collect()
    val good = back.filter(_.getAs[String]("corrupt") == null)
    assert(good.map(_.getAs[String]("record_id")).sorted.toSeq ==
      Seq("<urn:graft:1>", "<urn:graft:3>"))
    assert(!back.exists(r => Option(r.getAs[String]("body"))
      .exists(_.contains("poisoned"))))
    assert(back.count(r => Option(r.getAs[String]("corrupt"))
      .exists(_.contains("CRC32 mismatch"))) == 1)
  }

  test("warc.gz: a record SPANNING two members parses whole (demand path)") {
    // general .warc.gz need not be one-record-per-member — the
    // decompressed stream is the concatenation, and a record may
    // straddle a member boundary
    val rec = WarcScan.recordBytes(7L, "http://a.com/7", ts(7),
      "split across members", 200, "")
    val half = rec.length / 2
    val bytes = WarcScan.gzipMember(rec.take(half)) ++
      WarcScan.gzipMember(rec.drop(half))
    val rows = new WarcScan.WarcRecordIterator("f",
      WarcScan.gzipMemberChunks(bytes)).toSeq
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "<urn:graft:7>")
    assert(rows.head.getString(7) == "split across members")
  }

  test("warc.gz streams member-by-member: pending stays O(member), not O(file)") {
    // a ~256 MB-inflated archive must never hold more than ~one
    // member in the parse buffer — the whole-file inflate this
    // replaced held all of it
    val body = "a" * (1024 * 1024)
    val one = WarcScan.recordBytes(1L, "http://a.com/big", ts(1),
      body, 200, "")
    val member = WarcScan.gzipMember(one) // 'a'*1M compresses ~1 KB
    val n = 256
    val bytes = new java.io.ByteArrayOutputStream(member.length * n)
    (1 to n).foreach(_ => bytes.write(member))
    val it = new WarcScan.WarcRecordIterator("f",
      WarcScan.gzipMemberChunks(bytes.toByteArray))
    var rows = 0
    it.foreach { r => assert(r.getString(9) == null); rows += 1 }
    assert(rows == n)
    val totalInflated = one.length.toLong * n
    assert(totalInflated > 250L * 1024 * 1024)
    assert(it.maxPendingBytes < 8 * 1024 * 1024,
      s"pending high-water ${it.maxPendingBytes} — not streaming")
  }

  test("charset: HTTP-declared ISO-8859-1 and <meta charset> fallback decode") {
    val dir = java.nio.file.Files.createTempDirectory("warc_cs").toString
    val docs = Seq(
      (1L, "http://a.com/1", ts(1), "Résumé café Ñº", 200, "latin1"),
      (2L, "http://a.com/2", ts(2),
        "<meta charset=\"iso-8859-1\">Füße größer", 200, "meta8859"),
      (3L, "http://a.com/3", ts(3), "plain utf-8 café", 200, ""))
      .toDF("id", "url", "t", "html", "status", "flag").coalesce(1)
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    // the wire bytes for row 1 are genuinely ISO-8859-1 (é = 0xE9,
    // not the UTF-8 0xC3 0xA9) — a blind-UTF-8 reader would mojibake
    val raw = java.nio.file.Files.readAllBytes(
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc")).head.toPath)
    val rawStr = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(rawStr.contains("Résumé")) // é as ONE byte in the wire
    val back = WarcScan.read(spark, dir + "/*.warc")
      .orderBy("record_id").collect()
    assert(back(0).getAs[String]("body") == "Résumé café Ñº")
    assert(back(0).getAs[String]("content_type") ==
      "text/html; charset=iso-8859-1")
    assert(back(1).getAs[String]("body") ==
      "<meta charset=\"iso-8859-1\">Füße größer")
    assert(back(1).getAs[String]("content_type") == "text/html")
    assert(back(2).getAs[String]("body") == "plain utf-8 café")
  }

  test("charset: a BOM outranks a lying Content-Type charset") {
    val body = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "café ≠".getBytes(UTF_8)
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=iso-8859-1\r\n\r\n").getBytes(UTF_8)
    val http = head ++ body
    val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\n" +
      "WARC-Target-URI: http://a.com/x\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(UTF_8)
    val rows = WarcScan.parseFile("f",
      hdr ++ http ++ "\r\n\r\n".getBytes(UTF_8)).toSeq
    assert(rows.length == 1)
    // decoded as UTF-8 (BOM wins); the BOM itself survives as U+FEFF
    assert(rows.head.getString(7) == "﻿café ≠")
  }

  test("charset: unknown or unsupported labels fall back to UTF-8") {
    val body = "plain café".getBytes(UTF_8)
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=x-no-such-charset-9\r\n\r\n")
      .getBytes(UTF_8)
    val http = head ++ body
    val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:2>\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(UTF_8)
    val rows = WarcScan.parseFile("f",
      hdr ++ http ++ "\r\n\r\n".getBytes(UTF_8)).toSeq
    assert(rows.length == 1 && rows.head.getString(7) == "plain café")
  }

  test("redirects: a 3xx record surfaces its Location header") {
    val dir = java.nio.file.Files.createTempDirectory("warc_rd").toString
    val docs = Seq(
      (1L, "http://a.com/old", ts(1), "moved", 301, "redir"),
      (2L, "http://a.com/two", ts(2), "fine", 200, ""))
      .toDF("id", "url", "t", "html", "status", "flag").coalesce(1)
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    val back = WarcScan.read(spark, dir + "/*.warc")
      .orderBy("record_id").collect()
    assert(back(0).getAs[Int]("http_status") == 301)
    assert(back(0).getAs[String]("location") == "http://a.com/old/next")
    assert(back(1).getAs[String]("location") == null)
  }

  test("write commits via attempt-unique temp paths — no .tmp residue") {
    val dir = java.nio.file.Files.createTempDirectory("warc_tmp").toString
    val docs = (1L to 4L).map(i =>
        (i, s"http://a.com/$i", ts(i), s"doc $i", 200, ""))
      .toDF("id", "url", "t", "html", "status", "flag").repartition(2)
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".tmp")), names.mkString(","))
    assert(WarcScan.read(spark, dir + "/*.warc").count() == 4L)
  }

  test("resync collapse: consecutive magic-less records are ONE quarantine block") {
    // there is no boundary to resync on between two broken-magic
    // records — the standard heuristic honestly yields a single
    // quarantine row covering both (the gates keep planted
    // corruptions non-adjacent so their per-record oracles stay exact)
    val bytes = WarcScan.recordBytes(1L, "http://a.com/1", ts(1), "ok", 200, "") ++
      WarcScan.recordBytes(2L, "http://a.com/2", ts(2), "bad1", 200, "magic") ++
      WarcScan.recordBytes(3L, "http://a.com/3", ts(3), "bad2", 200, "magic") ++
      WarcScan.recordBytes(4L, "http://a.com/4", ts(4), "ok2", 200, "")
    val rows = WarcScan.parseFile("f", bytes).toSeq
    assert(rows.count(_.getString(9) == null) == 2) // records 1 and 4
    val bad = rows.filter(_.getString(9) != null)
    assert(bad.length == 1 &&
      bad.head.getString(9).startsWith("GARB/1.0"))
  }

  test("empty or missing path yields the typed empty relation") {
    val df = WarcScan.read(spark, "/tmp/definitely_missing_dir_x/*.warc")
    assert(df.schema == WarcScan.schema)
    assert(df.count() == 0L)
  }

  test("scan parallelism: one task per WARC file") {
    val dir = java.nio.file.Files.createTempDirectory("warc_p").toString
    val docs = (1L to 8L).map(i =>
        (i, s"http://a.com/$i", ts(i), s"doc $i", 200, ""))
      .toDF("id", "url", "t", "html", "status", "flag")
      .repartition(4)
    WarcScan.write(docs, "id", "url", "t", "html", "status", "flag", dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc"))
    assert(files >= 2, s"expected multiple part files, got $files")
    assert(WarcScan.read(spark, dir + "/*.warc").count() == 8L)
  }
}
