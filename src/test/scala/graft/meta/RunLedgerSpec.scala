package graft.meta

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.JsonDSL._
import org.scalatest.funsuite.AnyFunSuite

class RunLedgerSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("ledger")

  private def rec(id: String, n: Int): JObject =
    ("run_id" -> id) ~ ("n" -> n)

  test("append + read round-trips JSONL records") {
    val p = tmp().resolve("runs.jsonl").toString
    RunLedger.append(p, rec("r1", 1))
    RunLedger.append(p, rec("r2", 2))
    val rows = RunLedger.read(p)
    assert(rows.size == 2)
    assert((rows.head \ "run_id") == JString("r1"))
  }

  test("dedupeKeepLast: last occurrence wins, empty ids all kept") {
    val p = tmp().resolve("runs.jsonl").toString
    RunLedger.append(p, rec("r1", 1))
    RunLedger.append(p, rec("r2", 2))
    RunLedger.append(p, rec("r1", 3)) // supersedes first r1
    RunLedger.append(p, ("n" -> 4): JObject) // no run_id → kept
    RunLedger.append(p, ("run_id" -> "") ~ ("n" -> 5)) // empty id → kept
    val removed = RunLedger.dedupeKeepLast(p)
    assert(removed == 1)
    val rows = RunLedger.read(p)
    assert(rows.size == 4)
    val r1 = rows.find(r => (r \ "run_id") == JString("r1")).get
    assert((r1 \ "n") == JInt(3))
  }

  test("rotation shifts backups at size threshold") {
    val dir = tmp()
    val p = dir.resolve("runs.jsonl").toString
    val small = RunLedger.Config(maxBytes = 50, maxBackups = 2)
    (1 to 10).foreach(i => RunLedger.append(p, rec(s"r$i", i), small))
    assert(Files.exists(Paths.get(s"$p.1"))) // rotated at least once
    assert(RunLedger.read(p).nonEmpty)
  }

  test("mergeLegacy appends lines and deletes the legacy file") {
    val dir = tmp()
    val canonical = dir.resolve("runs.jsonl").toString
    val legacy = dir.resolve("runs.josnl").toString // the reference's typo file
    RunLedger.append(canonical, rec("a", 1))
    RunLedger.append(legacy, rec("b", 2))
    RunLedger.normalize(canonical, Seq(legacy))
    assert(!Files.exists(Paths.get(legacy)))
    assert(RunLedger.read(canonical).size == 2)
  }

  test("upsertGlobalPretty truncates keep-last-N") {
    val p = tmp().resolve("all.json").toString
    val cfg = RunLedger.Config(globalKeepLast = 3)
    (1 to 5).foreach(i => RunLedger.upsertGlobalPretty(p, rec(s"r$i", i), cfg))
    val arr = org.json4s.jackson.JsonMethods.parse(
      new String(Files.readAllBytes(Paths.get(p)), "UTF-8")).asInstanceOf[JArray]
    assert(arr.arr.size == 3)
    assert((arr.arr.head \ "run_id") == JString("r3"))
  }
}
