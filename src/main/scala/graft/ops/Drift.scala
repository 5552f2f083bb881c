package graft.ops

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Rowcount-drift detection with cross-run file state (SURVEY §2.9 T2,
  * §2.11 Q5 ≙ `check_rowcount_drift`, `tasks/quality_parallel.py:159-189`).
  *
  * State is a single scalar persisted to `rowcount.txt` — kept as plain
  * file state for reference parity (the streaming-native upgrade path is a
  * `mapGroupsWithState` keyed by object name; see graft.streaming).
  */
object Drift {

  final case class DriftResult(
      currentRows: Long,
      previousRows: Option[Long],
      ratio: Option[Double],
      alert: Option[String])

  /** Relative-change check: `|cur - prev| / prev ≥ threshold` → alert
    * (`quality_parallel.py:176-184`; default threshold 0.5). Always
    * persists the current count for the next run
    * (`quality_parallel.py:188`). */
  def checkRowcountDrift(
      currentRows: Long,
      statePath: String,
      thresholdRatio: Double = 0.5): DriftResult = {
    val p = Paths.get(statePath)
    val previous: Option[Long] =
      if (Files.exists(p))
        scala.util.Try(new String(Files.readAllBytes(p)).trim.toLong).toOption
      else None

    val (ratio, alert) = previous match {
      case Some(prev) if prev > 0 =>
        val r = math.abs(currentRows - prev).toDouble / prev
        val a =
          if (r >= thresholdRatio)
            Some(f"Row count drift ${r * 100}%.1f%% (prev=$prev, current=$currentRows)")
          else None
        (Some(r), a)
      case _ => (None, None)
    }

    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, currentRows.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    DriftResult(currentRows, previous, ratio, alert)
  }
}
