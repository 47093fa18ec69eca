package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Cross-round bench comparison, calib-normalized — the round-9 lesson
  * institutionalized: the sealed r9 total read 1.2× r8, and proving it was
  * pure host contention (calib 1.210 vs 1.050, overlap median exactly the
  * calib delta) required hand-recovering truncated log chunks. This tool
  * joins two bench artifacts, divides out the host-speed ratio measured by
  * each run's own deterministic calibration loop, and names any per-query
  * regression that survives the normalization — so "slower" means the CODE
  * got slower, not the host got busier.
  *
  * Usage: runMain graft.tools.BenchDiff <old.json> <new.json> [threshold]
  *
  * Accepts both artifact shapes:
  *   - the full builder artifact Bench writes (`bench/full_r<N>.json`):
  *     queries are objects `{"sec":…,"p1":…,…}`, calib at `calib.start16`
  *   - the legacy one-line map (`{"queries":{"q1":sec,…},"calib":{…}}`)
  *     recovered from a driver BENCH_r*.json tail
  *
  * Normalization: ratio = newCalib16/oldCalib16 (the 16-thread loop — the
  * contention shape a local[32] executor actually experiences; falls back
  * to start1 when a file lacks start16). normalized = newSec/ratio.
  *
  * A query regresses when BOTH its raw ratio newSec/oldSec AND its
  * calib-normalized ratio exceed the threshold (default 1.5), and either
  * side is ≥0.2s — below that, constant per-query overhead (session
  * round-trips, first-footer reads) dominates and a ratio is noise, not a
  * plan property. The conjunction is the honest test under an uncertain
  * linear host model: the busy-loop calib brackets the true host factor
  * together with 1.0, but Spark totals are not proportional to it when
  * the host QUIETS (measured on this repo: calib 1.21 → 0.68 between the
  * r9 and r10 sealed runs while raw per-query times stayed flat — pure
  * division would have manufactured phantom 1.6× "regressions" out of a
  * run that was raw-FASTER on every overlapping query). When the host got
  * busier, raw inflates and normalized corrects it down (the r9 case);
  * when the host got quieter, normalized inflates and raw is the
  * trustworthy side — a genuine code regression is slower under BOTH.
  *
  * Exit code 1 iff regressions were found, so the tool can gate a round.
  */
object BenchDiff {
  private def calibOf(root: JsonNode): Double = {
    val c = root.path("calib")
    if (c.has("start16")) c.get("start16").asDouble
    else if (c.has("start1")) c.get("start1").asDouble
    else 1.0
  }

  /** Queries whose timed samples were rebuild-tainted in BOTH passes of the
    * new artifact (`rebuilds_p1` and `rebuilds_p2` both > 0) — then even the
    * min-time sample includes a fingerprint-gated artifact rebuild, and the
    * number measures store construction, not the plan (r11's corpus_export
    * adjudication made structural). With one clean pass the min already
    * selects it, so only the both-tainted case is excluded. Artifacts
    * predating the flag yield the empty set. */
  private def rebuildTaintedOf(root: JsonNode): Set[String] =
    root.path("queries").properties().asScala.collect {
      case e if e.getValue.isObject &&
        e.getValue.path("rebuilds_p1").asLong(0L) > 0L &&
        e.getValue.path("rebuilds_p2").asLong(0L) > 0L => e.getKey
    }.toSet

  /** query -> seconds, from either artifact shape; failed entries dropped
    * in BOTH shapes ("err:*" strings in the legacy map, objects carrying
    * an "err" field in the full artifact — a failed query's "sec" is its
    * time-to-exception, and comparing that against a real runtime would
    * let a break masquerade as a speedup or a fix read as a regression). */
  private def timesOf(root: JsonNode): Map[String, Double] =
    root.path("queries").properties().asScala.flatMap { e =>
      val v = e.getValue
      if (v.isNumber) Some(e.getKey -> v.asDouble)
      else if (v.isObject && v.has("sec") && !v.has("err"))
        Some(e.getKey -> v.get("sec").asDouble)
      else None
    }.toMap

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <old.json> <new.json> [threshold]")
    val threshold = if (args.length > 2) args(2).toDouble else 1.5
    val om = new ObjectMapper()
    val oldRoot = om.readTree(new java.io.File(args(0)))
    val newRoot = om.readTree(new java.io.File(args(1)))
    val oldT = timesOf(oldRoot)
    val newT = timesOf(newRoot)
    val ratio = calibOf(newRoot) / calibOf(oldRoot)
    val common = oldT.keySet.intersect(newT.keySet).toSeq.sorted
    require(common.nonEmpty, "no overlapping queries between the two artifacts")

    val rows = common.map { q =>
      val o = oldT(q); val n = newT(q)
      (q, o, n, n / o, (n / ratio) / o)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val oldTotal = common.map(oldT).sum
    val newTotal = common.map(newT).sum
    println(f"[benchdiff] calib old=${calibOf(oldRoot)}%.3f new=${calibOf(newRoot)}%.3f ratio=$ratio%.3f")
    println(f"[benchdiff] overlap=${common.size} oldTotal=$oldTotal%.1fs newTotal=$newTotal%.1fs " +
      f"medianRawRatio=${median(rows.map(_._4))}%.3f medianNormRatio=${median(rows.map(_._5))}%.3f")
    println(s"[benchdiff] added: ${(newT.keySet -- oldT.keySet).toSeq.sorted.mkString(",")}")
    println(s"[benchdiff] removed: ${(oldT.keySet -- newT.keySet).toSeq.sorted.mkString(",")}")

    val overThreshold = rows.filter { case (_, o, n, raw, norm) =>
      math.min(raw, norm) > threshold && (o >= 0.2 || n >= 0.2)
    }
    val tainted = rebuildTaintedOf(newRoot)
    val (excluded, survivors0) = overThreshold.partition(r => tainted.contains(r._1))
    excluded.foreach { case (q, o, n, raw, norm) =>
      println(f"[benchdiff] REBUILD-TAINTED (excluded): $q%-28s old=$o%7.3fs new=$n%7.3fs " +
        f"raw=$raw%5.2fx norm=$norm%5.2fx — both passes rebuilt a gated artifact; re-measure warm")
    }
    // SURVEY §6.1.a declared-band exclusion: an already-adjudicated
    // deliberate trade whose NEW time sits inside its declared band stops
    // surviving every cross-round diff and burying real signal (r12
    // VERDICT item 7 — compaction_plan's fixed two-level overhead).
    // Outside the band it still flags.
    val adjudicated = graft.tools.Adjudicated.load()
    val (banded, regressions) = survivors0.partition { case (q, _, n, _, _) =>
      adjudicated.get(q).flatMap(_.bandSec).exists { case (lo, hi) => n >= lo && n <= hi }
    }
    banded.foreach { case (q, o, n, raw, norm) =>
      val (lo, hi) = adjudicated(q).bandSec.get
      println(f"[benchdiff] ADJUDICATED (excluded, SURVEY §6.1.a): $q%-28s old=$o%7.3fs new=$n%7.3fs " +
        f"raw=$raw%5.2fx norm=$norm%5.2fx — inside declared band [$lo%4.2f, $hi%4.2f]s")
    }
    if (regressions.isEmpty)
      println(s"[benchdiff] REGRESSIONS: none (> ${threshold}x on BOTH raw and calib-normalized)")
    else {
      println(s"[benchdiff] REGRESSIONS (> ${threshold}x on both raw and calib-normalized):")
      regressions.sortBy(t => -math.min(t._4, t._5)).foreach { case (q, o, n, raw, norm) =>
        println(f"  $q%-28s old=$o%7.3fs new=$n%7.3fs raw=$raw%5.2fx norm=$norm%5.2fx")
      }
      sys.exit(1)
    }
  }
}
