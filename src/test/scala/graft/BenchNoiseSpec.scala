package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-noise proof of the bench's io_noise self-labeling
  * (round-11 verdict #4): the flagging rule that decides both the
  * per-row artifact flag and the mid-run auto-retry is pure
  * ([[Bench.ioNoiseFlag]]), so it can be driven with fabricated probe
  * vectors — no disk involvement, no flakiness.
  *
  * Semantics under test: an adjacent probe ≥ 2× the run's quiet band
  * marks ONE rep as noisy; the ROW is flagged only when a
  * median-forming majority (≥ half) of its reps were noisy — a single
  * noisy rep out of three cannot move the reported median, so it
  * alone must not flag (or retry) the row.
  */
class BenchNoiseSpec extends AnyFunSuite {
  private val quiet = 0.15 // a quiet 64 MB fsync'd write on this host

  test("a flat quiet window never flags") {
    assert(!Bench.ioNoiseFlag(Vector(0.15, 0.16, 0.15), quiet))
    // just under the 2x threshold stays quiet
    assert(!Bench.ioNoiseFlag(Vector(0.29, 0.29, 0.29), quiet))
  }

  test("one noisy rep of three does not flag (median survives)") {
    assert(!Bench.ioNoiseFlag(Vector(0.15, 3.1, 0.16), quiet))
  }

  test("a majority of noisy reps flags the row") {
    // 2 of 3: the median itself sat in the noise window
    assert(Bench.ioNoiseFlag(Vector(0.80, 3.13, 0.68), 0.15))
    assert(Bench.ioNoiseFlag(Vector(0.15, 2.9, 3.4), quiet))
    // all reps noisy — the r11 artifact's shape (every write row
    // uniformly 1.3-2x with calib_io spiked): must self-label
    assert(Bench.ioNoiseFlag(Vector(1.2, 0.9, 1.5), quiet))
  }

  test("2-of-4 flags (an even split can pollute an averaged median)") {
    assert(Bench.ioNoiseFlag(Vector(0.15, 2.0, 0.16, 1.9), quiet))
    assert(!Bench.ioNoiseFlag(Vector(0.15, 2.0, 0.16, 0.17), quiet))
  }

  test("threshold is exactly 2x the quiet band, inclusive") {
    assert(Bench.probeNoisy(0.30, 0.15))
    assert(!Bench.probeNoisy(0.2999, 0.15))
  }

  test("empty probe vector (non-IO row) never flags") {
    assert(!Bench.ioNoiseFlag(Vector.empty, quiet))
  }

  test("dispersion flag: throttled median with quiet probes self-labels") {
    // the probe blind spot: bulk_write_53m's 12 s reps next to a
    // 2.9 s best, adjacent probes all quiet — the MEDIAN sat in state
    // the fastest rep proves the code doesn't have
    assert(Bench.dispNoiseFlag(Vector(2.9, 12.0, 13.1)))
    // one slow rep (first-rep JIT, one burst) never forms the median
    assert(!Bench.dispNoiseFlag(Vector(0.6, 0.33, 0.35)))
    assert(!Bench.dispNoiseFlag(Vector(0.33, 0.35, 12.0)))
    // a tight band never flags
    assert(!Bench.dispNoiseFlag(Vector(1.5, 1.7, 1.6)))
    // exactly at 2.5x, inclusive
    assert(Bench.dispNoiseFlag(Vector(1.0, 2.5, 2.6)))
    assert(!Bench.dispNoiseFlag(Vector(1.0, 2.49, 2.6)))
    // degenerate rows never flag
    assert(!Bench.dispNoiseFlag(Vector(1.0)))
    assert(!Bench.dispNoiseFlag(Vector(-1.0, 3.0, 3.1))) // failure sentinel
    // EVEN rep counts use the artifact's middle-pair-average median:
    // at reps=2 a (3, 12) row publishes 7.5 = 2.5x best -> must flag
    // (the lower-median variant could never fire at reps=2)
    assert(Bench.dispNoiseFlag(Vector(3.0, 12.0)))
    assert(!Bench.dispNoiseFlag(Vector(3.0, 4.0)))
    assert(Bench.dispNoiseFlag(Vector(3.0, 3.1, 12.0, 13.0)))
  }

  test("dispersion RETRY trigger: any row, 2x its fastest rep") {
    // the BENCH_r13 shape: CPU-bound query rows 60-90% inflated with
    // quiet probes and zero flags — the retry trigger must be more
    // sensitive (2.0x) than the artifact flag (2.5x), and apply to
    // every row, not just IO rows
    assert(Bench.dispRetryFlag(Vector(0.73, 1.50, 1.55)))
    // at exactly 2.0x, inclusive
    assert(Bench.dispRetryFlag(Vector(1.0, 2.0, 2.1)))
    assert(!Bench.dispRetryFlag(Vector(1.0, 1.99, 2.1)))
    // one slow rep out of three never forms the median -> no retry
    assert(!Bench.dispRetryFlag(Vector(0.33, 0.35, 12.0)))
    // a tight band never retries; degenerate rows never retry
    assert(!Bench.dispRetryFlag(Vector(1.5, 1.7, 1.6)))
    assert(!Bench.dispRetryFlag(Vector(1.0)))
    assert(!Bench.dispRetryFlag(Vector(-1.0, 3.0, 3.1)))
    // sub-0.1s absolute dispersion is scheduler jitter, not noise:
    // a 20 ms micro-row must not flag/retry on one 75 ms rep
    assert(!Bench.dispRetryFlag(Vector(0.02, 0.075, 0.08)))
    assert(!Bench.dispNoiseFlag(Vector(0.02, 0.075, 0.08)))
    // ...but a 0.1 s+ absolute gap at the ratio still does
    assert(Bench.dispRetryFlag(Vector(0.1, 0.25, 0.26)))
    // after the retry rep joins, a healthy row's 4-rep median drops
    // back under both thresholds (the artifact median re-forms)
    assert(!Bench.dispNoiseFlag(Vector(0.73, 1.50, 1.55, 0.74)))
  }

  // ---- compact stdout line (BENCH_r14 shipped parsed:null: the old
  // emitter's final stage still carried the full query map and the
  // 1907-char line was clipped at the FRONT by the driver's 2000-char
  // tail capture; the builder now enforces a 1500-char budget BY
  // CONSTRUCTION, so adding bench rows can never overflow again) ----

  /** every row the bench currently emits: the named engine rows plus
    * the headline oracle queries (keep in sync when adding rows — but
    * the budget invariant below holds for ANY row set, so drift here
    * only weakens realism, never the guarantee) */
  private val engineRows = Seq("bulk_write", "bulk_write_100k_ts",
    "bulk_write_5m", "bulk_write_5m_sort", "bulk_write_53m",
    "bulk_write_53m_bss", "full_read", "full_read_5m", "full_read_53m",
    "range_read", "agg_read", "frag_write", "frag_read",
    "wide_write_1m", "wide_read_1m", "read_val_5m", "read_val_5m_bss",
    "read_val_53m", "read_val_53m_bss", "conn_read_5m",
    "conn_range_5m", "conn_range_53m", "conn_update_5m",
    "conn_update_53m", "meta_commit_1e5", "reg_ddl_1e5",
    "conn_cold_1e6seg",
    "q54_dist_components", "text_terms_1x", "text_terms_10x",
    "text_lsh_1x", "text_lsh_10x")
  private val allRows = engineRows ++ Bench.headline

  private def render(rows: Seq[String],
      flagged: Seq[String] = Nil): String =
    Bench.compactStdoutLine(
      total = 35.123, totalFirst = 38.42, reps = 3,
      disks = Seq("disk_mb_5m" -> 40.0, "disk_mb_5m_bss" -> 33.1,
        "disk_mb_53m" -> 400.2, "disk_mb_53m_bss" -> 330.4),
      calib = Seq(
        "calib_s" -> Vector(0.101, 0.102, 0.099, 0.1, 0.103),
        "calib_mt_s" -> Vector(0.201, 0.202, 0.199, 0.2, 0.203),
        "calib_io_s" -> Vector(0.151, 0.52, 0.149, 0.15, 0.52)),
      quietIo = 0.149,
      ioNoiseRows = flagged, dispNoiseRows = flagged,
      retryRows = flagged,
      medians = rows.zipWithIndex.map { case (r, i) =>
        r -> (0.05 + (i % 37) * 0.13) },
      sfShort = "sf0.1")

  test("compact line: full current row set fits the 1500 budget and " +
      "keeps total/calib/labels parseable") {
    val line = render(allRows, flagged = Seq("bulk_write_53m"))
    assert(line.length <= 1500, s"line is ${line.length} chars")
    val m = graft.core.Json.parse(line).asInstanceOf[Map[String, Any]]
    // the fields whose loss zeroed the r14 artifact
    for (k <- Seq("metric", "value", "unit", "reps", "total_first",
        "calib_s", "calib_mt_s", "calib_io_s", "io_quiet_s",
        "queries", "sf"))
      assert(m.contains(k), s"missing $k")
    assert(m.contains("io_noise_rows") || m.contains("io_noise_n"))
    assert(m.contains("disp_noise_rows") || m.contains("disp_noise_n"))
    assert(m.contains("retry_rows") || m.contains("retry_n"))
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.nonEmpty)
    // slowest-first fill: the most expensive row is always present
    val slowest = allRows.zipWithIndex
      .maxBy { case (_, i) => (0.05 + (i % 37) * 0.13, "") }._1
    assert(qs.contains(slowest))
    // truncation is DECLARED, never silent
    if (qs.size < allRows.length)
      assert(m("queries_omitted").asInstanceOf[Number].intValue ==
        allRows.length - qs.size)
  }

  test("compact line budget holds for ANY row set (adversarial: many " +
      "long-named rows, everything flagged)") {
    val rows = (1 to 400).map(i =>
      f"q${i}%03d_some_very_long_query_row_name_segment_$i")
    for (flag <- Seq(Nil, rows.take(120))) {
      val line = render(rows, flagged = flag)
      assert(line.length <= 1500,
        s"${line.length} chars with ${flag.length} flags")
      val m = graft.core.Json.parse(line).asInstanceOf[Map[String, Any]]
      assert(m("value").asInstanceOf[Number].doubleValue == 35.123)
      // name arrays degrade to counts rather than overflowing — the
      // polluted run is exactly the one that must stay parseable
      if (flag.nonEmpty && !m.contains("retry_rows"))
        assert(m("retry_n").asInstanceOf[Number].intValue ==
          flag.length)
    }
  }

  test("compact line: a 4x-regressed small row outranks stable slow " +
      "rows (round-15 verdict #4 — regression-aware priority)") {
    // 400 stable rows at 0.3-1.0 s swamp the budget; the victim row
    // is 0.2 s — absolute-time priority drops it every time
    val stable = (1 to 400).map(i =>
      f"q${i}%03d_stable_long_query_row_name_padding_$i")
    val rows = stable :+ "small_regressed_query_row_name_padding_00"
    val meds = stable.map(r => r -> (0.3 + (r.hashCode.abs % 40) / 100.0)) :+
      ("small_regressed_query_row_name_padding_00" -> 0.2)
    def line(prev: Map[String, Double]) = Bench.compactStdoutLine(
      35.0, 36.0, 3, Nil, Nil, 0.1, Nil, Nil, Nil, meds, "sf0.1",
      prev = prev)
    val without = graft.core.Json.parse(line(Map.empty))
      .asInstanceOf[Map[String, Any]]("queries")
      .asInstanceOf[Map[String, Any]]
    assert(!without.contains("small_regressed_query_row_name_padding_00"),
      "premise broken: the row must be budget-dropped without a prior")
    // prior round had it at 0.05 s -> 4x regression -> priority 0.8
    val withPrev = graft.core.Json.parse(
      line(Map("small_regressed_query_row_name_padding_00" -> 0.05)))
      .asInstanceOf[Map[String, Any]]("queries")
      .asInstanceOf[Map[String, Any]]
    assert(withPrev.contains("small_regressed_query_row_name_padding_00"),
      "4x-regressed row must make the compact line")
    val _ = rows
  }

  test("compact line: pinned allowlist rows survive a synthetic " +
      "budget squeeze (round-16 verdict #3)") {
    // 400 slow long-named rows swamp the budget; every pinned row is
    // tiny (0.05-0.12 s) AND improved vs its prior (regression factor
    // 1) — the exact conditions that dropped conn_range_53m from
    // BENCH_r16. All pinned rows must still ship.
    val filler = (1 to 400).map(i =>
      f"q${i}%03d_stable_long_query_row_name_padding_$i")
    val pinned = Bench.pinnedRows.toSeq.sorted
    val meds = filler.map(r =>
      r -> (1.0 + (r.hashCode.abs % 40) / 100.0)) ++
      pinned.zipWithIndex.map { case (r, i) => r -> (0.05 + i * 0.01) }
    val prev = pinned.map(_ -> 5.0).toMap // all hugely IMPROVED
    val line = Bench.compactStdoutLine(
      35.0, 36.0, 3, Nil, Nil, 0.1, Nil, Nil, Nil, meds, "sf0.1",
      prev = prev)
    assert(line.length <= 1500, s"line is ${line.length} chars")
    val qs = graft.core.Json.parse(line)
      .asInstanceOf[Map[String, Any]]("queries")
      .asInstanceOf[Map[String, Any]]
    for (r <- pinned)
      assert(qs.contains(r), s"pinned row $r was budget-dropped")
    assert(qs.size < meds.length, "premise broken: no squeeze happened")
  }

  test("priorRoundMedians reads the newest BENCH_r*.json and survives " +
      "junk") {
    val dir = java.nio.file.Files.createTempDirectory("bench-prev")
    def put(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    assert(Bench.priorRoundMedians(dir.toString).isEmpty) // empty dir
    put("BENCH_r2.json",
      """{"parsed":{"queries":{"a":0.5,"b":1.25}}}""")
    put("BENCH_r10.json",
      """{"parsed":{"queries":{"a":0.7,"conn_range_53m":1.1}}}""")
    val m = Bench.priorRoundMedians(dir.toString)
    assert(m == Map("a" -> 0.7, "conn_range_53m" -> 1.1)) // r10 > r2
    put("BENCH_r11.json", """{"n":15,"parsed":null}""") // driver miss
    assert(Bench.priorRoundMedians(dir.toString).isEmpty)
    put("BENCH_r12.json", "not json at all {")
    assert(Bench.priorRoundMedians(dir.toString).isEmpty) // never throws
  }

  test("compact line: empty and degenerate inputs stay valid JSON") {
    val line = Bench.compactStdoutLine(-1.0, -1.0, 2, Nil, Nil, 0.0,
      Nil, Nil, Nil, Nil, "sf0.01")
    assert(line.length <= 1500)
    val m = graft.core.Json.parse(line).asInstanceOf[Map[String, Any]]
    assert(m("value").asInstanceOf[Number].doubleValue == -1.0)
    assert(m("queries").asInstanceOf[Map[String, Any]].isEmpty)
  }
}
