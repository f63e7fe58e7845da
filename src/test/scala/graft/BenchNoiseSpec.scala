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
}
