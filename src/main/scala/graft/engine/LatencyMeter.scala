package graft.engine

import graft.model.LatencyStats

/** Bounded latency reservoir for the engine's operation-duration metrics
  * (reference `meter.go:86-115` Varz percentile fields, backed by
  * `metrics/histogram.go` + a bounded Sample capping memory).
  *
  * Design: a fixed-capacity ring of the most recent operation durations —
  * the same bounded-memory contract as the reference's Sample, so a store
  * that serves billions of ops never grows metric state past `capacity`
  * longs. Statistics are computed EXACTLY over the snapshot (nearest-rank
  * percentiles on the sorted reservoir): at ≤ 4096 samples the sort is
  * microseconds of driver CPU, so spinning a distributed job for it would
  * be pure overhead — this is engine-face telemetry about driver-side op
  * durations, not a data-plane aggregation (the data-plane quantile
  * operator is q18's `percentile_approx` path).
  *
  * Thread safety: `observe` is a synchronized ring write (two stores, or
  * the streaming ingest listener and an interactive reader, may record
  * concurrently); `snapshot` copies under the same lock and computes
  * outside it. */
final class LatencyMeter(capacity: Int = 4096) {
  require(capacity >= 1, s"LatencyMeter capacity must be >= 1, got $capacity")
  private val ring = new Array[Long](capacity)
  private var total = 0L

  def observe(durationNs: Long): Unit = synchronized {
    ring((total % capacity).toInt) = durationNs
    total += 1
  }

  /** Time a block and record its duration. */
  def time[A](f: => A): A = {
    val start = System.nanoTime()
    try f
    finally observe(System.nanoTime() - start)
  }

  /** Total operations ever observed (not capped by the reservoir). */
  def count: Long = synchronized(total)

  /** Exact stats over the current reservoir, in MICROSECONDS (the
    * reference reports time.Durations; µs doubles keep sub-ms engine ops
    * readable). Empty reservoir → all-zero stats. */
  def snapshot(): LatencyStats = {
    val copied = synchronized {
      val m = math.min(total, capacity.toLong).toInt
      java.util.Arrays.copyOf(ring, m)
    }
    if (copied.isEmpty) LatencyStats.empty
    else {
      java.util.Arrays.sort(copied)
      val m = copied.length
      def us(ns: Long): Double = ns / 1000.0
      // nearest-rank percentile on the sorted sample
      def pct(q: Double): Double =
        us(copied(math.min(m - 1, math.max(0, math.ceil(q * m).toInt - 1))))
      val mean = copied.map(us).sum / m
      val variance = copied.map(v => math.pow(us(v) - mean, 2)).sum / m
      // harmonic mean is undefined over a zero sample; clamp at 1ns
      val hmean = m / copied.map(v => 1.0 / math.max(1L, v)).sum / 1000.0
      val tail = math.max(1, math.ceil(0.05 * m).toInt)
      val long5p = copied.takeRight(tail).map(us).sum / tail
      val short5p = copied.take(tail).map(us).sum / tail
      LatencyStats(
        samples = m, cumulativeUs = copied.map(us).sum, avgUs = mean,
        hmeanUs = hmean, p50Us = pct(0.50), p75Us = pct(0.75),
        p95Us = pct(0.95), p99Us = pct(0.99), p999Us = pct(0.999),
        long5pUs = long5p, short5pUs = short5p,
        minUs = us(copied.head), maxUs = us(copied.last),
        rangeUs = us(copied.last) - us(copied.head),
        stddevUs = math.sqrt(variance))
    }
  }
}
