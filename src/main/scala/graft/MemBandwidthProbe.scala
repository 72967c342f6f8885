package graft

/** Raw-JVM memory-bandwidth ceiling probe (no Spark): quantifies how much
  * of the two-parallelism scaling gap is the BOX, not the engine.
  *
  * The north_rule's setting is N vs 4N EXECUTORS — 4x the memory
  * channels, NVMe spindles, and LLC. local[8] vs local[32] shares ONE
  * memory complex, so any bandwidth-bound stage (window sorts, shuffle
  * spills, cache scans) is capped by the same DRAM regardless of thread
  * count. This probe measures that cap directly with the two access
  * patterns those stages are made of:
  *
  *  - `stream`: sequential long-array reduction (cache/scan shape)
  *  - `scatter`: random read-modify-write over a table far larger than
  *    LLC (hash shuffle / hash aggregate shape)
  *
  * plus a `compute` control (polylabel-like arithmetic on L1-resident
  * data) that SHOULD scale ~4x, isolating scheduling overhead from
  * bandwidth. Each pattern runs at 1, 8, and 32 threads on thread-private
  * chunks (zero sharing, zero locks — any sub-linear scaling is the
  * hardware). Reported: aggregate GB/s (or Gop/s) per thread count and
  * the 8->32 efficiency.
  *
  * Usage: {{{ sbt "runMain graft.MemBandwidthProbe [sizeMBPerThread] [passes]" }}}
  */
object MemBandwidthProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def runThreads(n: Int)(work: Int => Unit): Double = time {
    val ts = (0 until n).map { i =>
      val t = new Thread(() => work(i)); t.start(); t
    }
    ts.foreach(_.join())
  }

  def main(args: Array[String]): Unit = {
    val mbPerThread = args.headOption.map(_.toInt).getOrElse(256)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val longsPerThread = mbPerThread * 1024 * 1024 / 8
    // arg 3: comma-separated thread counts; the N/4N pair under test is
    // the LAST TWO counts (so "8,32" works without a leading 1)
    val threadCounts = args.lift(2).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 8, 32))
    require(threadCounts.size >= 2,
      s"need at least two thread counts for an efficiency pair (got $threadCounts)")
    val maxThreads = threadCounts.max

    // thread-private working sets, allocated once (NUMA/first-touch by
    // the owning thread itself so placement matches use)
    val chunks = new Array[Array[Long]](maxThreads)
    runThreads(maxThreads) { i =>
      val a = new Array[Long](longsPerThread)
      var j = 0
      while (j < a.length) { a(j) = j * 0x9E3779B97F4A7C15L; j += 1 }
      chunks(i) = a
    }
    val sink = new java.util.concurrent.atomic.AtomicLong()

    def stream(i: Int): Unit = {
      val a = chunks(i); var s = 0L; var j = 0
      while (j < a.length) { s += a(j); j += 1 }
      sink.addAndGet(s)
    }
    def scatter(i: Int): Unit = {
      val a = chunks(i); var x = 0x2545F4914F6CDD1DL + i; var j = 0
      val mask = Integer.highestOneBit(a.length) - 1
      while (j < a.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17 // xorshift
        val idx = (x & mask).toInt
        a(idx) = a(idx) + x
        j += 1
      }
      sink.addAndGet(a(0))
    }
    def compute(i: Int): Unit = {
      // L1-resident arithmetic loop (fused mul/add/compare, no memory
      // pressure): the control that should scale with cores
      var s = 0.0; var j = 0; val n = longsPerThread
      var x = 1.0 + i
      while (j < n) { x = x * 1.0000001 + 0.5; if (x > 10) x -= 9.0; s += x; j += 1 }
      sink.addAndGet(s.toLong)
    }

    val patterns = Seq[(String, Int => Unit, String)](
      ("stream", stream, "GB/s"), ("scatter", scatter, "GB/s"),
      ("compute", compute, "Gop/s"))
    println(s"[membw] ${mbPerThread} MB/thread, min over $passes passes")
    for ((name, work, unit) <- patterns) {
      val rates = threadCounts.map { n =>
        val secs = (1 to passes).map(_ => runThreads(n)(work)).min
        // bytes touched: stream reads 8 B/elem; scatter reads+writes 16 B
        val bytesPerThread = name match {
          case "stream" => longsPerThread.toLong * 8
          case "scatter" => longsPerThread.toLong * 16
          case _ => longsPerThread.toLong // "ops"
        }
        val rate = n.toLong * bytesPerThread / secs / 1e9
        n -> rate
      }.toMap
      // efficiency is reported over the LAST TWO counts, so a
      // parameterized two-entry run ("8,32") works as well as the
      // default three-entry one
      val Seq(lo, hi) = threadCounts.takeRight(2)
      val ratio = hi.toDouble / lo
      val eff = rates(hi) / rates(lo) / ratio
      val cols = threadCounts.map(n => f"${n}T ${rates(n)}%6.1f").mkString("  ")
      println(f"[membw] $name%-8s $cols $unit%-5s  $lo->$hi speedup ${rates(hi) / rates(lo)}%4.2f  efficiency $eff%4.2f")
    }
  }
}
