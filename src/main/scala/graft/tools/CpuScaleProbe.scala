package graft.tools

/** Hardware-ceiling control for the N->4N scaling evidence: a pure
  * JVM compute+allocation microbenchmark with NO Spark involvement —
  * plain threads, each hashing and allocating small arrays like the
  * annotation kernel does. Whatever efficiency THIS shows from 8->32
  * threads is this VM's ceiling for any engine; comparing the Spark
  * job's efficiency against it separates engine overhead from
  * shared-box memory-bandwidth/SMT limits.
  */
object CpuScaleProbe {

  /** Per-item work shaped like the kernel: a few hash mixes + one
    * small array allocation + writes (allocation traffic is what
    * saturates DRAM at 32 threads).
    */
  private def work(i: Long): Long = {
    val a = new Array[Long](16)
    var j = 0
    var acc = i
    while (j < 16) {
      acc = graft.sources.Synth.mix(acc, i + j, 7L)
      a(j) = acc
      j += 1
    }
    a((i % 16).toInt)
  }

  private def run(threads: Int, itemsPerThread: Long): Double = {
    val t0 = System.nanoTime()
    val sinks = new Array[Long](threads)
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var i = 0L
        var sink = 0L
        val base = t.toLong * itemsPerThread
        while (i < itemsPerThread) { sink ^= work(base + i); i += 1 }
        sinks(t) = sink
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    threads * itemsPerThread / sec
  }

  def main(args: Array[String]): Unit = {
    val totalItems = args.lift(0).map(_.toLong).getOrElse(400000000L)
    // warmup (JIT)
    run(4, totalItems / 64)
    var thr8 = 0.0; var thr32 = 0.0
    for (_ <- 1 to 3) {
      thr8 = math.max(thr8, run(8, totalItems / 8))
      thr32 = math.max(thr32, run(32, totalItems / 32))
    }
    val eff = (thr32 / thr8) / 4.0
    println(f"""{"probe":"cpu-alloc","items":$totalItems,"thr8":$thr8%.0f,"thr32":$thr32%.0f,"hardware_ceiling_efficiency":$eff%.3f}""")
  }
}
