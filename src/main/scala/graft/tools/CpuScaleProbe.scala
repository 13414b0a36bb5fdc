package graft.tools

/** Raw-hardware thread-scaling ceiling probe (no Spark) — the control
  * measurement behind the SCALING_CORES analysis. Runs an
  * embarrassingly parallel, zero-coordination, zero-allocation float
  * loop (the same shape as the scan kernel's dependent accumulate) at
  * 1..32 threads and reports min-of-reps wall time. Whatever
  * efficiency THIS loop loses at 32 threads is the virtualization /
  * frequency / steal ceiling of the host, not Spark overhead — the
  * baseline workload cannot be expected to scale better than it.
  *
  * Usage: runMain graft.tools.CpuScaleProbe [reps]
  */
object CpuScaleProbe {
  private def work(iters: Long): Float = {
    var acc = 0f
    var i = 0L
    while (i < iters) { acc = acc * 0.9999f + (i & 1023) * 1e-7f; i += 1 }
    acc
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val Iters = 4000000000L
    // one untimed warm pass (JIT)
    work(Iters / 100)
    val cells = Seq(1, 2, 4, 8, 16, 32).map { t =>
      val per = Iters / t
      val times = (1 to reps).map { _ =>
        val threads = Array.fill(t)(new Thread(() => { work(per); () }))
        val t0 = System.nanoTime()
        threads.foreach(_.start()); threads.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[cpuprobe] threads=$t%2d min=${times.min}%.3f s runs=${times.map(x => f"$x%.2f").mkString(",")}")
      (t, times.min)
    }
    val (t0c, s0) = cells.head
    val json = cells.map { case (t, s) =>
      val speedup = s0 / s
      val eff = speedup * t0c / t
      f"""{"threads":$t,"sec":$s%.3f,"speedup":$speedup%.3f,"efficiency":$eff%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"raw_cpu_thread_scaling","iters":$Iters,"cells":$json}""")
  }
}
