package graft.tools

/** Micro A/B of the distance kernels: the plain strict fold
  * ([[graft.operators.BlockKnnJoin.sqDist]]) vs the early-abandon form
  * ([[graft.operators.BlockKnnJoin.sqDistBounded]]) at representative
  * bounds — settles whether the per-iteration bound branch costs
  * anything on the strict FP dependency chain (it cannot vectorize
  * either way: IEEE add order is fixed), and how much abandoning
  * actually saves at tight bounds. Pure JVM, no Spark.
  *
  * Usage: runMain graft.tools.DistLoopMicro [dim] [nVecs] [reps]
  */
object DistLoopMicro {
  def main(args: Array[String]): Unit = {
    val dim = args.lift(0).map(_.toInt).getOrElse(64)
    val n = args.lift(1).map(_.toInt).getOrElse(4096)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val rnd = new scala.util.Random(42)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextDouble()))
    val q = Array.fill(dim)(rnd.nextDouble())
    import graft.operators.BlockKnnJoin.{sqDist, sqDistBounded}

    def timeIt(label: String)(f: => Double): Unit = {
      // warm
      var w = 0; var sink = 0.0
      while (w < 2) { sink += f; w += 1 }
      var best = Double.MaxValue
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        sink += f
        val dt = (System.nanoTime() - t0) / 1e6
        if (dt < best) best = dt
        r += 1
      }
      println(f"[distmicro] $label%-28s $best%9.3f ms  (sink=${sink != 0.0})")
    }

    // typical tight bound: the k-th smallest distance over a sample
    val sample = vecs.take(256).map(v => sqDist(q, v)).sorted
    val tight = sample(15) // a filled m=16 heap's bound
    val loose = sample(200)

    timeIt("plain fold") {
      var acc = 0.0; var i = 0
      while (i < n) { acc += sqDist(q, vecs(i)); i += 1 }; acc
    }
    timeIt("bounded, bound=+Inf") {
      var acc = 0.0; var i = 0
      while (i < n) { acc += sqDistBounded(q, vecs(i), Double.PositiveInfinity); i += 1 }; acc
    }
    timeIt(s"bounded, loose") {
      var acc = 0.0; var i = 0
      while (i < n) { acc += sqDistBounded(q, vecs(i), loose); i += 1 }; acc
    }
    timeIt(s"bounded, tight (m16 heap)") {
      var acc = 0.0; var i = 0
      while (i < n) { acc += sqDistBounded(q, vecs(i), tight); i += 1 }; acc
    }
    val ultra = sample.head * 0.05 // eps-join regime: below every distance
    timeIt(s"bounded, ultra (eps-join)") {
      var acc = 0.0; var i = 0
      while (i < n) { acc += sqDistBounded(q, vecs(i), ultra); i += 1 }; acc
    }
  }
}
