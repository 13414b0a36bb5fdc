package graft

/** SIMD float dot-product kernel via the JDK Vector API
  * (`jdk.incubator.vector`, pure JDK — no external dependency), with a
  * 4-accumulator scalar fallback when the incubator module is absent
  * from the runtime. Selected once at class init.
  *
  * This is the innermost loop of the baseline search workload: one fma
  * per lane per step, 128-dim f32 → 8–16 lanes/cycle on AVX2/AVX-512 —
  * the SIMD the reference lists as unimplemented future work
  * (`benchmarks/benchmark.md:37-41`).
  */
object VectorKernel {

  private object Simd {
    import jdk.incubator.vector.{FloatVector, VectorOperators, VectorSpecies}
    val SP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED
    def dot(a: Array[Float], aOff: Int, b: Array[Float], bOff: Int, n: Int): Float = {
      var acc = FloatVector.zero(SP)
      val step = SP.length()
      val upper = SP.loopBound(n)
      var j = 0
      while (j < upper) {
        acc = FloatVector.fromArray(SP, a, aOff + j)
          .fma(FloatVector.fromArray(SP, b, bOff + j), acc)
        j += step
      }
      var s = acc.reduceLanes(VectorOperators.ADD)
      while (j < n) { s += a(aOff + j) * b(bOff + j); j += 1 }
      s
    }
  }

  private def scalarDot(a: Array[Float], aOff: Int, b: Array[Float], bOff: Int, n: Int): Float = {
    var d0 = 0.0f; var d1 = 0.0f; var d2 = 0.0f; var d3 = 0.0f
    var j = 0
    val upper = n - (n % 4)
    while (j < upper) {
      d0 += a(aOff + j) * b(bOff + j)
      d1 += a(aOff + j + 1) * b(bOff + j + 1)
      d2 += a(aOff + j + 2) * b(bOff + j + 2)
      d3 += a(aOff + j + 3) * b(bOff + j + 3)
      j += 4
    }
    var s = (d0 + d1) + (d2 + d3)
    while (j < n) { s += a(aOff + j) * b(bOff + j); j += 1 }
    s
  }

  val simdEnabled: Boolean =
    try { Simd.SP.length() > 0 } catch { case _: Throwable => false }

  /** dot(a[aOff..aOff+n), b[bOff..bOff+n)). */
  val dot: (Array[Float], Int, Array[Float], Int, Int) => Float =
    if (simdEnabled) Simd.dot else scalarDot
}
