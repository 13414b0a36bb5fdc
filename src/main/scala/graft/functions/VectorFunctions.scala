package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions as Catalyst `Column` expressions.
  *
  * The reference's only metric is squared Euclidean distance
  * (`src/hnsw.zig:182-192` — squared for efficiency, comment at `:191`).
  * We standardize on squared L2 internally: it is monotone with true L2,
  * so every top-k / threshold operator is ordering-equivalent while
  * skipping the sqrt (the reference's one genuine optimization, kept).
  *
  * These wrap the NATIVE codegen'd Catalyst expressions in
  * [[graft.functions.expressions]] — NOT higher-order array functions:
  * Spark's `zip_with`/`aggregate` lambdas are CodegenFallback
  * (interpreted, boxed, measured ~100× slower on 64-dim vectors), so a
  * new kernel added here must be a native Expression, never a HOF
  * (`squaredL2Hof` below survives only as the parity test surface).
  * The fold is a strict left fold over the array index order, which
  * makes double accumulation deterministic — required for the DuckDB
  * hash-oracle (DuckDB's `list_sum` is the same left fold; verified
  * bit-identical).
  *
  * Scale note: per-row array arithmetic is embarrassingly parallel; no
  * shuffle, no state. At 100 TB this is a map stage limited only by scan
  * throughput.
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}
  import graft.functions.expressions.{SquaredL2Distance, SquaredL2Within, DotProduct}

  /** Squared L2 distance between two ARRAY<DOUBLE> columns.
    * Mirror of `src/hnsw.zig:182-192` (generic T → DOUBLE).
    * Native codegen'd expression; bit-identical to [[squaredL2Hof]]. */
  def squaredL2(a: Column, b: Column): Column =
    column(SquaredL2Distance(expression(a), expression(b)))

  /** Fused `squaredL2(a, b) < eps` with early exit — verdict-identical
    * to the unfused comparison (monotone non-negative fold, see
    * [[graft.functions.expressions.SquaredL2Within]]); the ε-join
    * filter form every dedup pair stage should use. */
  def squaredL2Within(a: Column, b: Column, eps: Double): Column =
    column(SquaredL2Within(expression(a), expression(b), eps))

  /** HOF formulation of [[squaredL2]] — kept as the readable spec and
    * for cross-checking the native expression in tests. */
  def squaredL2Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** True Euclidean distance (exposed where a real metric is declared). */
  def l2(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  /** Dot product of two ARRAY<DOUBLE> columns (native, codegen'd). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Per-row argmin over a small codebook column — `cents` is
    * ARRAY<STRUCT<label INT|BIGINT, cvec ARRAY<DOUBLE>>>, result
    * STRUCT<dist DOUBLE, label>. The map-only replacement for the
    * `crossJoin(broadcast(cent)) → groupBy(vec_id).agg(min(struct))`
    * assignment shape (bit-identical — see
    * [[graft.functions.expressions.NearestCentroid]]). */
  def argminCentroid(vec: Column, cents: Column): Column =
    column(expressions.NearestCentroid(expression(vec), expression(cents)))

  /** All PQ sub-codes of one vector in one map-only pass — `cb` is the
    * flattened (sub, code, cw) codebook sorted by (sub, code); see
    * [[graft.functions.expressions.PqEncode]]. */
  def pqEncode(vec: Column, cb: Column, subs: Int, subDim: Int): Column =
    column(expressions.PqEncode(expression(vec), expression(cb), subs, subDim))

  /** ADC lookup sum Σ_s lut[s·k + codes[s]] — the codegen'd form of the
    * interpreted `aggregate(sequence(...))` fold; see
    * [[graft.functions.expressions.AdcDist]]. */
  def adcDist(codes: Column, lut: Column, k: Int): Column =
    column(expressions.AdcDist(expression(codes), expression(lut), k))

  /** Packed sign bits of elements lo..hi (1-based, inclusive); see
    * [[graft.functions.expressions.SignBits]]. */
  def signBits(vec: Column, lo: Int, hi: Int): Column =
    column(expressions.SignBits(expression(vec), lo, hi))

  /** L2 norm of an ARRAY<DOUBLE> column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }
}
