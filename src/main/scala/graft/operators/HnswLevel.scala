package graft.operators

/** Deterministic HNSW level assignment + the shared 60-bit string hash,
  * as plain JVM functions.
  *
  * These are the Scala twins of the SQL expressions used by
  * [[Ann.hnswLevels]] (and its DuckDB oracle): the level is the
  * trailing-zero count of a 60-bit md5-derived hash of the id — the
  * integer-exact mirror of the reference's geometric p=0.5 draw
  * (`src/hnsw.zig:172-180`) with a seeded hash replacing crypto
  * randomness, capped at 31. Bit-for-bit parity with the SQL forms is
  * asserted in `AnnSpec`, so per-row imperative operators
  * ([[Ann.hnswEdges]]) and declarative ones ([[Ann.hnswLevels]]) agree
  * exactly.
  */
private[graft] object HnswLevel extends Serializable {

  /** First 15 hex chars of md5(key) as a 60-bit non-negative long —
    * identical to SQL `CAST(conv(substr(md5(key),1,15),16,10) AS
    * BIGINT)` and DuckDB `CAST('0x'||substr(md5(key),1,15) AS BIGINT)`. */
  // per-thread reused digest: levelOf/hash60 sit in per-row hot loops
  // (Ann.levelNodes maps every corpus row), and a fresh
  // MessageDigest.getInstance per call pays a provider lookup +
  // allocation per row — the reuse pattern hash60FromDigest exists for
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(key: String): Long = {
    val d = md5.get()
    d.reset()
    hash60FromDigest(d.digest(key.getBytes("UTF-8")))
  }

  /** The 60-bit extraction alone, for callers that manage their own
    * (reused) `MessageDigest` instance in hot per-row loops. */
  def hash60FromDigest(dig: Array[Byte]): Long = {
    // 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    (h << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  /** Pseudo-uniform double in [-0.5, 0.5] from a string key — twin of
    * [[Ann]]'s SQL `unitHash` (same op sequence, hence bit-identical). */
  def unitHash(key: String): Double =
    (hash60(key) % 1000001L).toDouble / 1000000.0 - 0.5

  /** Geometric level: trailing-zero bits of hash60(id), capped at 31.
    * (The SQL form scans bits 0..31 then applies least(31, ·) — for a
    * hash with ≥32 trailing zeros both forms yield 31.) */
  def levelOf(id: Long): Int =
    math.min(31, java.lang.Long.numberOfTrailingZeros(hash60(id.toString)))
}
