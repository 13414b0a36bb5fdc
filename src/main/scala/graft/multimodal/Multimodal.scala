package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `BINARY` columns with
  * typed metadata, decoded / feature-extracted in batched
  * per-partition passes.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly marked deterministic STUB ([[FakeDecoder]]) — what is real
  * and tested is everything Spark-side: the binary column schema, the
  * batched `mapPartitions` shape (the JVM twin of `mapInPandas`:
  * iterate partitions in bounded batches, never materialize the whole
  * partition), the metadata projection, and the handoff of extracted
  * feature vectors into the vector operators ([[graft.operators]]).
  *
  * Scale: blobs never shuffle — metadata and features are computed in
  * the scan stage and only the small derived columns move. For real
  * media, the same pipeline reads a binary-file or parquet-BLOB table;
  * partition sizing must account for blob width
  * (`spark.sql.files.maxPartitionBytes`), which is why [[features]]
  * processes in fixed-size batches rather than per-partition arrays.
  */
object Multimodal {

  /** The fixture has no binary table; derive one deterministically from
    * documents (utf-8 bytes as the "media payload"). */
  def blobTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("blob"),
      col("source").as("media_source"))

  /** Declarative metadata over the binary column: true byte length and
    * content hash, plus FAKE decoded dimensions (see [[FakeDecoder]] —
    * derived from payload bytes so they are deterministic and
    * oracle-checkable). */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    blobTable(s, d)
      .select(
        col("doc_id"),
        octet_length(col("blob")).as("byte_len"),
        sha2(col("blob"), 256).as("sha256"),
        (expr("ascii(substr(CAST(blob AS STRING), 1, 1))") % 64 + 1).as("width"),
        (expr("ascii(substr(CAST(blob AS STRING), 2, 1))") % 64 + 1).as("height"),
        (octet_length(col("blob")) % 16 + 1).as("n_frames"))
      .orderBy(col("doc_id"))

  /** Batched per-partition feature extraction: blob → Array[Float].
    * Mirrors the mapInPandas batch shape — bounded batches, one
    * decoder instance per partition. Feeds the ANN/k-NN operators. */
  def features(s: SparkSession, d: String, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    import s.implicits._
    blobTable(s, d)
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new FakeDecoder(dim) // one per partition, like mapInPandas
        iter.grouped(batchSize).flatMap { batch =>
          decoder.decodeBatch(batch)
        }
      }
      .toDF("doc_id", "feature")
  }

  /** Gate form of [[features]]: the feature vector exploded to
    * (pos, val) rows — the correctness harness compares rows via pandas
    * sorting, which cannot order array cells. Same content, dim rows
    * per doc; [[features]] stays the programmatic (vector-typed) API. */
  def featuresExploded(s: SparkSession, d: String, dim: Int = 16): DataFrame =
    features(s, d, dim)
      .select(col("doc_id"), posexplode(col("feature")).as(Seq("pos", "val")))
      .orderBy(col("doc_id"), col("pos"))

  /** The decode → search handoff: the extracted feature vectors fed
    * straight into the exact vector-search operator — the end-to-end
    * pipeline (binary blob → decode → embed → k-NN) a multimodal
    * corpus runs, all under the hash gate because [[FakeDecoder]] is
    * oracle-re-expressible. Same physics as `knn_topk`: the 1-row
    * query broadcast against the feature table, `TakeOrderedAndProject`
    * top-k — the corpus-side blobs are decoded in the scan stage and
    * never shuffle. */
  def multimodalKnn(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.squaredL2
    val f = features(s, d).withColumn("fv", col("feature").cast("array<double>"))
    val q = f.filter(col("doc_id") === qid).select(col("fv").as("qv"))
    f.crossJoin(broadcast(q))
      .select(col("doc_id"), squaredL2(col("fv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(k)
  }

  /** Frame sampling: every `stride`-th frame index of each media blob,
    * with a deterministic per-frame content hash (the decode itself is
    * the [[FakeDecoder]]-style stub — a real codec would emit the frame
    * bytes here). The sampling plumbing is the real contract: frame
    * count from metadata, `sequence`+`explode` to per-frame rows in the
    * scan stage, blobs never shuffle — only (doc_id, frame_idx, hash)
    * rows move. */
  def frameSample(s: SparkSession, d: String, stride: Int = 4): DataFrame =
    blobTable(s, d)
      .select(
        col("doc_id"),
        (octet_length(col("blob")) % 16 + 1).as("n_frames"),
        sha2(col("blob"), 256).as("content_sha"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"),
        col("content_sha"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat(col("content_sha"), lit("-"), col("frame_idx").cast("string")))
          .as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta"     -> ((s, d) => mediaMeta(s, d)),
    "multimodal_features" -> ((s, d) => featuresExploded(s, d)),
    "multimodal_frames"   -> ((s, d) => frameSample(s, d)),
    "multimodal_knn"      -> ((s, d) => multimodalKnn(s, d))
  )

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS sha256,
        |  ascii(substr(text, 1, 1)) % 64 + 1 AS width,
        |  ascii(substr(text, 2, 1)) % 64 + 1 AS height,
        |  octet_length(encode(text)) % 16 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // FakeDecoder re-implemented declaratively: DuckDB md5(VARCHAR)
    // hashes the utf-8 bytes — exactly the blob the Spark side decodes.
    "multimodal_features" ->
      """SELECT doc_id, CAST(j.j AS INT) AS pos,
        |  CAST((CAST(('0x' || substr(md5(concat(md5(text), '-', CAST(j.j AS STRING))), 1, 15)) AS BIGINT)
        |        % 1000001) / 1000000.0 - 0.5 AS FLOAT) AS val
        |FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
        |ORDER BY doc_id, pos""".stripMargin,
    // the decoded-feature table rebuilt declaratively (the same md5
    // chain as multimodal_features, as lists), then exact top-k by
    // squared L2 — float features cast to DOUBLE before the fold in
    // both engines
    "multimodal_knn" ->
      """WITH f AS (SELECT doc_id, list_transform(generate_series(0, 15), j ->
        |    CAST(CAST((CAST(('0x' || substr(md5(concat(md5(text), '-', CAST(j AS STRING))), 1, 15)) AS BIGINT)
        |         % 1000001) / 1000000.0 - 0.5 AS FLOAT) AS DOUBLE)) AS v
        |  FROM documents),
        |q AS (SELECT v AS qv FROM f WHERE doc_id = 0)
        |SELECT f.doc_id,
        |  list_sum(list_transform(list_zip(f.v, q.qv), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |FROM f, q ORDER BY dist, doc_id LIMIT 10""".stripMargin,
    // stride-4 sampling over 1..16 frames: {0,4,8,12} ∩ [0, n_frames)
    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id,
        |  octet_length(encode(text)) % 16 + 1 AS n_frames,
        |  sha256(text) AS content_sha FROM documents)
        |SELECT doc_id, n_frames, CAST(f.f AS INT) AS frame_idx,
        |  md5(concat(content_sha, '-', CAST(f.f AS VARCHAR))) AS frame_md5
        |FROM b CROSS JOIN (SELECT unnest(generate_series(0, 15, 4)) AS f) f
        |WHERE f.f < n_frames
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}

/** STUB media decoder — the real implementation would wrap an image /
  * audio codec here (none exists in this container). Deterministic:
  * each "feature" component is a pseudo-uniform value seeded by the
  * payload's content hash (md5) and the component index, so the
  * downstream vector pipeline is fully testable AND the whole decode
  * is re-expressible in the DuckDB oracle (the correctness gate covers
  * the multimodal path end-to-end). The interface — construct once per
  * partition, decode in batches, emit fixed-dim float vectors — is the
  * real contract a codec-backed decoder drops into. */
final class FakeDecoder(dim: Int) {
  // one digest instance per decoder (= per partition), reset by digest()
  private val md = java.security.MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray

  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Array[Float])] =
    batch.map { case (id, bytes) => (id, decode(bytes)) }

  private def hex(dig: Array[Byte]): String = {
    val out = new Array[Char](dig.length * 2)
    var i = 0
    while (i < dig.length) {
      out(2 * i) = hexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def decode(bytes: Array[Byte]): Array[Float] = {
    val md5hex = hex(md.digest(bytes))
    Array.tabulate(dim) { j =>
      val dig = md.digest(s"$md5hex-$j".getBytes("UTF-8"))
      ((graft.operators.HnswLevel.hash60FromDigest(dig) % 1000001L).toDouble
        / 1000000.0 - 0.5).toFloat
    }
  }
}
