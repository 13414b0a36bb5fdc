package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `BINARY` columns with
  * typed metadata, decoded / feature-extracted in batched
  * per-partition passes.
  *
  * Since round 11 the decode step is REAL for every format a JVM can
  * parse without codec libraries: RIFF/WAVE PCM-16 and G.711 μ-law
  * audio, binary PPM images and multi-image streams, and
  * LZW-compressed GIF ([[WavCodec]]/[[PpmCodec]]/[[GifCodec]] —
  * strict parsers, golden-byte pinned). Since round 12 EVERY declared
  * query derives from real codec output; [[FakeDecoder]] remains only
  * as the spec-pinned, clearly marked stand-in for codec-library
  * formats (JPEG/MP3/H.264), which this container cannot host. Real
  * throughout and tested either way: the binary column schema, the
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

  /** The per-document media-metadata catalog, every column from a real
    * source since round 13 (the r12 verdict's task 3 — width/height/
    * n_frames were `ascii(substr(blob))`-style synthetic formulas
    * before): byte length and content hash are true functions of the
    * payload bytes; width/height are PARSED from the document's P6
    * container ([[PpmCodec.decodeP6]] on [[ppmBlobs]]' bytes);
    * n_frames is the frame count of a real WALK of the multi-image
    * stream container ([[PpmCodec.decodeStream]] on
    * [[ppmStreamBlobs]]' bytes — each frame's extent is known only
    * after parsing its header). Both containers synthesize from
    * doc_id alone, so one scan-stage pass encodes and decodes both
    * and emits only the four small parsed columns; the single
    * doc_id equi-join with the payload metadata is the only
    * exchange (co-partitioned by the key at scale — no blob ever
    * shuffles). */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payload = blobTable(s, d).select(
      col("doc_id"),
      octet_length(col("blob")).as("byte_len"),
      sha2(col("blob"), 256).as("sha256"))
    val parsed = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { iter =>
        iter.map { id =>
          val img = PpmCodec.decodeP6(synthPpm(id))
          val frames = PpmCodec.decodeStream(synthPpmStream(id))
          (id, img.width, img.height, frames.length)
        }
      }.toDF("doc_id", "width", "height", "n_frames")
    payload.join(parsed, Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** TEST-ONLY batched per-partition feature extraction: blob →
    * Array[Float] through [[FakeDecoder]]. Since round 12 this serves
    * ZERO declared queries — the declared feature/search pipeline
    * ([[featuresExploded]], [[multimodalKnn]]) runs on REAL codec
    * output — but the mapInPandas batch-shape contract it documents
    * (bounded batches, one decoder instance per partition, fixed-dim
    * float vectors) stays spec-pinned as the drop-in slot a
    * codec-library decoder (JPEG/MP3/H.264) would fill. */
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

  /** The REAL decoded feature table in gate form: the 48-dim integer
    * feature vector of every document — per-channel byte sums over the
    * 4×4 downsample grid of the DECODED PPM pixels ([[imageGrid]]'s
    * cells laid out as pos = (gy·4 + gx)·3 + channel) — exploded to
    * (pos, val) rows, because the correctness harness compares rows
    * via pandas sorting, which cannot order array cells. Every value
    * is downstream of a real container parse; integer end to end, so
    * no float resampling ambiguity between engines. */
  def featuresExploded(s: SparkSession, d: String): DataFrame =
    gridCellsOf(ppmBlobs(s, d))
      .selectExpr("doc_id",
        "stack(3, (gy * 4 + gx) * 3, sum_r, (gy * 4 + gx) * 3 + 1, " +
          "sum_g, (gy * 4 + gx) * 3 + 2, sum_b) AS (pos, val)")
      .orderBy(col("doc_id"), col("pos"))

  /** The decode → search handoff: the extracted feature vectors fed
    * straight into the vector-search shape — since round 12 for the
    * AUDIO modality on REAL codec output: k-NN over fixed 8-band
    * energy features decoded from the PCM-16 RIFF/WAVE containers
    * ([[wavBlobs]]) — band b owns interleaved samples with i·8/n = b,
    * its feature is the exact Σ|sample| (integer). The image twin is
    * [[gridKnn]]. Entirely relational after the scan-stage decode:
    * corpus bands equi-join the broadcast query bands, the distance is
    * Σ over 8 bands of (sum − qsum)² with no float anywhere, and blobs
    * never cross an exchange. */
  def multimodalKnn(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val b = audioBandsOf(wavBlobs(s, d))
    // query side decodes exactly ONE document: the doc_id filter lands
    // on the parquet scan BEFORE the synthesis/decode mapPartitions it
    // could never push through — never decode-the-corpus-and-discard
    val q = audioBandsOf(wavBlobsOf(
        Tables.documents(s, d).filter(col("doc_id") === qid)
          .select(col("doc_id"))))
      .select(col("band"), col("sum_abs").as("qs"))
    b.join(broadcast(q), Seq("band"))
      .groupBy(col("doc_id"))
      .agg(sum((col("sum_abs") - col("qs")) * (col("sum_abs") - col("qs")))
        .as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(k)
  }

  /** The decode → 8-band energy stage over any (doc_id, wav) source:
    * parse the container, split the interleaved sample stream into 8
    * equal index ranges (band of sample i = i·8/n), emit the exact
    * per-band Σ|sample|. Runs in the scan stage; only
    * (doc_id, band, sum) rows move. */
  private def audioBandsOf(blobs: DataFrame): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          val n = w.samples.length
          val acc = new Array[Long](8)
          var i = 0
          while (i < n) {
            // Long band math: i*8 wraps Int past 2^28 samples, and
            // WavCodec accepts data chunks that large
            acc((i.toLong * 8 / n).toInt) += math.abs(w.samples(i).toLong)
            i += 1
          }
          (0 until 8).map(b => (id, b, acc(b)))
        }
      }.toDF("doc_id", "band", "sum_abs")
  }

  /** Frame sampling over a REAL container walk (every column parsed
    * since round 13 — this was the synthetic `octet_length % 16`
    * formula before): decode the multi-image stream
    * ([[PpmCodec.decodeStream]] — each frame's extent is known only
    * after parsing its header, so the walk itself is the decode),
    * keep every `stride`-th frame, and emit the parsed frame count,
    * the sampled frame's parsed dimensions, and the exact sum of its
    * decoded channel bytes. Decode and sample run in the scan stage;
    * blobs never shuffle — only the small sampled rows move. The
    * default stride 2 makes the sampling visible on the 1–4-frame
    * fixture streams (frames {0, 2} where present). */
  def frameSample(s: SparkSession, d: String, stride: Int = 2): DataFrame = {
    import s.implicits._
    ppmStreamBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val frames = PpmCodec.decodeStream(bytes)
          for ((img, f) <- frames.zipWithIndex if f % stride == 0) yield {
            var sum = 0L
            img.rgb.foreach(b => sum += (b & 0xff))
            (id, frames.length, f, img.width, img.height, sum)
          }
        }
      }.toDF("doc_id", "n_frames", "frame_idx", "width", "height", "sum_rgb")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ---- REAL codecs (uncompressed formats, pure JVM — see Codecs.scala).
  // The fixture carries no media files, so container bytes are
  // SYNTHESIZED deterministically from doc_id alone (rates, channel
  // counts, dimensions, samples, pixels — all analytic functions of
  // the id), encoded into REAL RIFF/WAVE and PPM containers, and the
  // decode queries read back ONLY those bytes through the strict
  // parsers: magic validation, chunk walking, little-endian PCM
  // extraction, pixel-row recovery. The DuckDB oracle re-derives the
  // expected values from the same analytic rules, so the whole
  // encode→decode round trip sits under the hash gate; CodecsSpec
  // additionally pins the parsers against hand-assembled golden bytes
  // (spec conformance, not just self-consistency).

  private val WavRates = Array(8000, 16000, 44100)

  /** (doc_id, wav BINARY): a real PCM-16 RIFF/WAVE container per
    * document. Interleaved sample i = ((doc_id·131 + i·17) mod 65536)
    * − 32768; 256 + (doc_id mod 512) frames; 1–2 channels; rate from
    * [[WavRates]]. Blob construction is map-only and blobs never
    * shuffle — every decode query reduces them in the scan stage. */
  def wavBlobs(s: SparkSession, d: String): DataFrame =
    wavBlobsOf(Tables.documents(s, d).select(col("doc_id")))

  /** [[wavBlobs]] over an arbitrary (doc_id) source — the
    * filter-before-synthesis hook ([[multimodalKnn]]'s query side),
    * same shape as [[ppmBlobsOf]]. */
  private def wavBlobsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { iter =>
        iter.map { id =>
          val rate = WavRates((id % 3).toInt)
          val channels = 1 + (id % 2).toInt
          val n = (256 + (id % 512).toInt) * channels
          val samples = Array.tabulate(n)(i =>
            (((id * 131 + i.toLong * 17) % 65536) - 32768).toShort)
          (id, WavCodec.encodePcm16(rate, channels, samples))
        }
      }.toDF("doc_id", "wav")
  }

  /** (doc_id, ppm BINARY): a real binary-PPM (P6) image per document,
    * 8–16 × 8–14 pixels, channel byte k = (doc_id·31 + k·7) mod 256. */
  def ppmBlobs(s: SparkSession, d: String): DataFrame =
    ppmBlobsOf(Tables.documents(s, d).select(col("doc_id")))

  /** [[ppmBlobs]] over an arbitrary (doc_id) source — filters cannot
    * push through a typed `mapPartitions`, so a caller that needs ONE
    * document's blob (the [[gridKnn]] query side) must filter the
    * scan BEFORE synthesis/decode, not decode the corpus and discard
    * it. */
  private def ppmBlobsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(iter => iter.map(id => (id, synthPpm(id))))
      .toDF("doc_id", "ppm")
  }

  /** The per-id P6 synthesis rule — one definition shared by every
    * consumer ([[ppmBlobsOf]], [[mediaMeta]]'s parse pass) so the
    * encode→decode round trip under the hash gate is always of the
    * same bytes. */
  private def synthPpm(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val rgb = Array.tabulate(w * h * 3)(k =>
      ((id * 31 + k.toLong * 7) % 256).toByte)
    PpmCodec.encodeP6(w, h, rgb)
  }

  /** Container metadata DECODED from the WAV bytes (not restated from
    * the synthesis rule): rate/channels/bits from the fmt chunk, the
    * interleaved sample count from the data chunk, duration in
    * integer milliseconds. */
  def wavMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    wavBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          val frames = w.samples.length / w.channels
          (id, w.sampleRate, w.channels, w.bitsPerSample,
            w.samples.length, frames * 1000L / w.sampleRate)
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "bits", "n_samples", "dur_ms")
      .orderBy(col("doc_id"))
  }

  /** Per-frame audio energy over the DECODED sample stream: Σ|sample|
    * per window of 64 interleaved samples — exact integer math, the
    * real feature-extraction shape (decode → window → reduce) run
    * entirely in the scan stage; only (doc_id, frame, sum) rows move. */
  def wavFrameEnergy(s: SparkSession, d: String, frame: Int = 64): DataFrame = {
    import s.implicits._
    wavBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          val nf = (w.samples.length + frame - 1) / frame
          val acc = new Array[Long](nf)
          var i = 0
          while (i < w.samples.length) {
            acc(i / frame) += math.abs(w.samples(i).toLong); i += 1
          }
          acc.indices.map(f => (id, f, acc(f)))
        }
      }.toDF("doc_id", "frame", "sum_abs")
      .orderBy(col("doc_id"), col("frame"))
  }

  /** (doc_id, stream BINARY): a real netpbm MULTI-IMAGE stream per
    * document — 1–4 concatenated P6 frames with per-frame dimensions
    * (2–4 × 2–4), frame f's channel byte k = (doc_id·17 + f·113 + k·7)
    * mod 256. The variable frame sizes force the decoder to WALK the
    * container (each frame's extent is known only after parsing its
    * header) — the container behind `multimodal_frames`' stride
    * sampling and `multimodal_meta`'s parsed frame count. */
  def ppmStreamBlobs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(iter => iter.map(id => (id, synthPpmStream(id))))
      .toDF("doc_id", "stream")
  }

  /** The per-id multi-image stream synthesis rule, shared by
    * [[ppmStreamBlobs]], [[mediaMeta]], and [[frameSample]]. */
  private def synthPpmStream(id: Long): Array[Byte] = {
    val nFrames = 1 + (id % 4).toInt
    (0 until nFrames).toArray.flatMap { f =>
      val w = 2 + ((id + f) % 3).toInt
      val h = 2 + ((id + 2L * f) % 3).toInt
      val rgb = Array.tabulate(w * h * 3)(k =>
        ((id * 17 + f * 113L + k.toLong * 7) % 256).toByte)
      PpmCodec.encodeP6(w, h, rgb)
    }
  }

  /** Frame table DECODED from the multi-image stream: per frame its
    * parsed dimensions and the exact sum of all channel bytes —
    * variable-size container walking, reduced in the scan stage. */
  def streamFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ppmStreamBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          PpmCodec.decodeStream(bytes).zipWithIndex.map { case (img, f) =>
            var sum = 0L
            img.rgb.foreach(b => sum += (b & 0xff))
            (id, f, img.width, img.height, sum)
          }
        }
      }.toDF("doc_id", "frame_idx", "width", "height", "sum_rgb")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** (doc_id, wav BINARY): a real fmt-7 (G.711 μ-law) RIFF/WAVE per
    * document at the telephony-standard 8 kHz — μ-law byte i =
    * (doc_id·29 + i·23) mod 256, 200 + (doc_id mod 300) samples,
    * mono. */
  def ulawBlobs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { iter =>
        iter.map { id =>
          val n = 200 + (id % 300).toInt
          val ulaw = Array.tabulate(n)(i =>
            ((id * 29 + i.toLong * 23) % 256).toByte)
          (id, WavCodec.encodeUlaw(8000, 1, ulaw))
        }
      }.toDF("doc_id", "wav")
  }

  /** Companded-audio energy DECODED through the real G.711 expansion:
    * parse the fmt-7 container, expand every μ-law byte to its linear
    * 16-bit value, and emit the exact Σ|sample| — integer end to end,
    * so the oracle restates the ITU expansion formula verbatim. */
  def ulawEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ulawBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          require(w.audioFormat == 7 && w.bitsPerSample == 8,
            s"expected a mu-law container, got fmt ${w.audioFormat}")
          var sum = 0L
          w.samples.foreach(s0 => sum += math.abs(s0.toLong))
          (id, w.sampleRate, w.samples.length, sum)
        }
      }.toDF("doc_id", "sample_rate", "n_samples", "sum_abs")
      .orderBy(col("doc_id"))
  }

  /** (doc_id, gif BINARY): a real LZW-COMPRESSED GIF87a per document —
    * 6–10 × 5–8 pixels, a 4/8/16-color global table with analytic
    * palette entries (channel c of color j: see the oracle), pixel i's
    * index = (doc_id + i·13) mod colors. The payload genuinely
    * round-trips variable-width LZW (GifCodec), so the decode query
    * exercises real decompression, not container unwrapping. */
  def gifBlobs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { iter =>
        iter.map { id =>
          val colors = 1 << (2 + (id % 3).toInt) // 4 / 8 / 16
          val w = 6 + (id % 5).toInt
          val h = 5 + (id % 4).toInt
          val palette = Array.tabulate(colors) { j =>
            val r = ((id * 7 + j * 11) % 256).toInt
            val g = ((id * 3 + j * 29) % 256).toInt
            val b = ((id * 13 + j * 5) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          val indices = Array.tabulate(w * h)(i =>
            ((id + i * 13L) % colors).toByte)
          (id, GifCodec.encode(w, h, palette, indices))
        }
      }.toDF("doc_id", "gif")
  }

  /** Image statistics DECODED from the compressed GIF bytes: parsed
    * dimensions, color-table size, and exact per-channel sums of the
    * palette-resolved pixels — every value downstream of a real LZW
    * decompression, reduced in the scan stage. */
  def gifStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gifBlobs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val g = GifCodec.decode(bytes)
          var (sr, sg, sb) = (0L, 0L, 0L)
          g.indices.foreach { ix =>
            val c = g.palette(ix & 0xff)
            sr += (c >> 16) & 0xff; sg += (c >> 8) & 0xff; sb += c & 0xff
          }
          (id, g.width, g.height, g.palette.length, sr, sg, sb)
        }
      }.toDF("doc_id", "width", "height", "n_colors",
        "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** 4×4 downsample grid over the DECODED pixels: per grid cell the
    * exact per-channel byte sums (integer — no float resampling
    * ambiguity between engines). This is the real "resize" primitive:
    * cell (gy, gx) owns pixels with gy = y·4/h, gx = x·4/w. */
  def imageGrid(s: SparkSession, d: String): DataFrame =
    gridCellsOf(ppmBlobs(s, d))
      .orderBy(col("doc_id"), col("gy"), col("gx"))

  /** The decode → cell-sum stage over any (doc_id, ppm) source. */
  private def gridCellsOf(blobs: DataFrame): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val img = PpmCodec.decodeP6(bytes)
          val (w, h) = (img.width, img.height)
          val sr = new Array[Long](16)
          val sg = new Array[Long](16)
          val sb = new Array[Long](16)
          var p = 0
          val np = w * h
          while (p < np) {
            val cell = (p / w) * 4 / h * 4 + (p % w) * 4 / w
            sr(cell) += img.rgb(3 * p) & 0xff
            sg(cell) += img.rgb(3 * p + 1) & 0xff
            sb(cell) += img.rgb(3 * p + 2) & 0xff
            p += 1
          }
          (0 until 16).map(c => (id, c / 4, c % 4, sr(c), sg(c), sb(c)))
        }
      }.toDF("doc_id", "gy", "gx", "sum_r", "sum_g", "sum_b")
  }

  /** The REAL decode → feature → search pipeline end to end: k-NN
    * over the decoded 4×4 grid features ([[imageGrid]]), exact
    * integer squared-L2. Entirely relational — the per-cell sums
    * equi-join the broadcast query cells on (gy, gx), so the distance
    * is Σ over 16 cells × 3 channels of (sum − qsum)², computed with
    * no float anywhere and no feature vector materialized. */
  def gridKnn(s: SparkSession, d: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val g = gridCellsOf(ppmBlobs(s, d))
    // the query side decodes exactly ONE document: the doc_id filter
    // lands on the parquet scan (PushedFilters), BEFORE the synthesis
    // and decode mapPartitions it could never push through — at 100 TB
    // the alternative is decoding the corpus twice to read 16 rows
    val q = gridCellsOf(ppmBlobsOf(
        Tables.documents(s, d).filter(col("doc_id") === qid)
          .select(col("doc_id"))))
      .select(col("gy"), col("gx"), col("sum_r").as("qr"),
        col("sum_g").as("qg"), col("sum_b").as("qb"))
    def sq(c: org.apache.spark.sql.Column) = c * c
    g.join(broadcast(q), Seq("gy", "gx"))
      .groupBy(col("doc_id"))
      .agg(sum(sq(col("sum_r") - col("qr")) + sq(col("sum_g") - col("qg"))
        + sq(col("sum_b") - col("qb"))).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta"     -> ((s, d) => mediaMeta(s, d)),
    "multimodal_features" -> ((s, d) => featuresExploded(s, d)),
    "multimodal_frames"   -> ((s, d) => frameSample(s, d)),
    "multimodal_knn"      -> ((s, d) => multimodalKnn(s, d)),
    "multimodal_wav_meta"   -> ((s, d) => wavMeta(s, d)),
    "multimodal_wav_energy" -> ((s, d) => wavFrameEnergy(s, d)),
    "multimodal_image_grid" -> ((s, d) => imageGrid(s, d)),
    "multimodal_stream_frames" -> ((s, d) => streamFrames(s, d)),
    "multimodal_gif_stats" -> ((s, d) => gifStats(s, d)),
    "multimodal_ulaw_energy" -> ((s, d) => ulawEnergy(s, d)),
    "multimodal_grid_knn" -> ((s, d) => gridKnn(s, d))
  )

  val oracles: Map[String, String] = Map(
    // byte_len/sha256 are true payload functions; width/height restate
    // the P6 synthesis rule the ENGINE must recover by parsing real
    // container bytes, n_frames the stream rule it must recover by
    // walking a real multi-image container
    "multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS sha256,
        |  CAST(8 + doc_id % 9 AS INT) AS width,
        |  CAST(8 + doc_id % 7 AS INT) AS height,
        |  CAST(1 + doc_id % 4 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the REAL 48-dim decoded-grid feature vector (image_grid's cells
    // laid out as pos = (gy*4+gx)*3 + channel) — the engine must
    // round-trip real P6 containers to reach these rows; the oracle
    // re-derives them from the analytic pixel rule
    "multimodal_features" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
        |    CAST(8 + doc_id % 7 AS BIGINT) AS h FROM documents),
        |cells AS (SELECT doc_id,
        |    (k // w) * 4 // h AS gy, (k % w) * 4 // w AS gx,
        |    sum((doc_id * 31 + (3 * k) * 7) % 256) AS sr,
        |    sum((doc_id * 31 + (3 * k + 1) * 7) % 256) AS sg,
        |    sum((doc_id * 31 + (3 * k + 2) * 7) % 256) AS sb
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS k) g
        |  GROUP BY doc_id, gy, gx)
        |SELECT doc_id, CAST((gy * 4 + gx) * 3 + c.c AS INT) AS pos,
        |  CAST(CASE c.c WHEN 0 THEN sr WHEN 1 THEN sg ELSE sb END
        |       AS BIGINT) AS val
        |FROM cells CROSS JOIN (SELECT unnest([0, 1, 2]) AS c) c
        |ORDER BY doc_id, pos""".stripMargin,
    // audio-modality k-NN over REAL WAV decode: 8-band |sample| sums
    // re-derived from the analytic PCM rule, then exact integer
    // squared-L2 against doc 0's bands
    "multimodal_knn" ->
      """WITH p AS (SELECT doc_id,
        |    (256 + doc_id % 512) * (1 + doc_id % 2) AS n FROM documents),
        |b AS (SELECT doc_id, CAST(i * 8 // n AS INT) AS band,
        |    sum(abs((doc_id * 131 + i * 17) % 65536 - 32768)) AS s
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g
        |  GROUP BY doc_id, band),
        |q AS (SELECT band, s AS qs FROM b WHERE doc_id = 0)
        |SELECT b.doc_id,
        |  CAST(sum((b.s - q.qs) * (b.s - q.qs)) AS BIGINT) AS dist
        |FROM b JOIN q USING (band)
        |GROUP BY b.doc_id ORDER BY dist, doc_id LIMIT 10""".stripMargin,
    // stride-2 sampling over the real stream walk: the engine parses
    // 1–4 variable-size P6 frames per container and keeps frames
    // {0, 2}; the oracle re-derives the kept frames' parsed dims and
    // decoded channel sums from the analytic synthesis rules
    "multimodal_frames" ->
      """WITH f AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS n_frames,
        |    CAST(i AS BIGINT) AS fi
        |    FROM documents,
        |    LATERAL (SELECT unnest(generate_series(0, doc_id % 4)) AS i) g
        |    WHERE i % 2 = 0),
        |dims AS (SELECT doc_id, n_frames, fi,
        |    CAST(2 + (doc_id + fi) % 3 AS BIGINT) AS w,
        |    CAST(2 + (doc_id + 2 * fi) % 3 AS BIGINT) AS h FROM f)
        |SELECT doc_id, n_frames, CAST(fi AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum((doc_id * 17 + fi * 113 + k * 7) % 256) AS BIGINT) AS sum_rgb
        |FROM dims,
        |  LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS k) g2
        |GROUP BY doc_id, n_frames, fi, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // The WAV/PPM synthesis rules are analytic in doc_id, so the
    // oracle re-derives the DECODED values directly; the engine path
    // must round-trip real container bytes to reach the same rows.
    "multimodal_wav_meta" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       ELSE 44100 END AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  16 AS bits,
        |  CAST((256 + doc_id % 512) * (1 + doc_id % 2) AS INT) AS n_samples,
        |  CAST((256 + doc_id % 512) * 1000
        |       // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |           ELSE 44100 END) AS BIGINT) AS dur_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_wav_energy" ->
      """WITH p AS (SELECT doc_id,
        |    (256 + doc_id % 512) * (1 + doc_id % 2) AS n FROM documents)
        |SELECT doc_id, CAST(i // 64 AS INT) AS frame,
        |  CAST(sum(abs((doc_id * 131 + i * 17) % 65536 - 32768)) AS BIGINT)
        |    AS sum_abs
        |FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g
        |GROUP BY doc_id, frame ORDER BY doc_id, frame""".stripMargin,
    "multimodal_image_grid" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
        |    CAST(8 + doc_id % 7 AS BIGINT) AS h FROM documents)
        |SELECT doc_id,
        |  CAST((k // w) * 4 // h AS INT) AS gy,
        |  CAST((k % w) * 4 // w AS INT) AS gx,
        |  CAST(sum((doc_id * 31 + (3 * k) * 7) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((doc_id * 31 + (3 * k + 1) * 7) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((doc_id * 31 + (3 * k + 2) * 7) % 256) AS BIGINT) AS sum_b
        |FROM dims, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS k) g
        |GROUP BY doc_id, gy, gx ORDER BY doc_id, gy, gx""".stripMargin,
    "multimodal_stream_frames" ->
      """WITH f AS (SELECT doc_id, CAST(i AS BIGINT) AS fi
        |    FROM documents,
        |    LATERAL (SELECT unnest(generate_series(0, doc_id % 4)) AS i) g),
        |dims AS (SELECT doc_id, fi,
        |    CAST(2 + (doc_id + fi) % 3 AS BIGINT) AS w,
        |    CAST(2 + (doc_id + 2 * fi) % 3 AS BIGINT) AS h FROM f)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum((doc_id * 17 + fi * 113 + k * 7) % 256) AS BIGINT) AS sum_rgb
        |FROM dims,
        |  LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS k) g2
        |GROUP BY doc_id, fi, w, h ORDER BY doc_id, frame_idx""".stripMargin,
    // the engine must round-trip REAL LZW to reach these rows; the
    // oracle re-derives them from the analytic palette/index rules
    "multimodal_gif_stats" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(1 << (2 + doc_id % 3) AS BIGINT) AS colors,
        |    CAST(6 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(5 + doc_id % 4 AS BIGINT) AS h FROM documents),
        |px AS (SELECT doc_id, colors, w, h,
        |    (doc_id + i * 13) % colors AS j
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) g)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(colors AS INT) AS n_colors,
        |  CAST(sum((doc_id * 7 + j * 11) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((doc_id * 3 + j * 29) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((doc_id * 13 + j * 5) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h, colors ORDER BY doc_id""".stripMargin,
    // the ITU-T G.711 μ-law expansion restated verbatim: complement,
    // sign/exponent/mantissa split, biased magnitude rebuild
    "multimodal_ulaw_energy" ->
      """WITH p AS (SELECT doc_id, 200 + doc_id % 300 AS n FROM documents),
        |u AS (SELECT doc_id, n,
        |    255 - ((doc_id * 29 + i * 23) % 256) AS v
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g),
        |s AS (SELECT doc_id, n,
        |    CASE WHEN (v & 128) != 0
        |         THEN 132 - (((v & 15) * 8 + 132) << ((v & 112) // 16))
        |         ELSE (((v & 15) * 8 + 132) << ((v & 112) // 16)) - 132
        |    END AS lin FROM u)
        |SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
        |  CAST(sum(abs(lin)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // decoded-grid k-NN: the image_grid CTE joined against doc 0's
    // cells, exact integer squared-L2 over 16 cells x 3 channels
    "multimodal_grid_knn" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
        |    CAST(8 + doc_id % 7 AS BIGINT) AS h FROM documents),
        |cells AS (SELECT doc_id,
        |    (k // w) * 4 // h AS gy, (k % w) * 4 // w AS gx,
        |    sum((doc_id * 31 + (3 * k) * 7) % 256) AS sr,
        |    sum((doc_id * 31 + (3 * k + 1) * 7) % 256) AS sg,
        |    sum((doc_id * 31 + (3 * k + 2) * 7) % 256) AS sb
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS k) g
        |  GROUP BY doc_id, gy, gx),
        |q AS (SELECT gy, gx, sr AS qr, sg AS qg, sb AS qb
        |  FROM cells WHERE doc_id = 0)
        |SELECT c.doc_id,
        |  CAST(sum((c.sr - q.qr) * (c.sr - q.qr)
        |         + (c.sg - q.qg) * (c.sg - q.qg)
        |         + (c.sb - q.qb) * (c.sb - q.qb)) AS BIGINT) AS dist
        |FROM cells c JOIN q USING (gy, gx)
        |GROUP BY c.doc_id ORDER BY dist, doc_id LIMIT 10""".stripMargin
  )
}

/** STUB media decoder for the codec-LIBRARY formats (JPEG/MP3/H.264 —
  * no codec libraries exist in this container; the formats a JVM can
  * parse unaided are handled for real by [[WavCodec]]/[[PpmCodec]]/
  * [[GifCodec]]). TEST-ONLY since round 12: zero declared queries use
  * it — the declared feature/search pipeline runs on real codec
  * output. Deterministic: each "feature" component is a pseudo-uniform
  * value seeded by the payload's content hash (md5) and the component
  * index, so the batch-shape contract stays fully testable. The
  * interface — construct once per partition, decode in batches, emit
  * fixed-dim float vectors — is the real contract a codec-backed
  * decoder drops into. */
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
