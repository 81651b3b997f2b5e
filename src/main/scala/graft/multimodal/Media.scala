package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.D12).
  *
  * Media payloads travel as opaque `binary` columns next to typed
  * metadata — the layout that scales: parquet stores the bytes
  * contiguously, predicates prune on metadata without touching
  * payloads, and partitioning keys come from metadata only.
  *
  * The actual decoders (image/audio codecs) are NOT available in
  * this environment, so [[decodeStub]] is a clearly-marked
  * deterministic fake with the real decoder's shape: batched
  * per-partition processing of (bytes → fixed-width feature
  * vector). Swapping in a real codec changes only the body of
  * `decodeBytes`.
  */
object Media {

  case class MediaRow(doc_id: Long, payload: Array[Byte], n_bytes: Long)
  case class DecodedRow(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** Wrap a text corpus as binary payloads + metadata (the test
    * corpus has no real media; payload = UTF-8 bytes).
    */
  def asPayloads(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("doc_id"),
      col(text).cast("binary").as("payload"),
      octet_length(col(text).cast("binary")).cast("long").as("n_bytes"))

  /** STUB — stands in for a real image/audio decoder. Deterministic
    * fake features: Unicode code-point moments of the UTF-8 payload
    * (code points, not raw bytes, so the fake is engine-portable —
    * SQL oracles see characters, not UTF-8 byte layout). Real
    * implementation would decode `bytes` with a codec and emit e.g.
    * pixel stats or an embedding; everything around it (batching,
    * schema, partition shape) is the production path.
    */
  def decodeBytes(bytes: Array[Byte]): Array[Double] = {
    val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
    var i = 0
    while (i < cps.length) {
      val c = cps(i)
      sum += c; if (c > mx) mx = c; if (c < mn) mn = c
      i += 1
    }
    val n = math.max(1, cps.length)
    Array(cps.length.toDouble, sum.toDouble / n, mn.toDouble, mx.toDouble)
  }

  /** Batched decode over partitions: the per-partition iterator is
    * where a real decoder would amortize codec init / GPU transfer.
    */
  def decodeStub(media: Dataset[MediaRow])(implicit spark: SparkSession)
      : Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(r => DecodedRow(r.doc_id, r.n_bytes, decodeBytes(r.payload)))
    }
  }

  case class ThumbRow(doc_id: Long, n_bytes: Long, thumb: Array[Double])

  /** STUB — stands in for a real resize/downsample kernel (image
    * thumbnail, audio downmix). Splits the payload's code points
    * into `segments` contiguous spans with floor boundaries
    * (span i = [i·n/segments, (i+1)·n/segments)) and emits each
    * span's mean — the real kernel would average pixel blocks the
    * same way. Code points (not raw bytes) keep the fake
    * engine-portable, like [[decodeBytes]]. Caller must ensure
    * n >= segments so every span is non-empty.
    */
  def thumbBytes(bytes: Array[Byte], segments: Int): Array[Double] = {
    val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    val n = cps.length
    Array.tabulate(segments) { i =>
      val lo = i * n / segments
      val hi = (i + 1) * n / segments
      var s = 0L; var j = lo
      while (j < hi) { s += cps(j); j += 1 }
      s.toDouble / math.max(1, hi - lo)
    }
  }

  /** Batched thumbnail pass — same per-partition shape as
    * [[decodeStub]]: a real pipeline initializes the resize kernel
    * once per partition and streams payloads through it.
    */
  def thumbStub(media: Dataset[MediaRow], segments: Int = 4)(
      implicit spark: SparkSession): Dataset[ThumbRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition kernel init would go here
      rows.map(r => ThumbRow(r.doc_id, r.n_bytes, thumbBytes(r.payload, segments)))
    }
  }

  /** Deterministic frame sampling: treat the payload as a sequence of
    * fixed-width frames, emit one row per `stride`-th frame with its
    * timestamp and a stub per-frame feature (hash of the frame
    * window — a real pipeline decodes pixels there; the row-per-frame
    * explode, frame addressing, and timestamping are the production
    * plumbing). Frame count comes from cheap metadata, so pruning
    * (e.g. only long documents) can happen before any payload touch.
    */
  def frameSample(docs: DataFrame, id: String, text: String,
      frameChars: Int = 64, stride: Int = 5, frameMs: Long = 100L): DataFrame =
    docs.filter(length(col(text)) >= 1)
      .select(col(id).as("doc_id"), col(text).as("__t"),
        expr(s"(length($text) + ${frameChars - 1}) div $frameChars").as("__nf"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0L), col("__nf") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameMs).as("t_ms"),
        graft.functions.TextHash.poly_hash(expr(
          s"substring(__t, cast(frame_idx * $frameChars + 1 as int), $frameChars)"))
          .as("frame_hash"))
}
