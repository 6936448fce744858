package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads travel as opaque `binary` columns next to a typed
  * metadata struct — the layout a 100 TB multimodal corpus actually uses
  * (parquet binary + stats, partitioned by modality/shard, so pruning and
  * predicate pushdown work on metadata without touching payload bytes).
  *
  * The actual codecs (JPEG decode, audio resample, video frame extract)
  * are NOT available in this environment, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB: a pure arithmetic function of the
  * payload bytes. Everything around it — the schema, the batched
  * `mapPartitions` execution shape (the Scala analog of `mapInPandas`:
  * iterator-of-batches in, iterator-of-batches out, no per-row codec
  * setup), the partitioning — is real and is what a production codec
  * would drop into.
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(media_id: Long, modality: String,
                               payload: Array[Byte])

  /** Extracted features (stub-decoded). */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 channels: Int, n_frames: Int,
                                 byte_checksum: Long)

  /** ======== DETERMINISTIC STUB ========
    * Stand-in for the real image/audio/video decode (libs absent here).
    * Pure function of payload length + bytes so results are reproducible
    * and oracle-checkable. A real deployment swaps only this function.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xFF).toLong; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      n_bytes = n,
      width = (64 + n % 512).toInt,
      height = (64 + (n / 7) % 512).toInt,
      channels = 3,
      n_frames = if (r.modality == "video") (1 + n % 30).toInt else 1,
      byte_checksum = sum % 1000000007L)
  }

  /** ======== DETERMINISTIC STUB (batch form) ========
    * The batch-decode kernel: receives a whole record batch, returns its
    * features. A real codec decodes the batch in one native call (that is
    * the point of the batch shape); the stub maps the pure per-record
    * function.
    */
  def decodeBatchStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(decodeStub)

  /** Batched feature extraction — the `mapInPandas` execution shape in
    * Scala: iterator-of-batches in, iterator-of-batches out. Each
    * partition streams `batchSize`-record batches through ONE call of the
    * batch-decode kernel, so a real codec amortizes its native setup per
    * batch, not per record.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatchStub(batch))
    }
  }

  /** Attach a binary payload column derived from a string column (UTF-8
    * bytes) — how the text fixtures stand in for media blobs in tests.
    */
  def payloadFromText(df: DataFrame, idCol: String, textCol: String,
                      modalityCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(modalityCol).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"))

  def asMediaDataset(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.as[MediaRecord]
  }

  /** Resized media record: payload downsampled to a target byte budget. */
  final case class ResizedMedia(media_id: Long, modality: String,
                                orig_bytes: Long, target_bytes: Int,
                                payload: Array[Byte])

  /** ======== DETERMINISTIC STUB (resize) ========
    * Stand-in for image/video resize (a real codec decodes, scales,
    * re-encodes). The stub keeps every k-th byte (k = ceil(n / target)) —
    * a pure, reproducible function of the payload. Swap this function
    * only; the batched execution shape around it stays.
    */
  def resizeStub(r: MediaRecord, targetBytes: Int): ResizedMedia = {
    val n = r.payload.length
    val out =
      if (n <= targetBytes) r.payload
      else {
        val k = (n + targetBytes - 1) / targetBytes
        val b = new Array[Byte]((n + k - 1) / k)
        var i = 0
        while (i < b.length) { b(i) = r.payload(i * k); i += 1 }
        b
      }
    ResizedMedia(r.media_id, r.modality, n.toLong, targetBytes, out)
  }

  /** Batched resize — same iterator-of-batches `mapPartitions` shape as
    * [[extractFeatures]], so a native scaler amortizes setup per batch.
    * Runs BEFORE shuffle-heavy stages at scale: shrinking payloads first
    * is the difference between shuffling 100 TB and shuffling the target
    * budget.
    */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int,
             batchSize: Int = 64): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(resizeStub(_, targetBytes)))
    }
  }

  /** Byte-range "frame" sampling: every `stride`-th slice of `frameLen`
    * bytes, via `substring` on the binary column — pure column ops, no
    * decode, the pattern used to cheaply sub-sample video payloads before
    * a costly decode stage.
    */
  def frameSample(df: DataFrame, payloadCol: String, frameLen: Int,
                  nFrames: Int): DataFrame = {
    val frames = (0 until nFrames).map { f =>
      substring(col(payloadCol), f * frameLen + 1, frameLen).as(s"frame_$f")
    }
    df.select(col("*") +: frames: _*)
  }
}
