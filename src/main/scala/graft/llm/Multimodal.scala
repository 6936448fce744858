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
  * IMAGE decode is REAL: `javax.imageio` ships with every stock JVM and
  * reads PNG/JPEG/GIF/BMP, so [[decodeImage]] reports true decoded
  * width/height/channels and fails loud on an undecodable payload.
  * Audio resample and video frame extraction have no JVM-builtin codec
  * and none is installable in this environment, so those kernels remain
  * clearly-marked DETERMINISTIC STUBS (pure arithmetic over the payload
  * bytes). The execution shape around both — the schema, the batched
  * `mapPartitions` kernel (the Scala analog of `mapInPandas`:
  * iterator-of-batches in, iterator-of-batches out, no per-record codec
  * setup), the partitioning — is identical, so swapping a stub for a
  * native codec touches one function.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache (a temp file per
  // decode) — pure overhead for in-memory byte-array payloads on
  // executors. Process-wide JVM state, so it is NOT flipped at class
  // load: the lazy val runs once, on the first actual codec call, and
  // only in JVMs that decode/encode media.
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(media_id: Long, modality: String,
                               payload: Array[Byte])

  /** Extracted features (stub-decoded). */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 channels: Int, n_frames: Int,
                                 byte_checksum: Long)

  /** ======== DETERMINISTIC STUB (audio/video only) ========
    * Stand-in for the audio/video decode (no JVM-builtin codec; none
    * installable in this environment — images take the REAL
    * [[decodeImage]] path instead). Pure function of payload length +
    * bytes so results are reproducible and oracle-checkable. A real
    * deployment swaps only this function.
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

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP on any
    * stock JVM): true decoded width/height and color-component count.
    * An undecodable payload raises — a corrupt blob in a 100 TB corpus
    * must surface in the job, not ride along as fabricated dimensions.
    * `byte_checksum` keeps the same pure byte-sum every kernel reports.
    */
  def decodeImage(r: MediaRecord): MediaFeatures = {
    imageIoNoCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable image payload for media_id=${r.media_id}")
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xFF).toLong; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      n_bytes = r.payload.length.toLong,
      width = img.getWidth,
      height = img.getHeight,
      channels = img.getColorModel.getNumComponents,
      n_frames = 1,
      byte_checksum = sum % 1000000007L)
  }

  /** The batch-decode kernel: receives a whole record batch, returns its
    * features. Images go through the REAL [[decodeImage]]; audio/video
    * fall to the documented [[decodeStub]] (no JVM-builtin codec exists
    * for them). A real codec decodes the batch in one native call — that
    * is the point of the batch shape.
    */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(r => if (r.modality == "image") decodeImage(r) else decodeStub(r))

  /** Batched feature extraction — the `mapInPandas` execution shape in
    * Scala: iterator-of-batches in, iterator-of-batches out. Each
    * partition streams `batchSize`-record batches through ONE call of the
    * batch-decode kernel, so a real codec amortizes its native setup per
    * batch, not per record.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatch(batch))
    }
  }

  /** Deterministic real PNG fixture: `width`x`height` RGB with pixel
    * (x, y) a pure function of (id, x, y), encoded by the JVM's PNG
    * writer. The BYTES are encoder-version-dependent (never asserted);
    * the decoded DIMENSIONS are exact — which is what makes a
    * round-trip through [[decodeImage]] certify an actual decoder.
    */
  def syntheticPng(id: Long, width: Int, height: Int): Array[Byte] = {
    imageIoNoCache
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((id * 31 + x * 7 + y * 13) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media fixture generator over a plain id/text frame, exercising BOTH
    * kernel paths with oracle-predictable outputs: even ids become real
    * PNGs whose dimensions are arithmetic in the id (8 + id % 32 wide,
    * 8 + (id / 3) % 32 tall — so a real decode, and only a real decode,
    * reproduces them), odd ids become UTF-8 "video" payloads for the
    * documented stub path. Runs in the same batched `mapPartitions`
    * shape as the decode kernels (PNG encoding is the expensive step —
    * per-partition, streaming, no driver involvement).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String)
                    (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        if (id % 2 == 0)
          MediaRecord(id, "image",
            syntheticPng(id, (8 + id % 32).toInt, (8 + (id / 3) % 32).toInt))
        else MediaRecord(id, "video", text.getBytes("UTF-8"))
      })
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
