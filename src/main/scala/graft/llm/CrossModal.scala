package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CROSS-MODAL paired-data integrity — the operator family for
  * (caption, image) style training pairs, where each modality's dedup
  * alone is blind to the defect that actually poisons contrastive /
  * captioning training sets: two pairs sharing (near-)identical IMAGES
  * under DIFFERENT captions teach the model contradictory targets for
  * the same input (and vice versa for boilerplate captions over
  * unrelated images). The reference has no multimodal surface at all
  * (SURVEY.md §2.4); this is the north-star "multimodal columns" brief
  * composed with the dedup layer: inputs are the OUTPUTS of the
  * existing per-modality machinery (perceptual near-dup pairs from the
  * wide banded family, caption keys from text near-dup clusters), so
  * the candidate generation is always bucketed/banded — this layer
  * adds only id-keyed joins, never an all-pairs pass.
  */
object CrossModal {

  /** Training-pair CONTAMINATION: the image near-dup pairs whose
    * caption keys DISAGREE — pair (a, b) has images within the
    * perceptual budget (`imagePairs`, e.g.
    * [[Dedup.hammingNearDupPairsWide]] output `(id_a, id_b, hamming)`)
    * but captions in different equivalence classes (`captionKeys`:
    * one `(idCol, keyCol)` row per pair-id; use text near-dup CLUSTER
    * ids — [[Dedup.dedupClusters]] with singleton fallback to the own
    * id — so lightly-edited captions still count as agreeing). The
    * complement (same image, same caption class) is ordinary
    * duplication, handled by dedup; THESE rows are the contradictory
    * supervision a contrastive batch must not contain.
    *
    * 100 TB shape: `imagePairs` is already banded candidate output
    * (edge-sized, never corpus²); the two joins here are id-keyed
    * shuffles of (id, key) scalars against it. No collect, no
    * cross join, no width beyond two longs per side.
    *
    * @return (id_a, id_b, hamming, key_a, key_b), key_a ≠ key_b —
    *   one row per contaminated image-mate pair.
    */
  def pairContamination(imagePairs: DataFrame, captionKeys: DataFrame,
                        idCol: String, keyCol: String): DataFrame = {
    // captionKeys is consumed once per pair side and its upstream (a
    // cluster-keying join over the text near-dup closure) is expensive;
    // pin the narrow (id, key) frame so that upstream runs once, not
    // twice. The round-19 paired sf10 A/B (MatProbe, interleaved in one
    // JVM) measured the pin a ~1.5x win (pin 26.6 s median vs un-pinned
    // 41.1 at sf10) — unlike the cheap-kernel signature frames, where
    // the same pin is a loss (see Dedup.hammingNearDupPairsWide).
    val keys = graft.ops.Materialize.pin(
      captionKeys.select(col(idCol), col(keyCol)))
    imagePairs
      .join(keys.select(col(idCol).as("id_a"), col(keyCol).as("key_a")),
        Seq("id_a"))
      .join(keys.select(col(idCol).as("id_b"), col(keyCol).as("key_b")),
        Seq("id_b"))
      .filter(col("key_a") =!= col("key_b"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("key_a"), col("key_b"))
  }

  /** Caption equivalence keys from text near-dup clusters: every
    * pair-id keyed by its caption's cluster id, singletons by the
    * caption id itself — the standard `coalesce(cluster, own)` keying
    * ([[graft.llm.Curation.clusterSplit]] uses the same rule for
    * leakage-safe splits). `captionOf` maps pair-id → caption-doc id
    * (pairs may SHARE a caption row, e.g. an alt-text reused across
    * crops — that is exactly when ids must share a key).
    *
    * @param captionOf (idCol, captionCol) — pair id → caption doc id
    * @param clusters  (captionCol, clusterCol) — text near-dup clusters
    * @return (idCol, key)
    */
  def captionKeysFromClusters(captionOf: DataFrame, clusters: DataFrame,
                              idCol: String, captionCol: String,
                              clusterCol: String): DataFrame =
    captionOf
      .join(clusters, Seq(captionCol), "left")
      .select(col(idCol),
        coalesce(col(clusterCol), col(captionCol)).as("key"))

  /** The INVERSE defect of [[pairContamination]]: BOILERPLATE captions —
    * caption near-dup mates (`captionPairs`: text near-dup pair output,
    * `(id_a, id_b)` + any extra columns, banded candidates by
    * construction) whose IMAGES are NOT perceptual near-dups. A scraped
    * alt-text template ("stock photo", "image may contain…") repeated
    * across unrelated images teaches a captioner to emit the template
    * regardless of input; per-modality dedup never sees it because
    * neither side alone is a duplicate PAIR problem. Image distance is
    * recomputed directly on the pair ids from the two-word signatures
    * (`imageHashes`: one `(idCol, loCol, hiCol)` row per pair-id) —
    * id-keyed joins against an edge-sized pair set, never all-pairs;
    * kept rows have total two-word hamming > `maxHamming` (the same
    * budget under which the pair WOULD have been an ordinary dup).
    *
    * @return (id_a, id_b, img_hamming), img_hamming > maxHamming
    */
  def captionBoilerplate(captionPairs: DataFrame, imageHashes: DataFrame,
                         idCol: String, loCol: String, hiCol: String,
                         maxHamming: Int): DataFrame = {
    // imageHashes is consumed once per pair side; pin the narrow
    // (id, lo, hi) frame so the perceptual decode kernel behind it runs
    // once, not twice (24 bytes/row, never the payload frame).
    // Pin measured a WASH at sf10 (round-19 paired MatProbe A/B: by the
    // converged round all three treatments read ~10.3 s; mins none
    // 10.31 / pin 10.32 / share 11.53) — kept for the decode-once
    // argument at sf0.1, where the image-hash kernel behind
    // `imageHashes` is the query's dominant cost and is consumed once
    // per pair side.
    val hashes = graft.ops.Materialize.pin(
      imageHashes.select(col(idCol), col(loCol), col(hiCol)))
    val h = (side: String) => hashes.select(
      col(idCol).as(s"id_$side"), col(loCol).as(s"lo_$side"),
      col(hiCol).as(s"hi_$side"))
    captionPairs.select("id_a", "id_b")
      .join(h("a"), Seq("id_a")).join(h("b"), Seq("id_b"))
      .withColumn("img_hamming",
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("int"))
      .filter(col("img_hamming") > maxHamming)
      .select(col("id_a"), col("id_b"), col("img_hamming"))
  }
}
