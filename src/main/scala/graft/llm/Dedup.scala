package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * Four strategies, all shuffle-frugal by construction:
  *  - exact:   one hash-groupBy on md5(text); at 100 TB this is a single
  *             shuffle on a 16-byte key with map-side pre-aggregation.
  *  - minhash: shingle → k-permutation signature → banded LSH keys →
  *             equi-join on (band, key). The cross-document comparison is
  *             confined to hash buckets, never a cross join; candidate
  *             pairs are verified with exact Jaccard.
  *  - simhash: 60-bit fingerprint; near-dup candidates via pigeonhole band
  *             equality (h ≤ bands-1 differing bits guarantees one equal
  *             band), verified by Hamming distance.
  *  - ngram:   exact pairwise Jaccard within an explicit blocking key
  *             (e.g. source) — the quadratic fallback, bounded per block.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text with count and the
    * kept (minimum) id. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Per-document MinHash signature over word n-gram shingles. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame =
    docs
      .withColumn("__words", TextOps.words(col(textCol)))
      .withColumn("shingles", TextOps.shingles(col("__words"), shingleN))
      .filter(size(col("shingles")) > 0)
      .withColumn("mh", TextOps.minhashSignature(col("shingles"), numHashes))
      .select(col(idCol), col("shingles"), col("mh"))

  /** LSH candidate pairs with exact-Jaccard verification.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, numBands: Int = 4,
      threshold: Double = 0.0): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, numHashes)
    val bands = sigs
      .withColumn("band_keys", TextOps.bandKeys(col("mh"), numBands, rowsPerBand))
      .select(col(idCol), col("shingles"),
        posexplode(col("band_keys")).as(Seq("band_idx", "band_key")))
    val a = bands.select(col(idCol).as("id_a"), col("shingles").as("sh_a"),
      col("band_idx"), col("band_key"))
    val b = bands.select(col(idCol).as("id_b"), col("shingles").as("sh_b"),
      col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("jaccard", round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-document 60-bit SimHash fingerprints. */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__words", TextOps.words(col(textCol)))
      .filter(size(col("__words")) > 0)
      .withColumn("simhash", TextOps.simhash60(col("__words")))
      .select(col(idCol), col("simhash"))

  /** SimHash near-duplicate pairs: banded candidate generation (pigeonhole
    * over `numBands` bit-bands of the 60-bit fingerprint), verified by
    * Hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      numBands: Int = 4, maxHamming: Int = 10): DataFrame = {
    val bitsPerBand = 60 / numBands
    val fps = simhashFingerprints(docs, idCol, textCol)
    val bandExprs = (0 until numBands).map(b =>
      shiftright(col("simhash"), b * bitsPerBand).bitwiseAND((1L << bitsPerBand) - 1L))
    val bands = fps.select(col(idCol), col("simhash"),
      posexplode(array(bandExprs: _*)).as(Seq("band_idx", "band_val")))
    val a = bands.select(col(idCol).as("id_a"), col("simhash").as("fp_a"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col(idCol).as("id_b"), col("simhash").as("fp_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard pairs within a blocking key. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 2, threshold: Double = 0.05): DataFrame = {
    val sh = docs
      .withColumn("__words", TextOps.words(col(textCol)))
      .withColumn("sh", TextOps.shingles(col("__words"), n))
      .select(col(blockCol), col(idCol), col("sh"))
    val a = sh.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("jaccard"))
  }
}
