package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression builders for text dedup / analysis operators.
  *
  * Everything here is pure Catalyst expression composition (codegen'd,
  * whole-stage-friendly, no UDFs) and has a mechanical DuckDB translation —
  * the hash-exact oracle parity requirement. Portable hashing is md5-based:
  * both engines agree on md5 of identical strings, and
  * `conv(substr(md5(x),1,15),16,10)` / `('0x'||substr(md5(x),1,15))::BIGINT`
  * agree on the derived 60-bit integer.
  */
object TextOps {

  /** Modulus for rolling fingerprints (fits 31*P + P in a long). */
  val FP_MOD = 1000000007L

  /** Lowercased, empty-stripped word array. */
  def words(text: Column): Column =
    filter(split(lower(text), " "), w => w =!= "")

  /** Distinct word n-gram shingles (empty array when fewer than n words).
    *
    * The words expression is bound to a transform lambda variable via a
    * one-element array wrap so it is evaluated ONCE per row; referencing
    * `wordsCol` directly from the gram lambda would re-run the whole
    * words subtree (filter+split+lower) for every element_at — the
    * nested-HOF O(m*n) re-evaluation trap (measured 2.8x on the gram
    * build even after parallelizing).
    */
  def shingles(wordsCol: Column, n: Int): Column = {
    val bound = transform(array(wordsCol), ws => {
      val grams = transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, (i + k + 1).cast("int"))): _*))
      array_distinct(when(size(ws) >= n, grams).otherwise(array().cast("array<string>")))
    })
    element_at(bound, 1)
  }

  /** LSH band keys from a numeric minhash signature (values < 2^31): bands
    * of `rowsPerBand` hashes packed into one long — integer-exact, no
    * string hashing on the banding path, identical arithmetic in DuckDB. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column = {
    require(rowsPerBand >= 1 && rowsPerBand <= 2,
      "packed band keys support 1 or 2 rows per band")
    transform(sequence(lit(0), lit(numBands - 1)),
      b =>
        if (rowsPerBand == 1) element_at(sig, (b + 1).cast("int"))
        else element_at(sig, (b * 2 + 1).cast("int")) * lit(2147483648L) +
          element_at(sig, (b * 2 + 2).cast("int")))
  }

  /** 60-bit portable word hash. */
  def wordHash60(w: Column): Column =
    conv(substr(md5(w), lit(1), lit(15)), 16, 10).cast("long")

  /** Rolling polynomial fingerprint over words: fold (acc*31 + h(w)) mod P.
    * (Order-sensitive document fingerprint; reference-class operator for
    * near-identical prefix detection.) */
  def rollingFingerprint(wordsCol: Column): Column =
    aggregate(
      wordsCol,
      lit(0L),
      (acc, w) => (acc * 31L + conv(substr(md5(w), lit(1), lit(8)), 16, 10).cast("long") % FP_MOD) % FP_MOD)

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
}
