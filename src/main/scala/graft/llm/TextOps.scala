package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators.
  *
  * Everything here is a pure Catalyst column expression (codegen'd,
  * whole-stage-compatible, no UDFs) and deterministic across engines: the
  * only hash primitive is MD5, whose hex output is identical in Spark and
  * DuckDB, so every downstream operator (minhash, simhash, fingerprints)
  * is exactly oracle-checkable.
  */
object TextOps {

  /** Canonical text form: lowercase, trimmed, whitespace collapsed. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** A 60-bit non-negative hash of a string column: the first 15 hex chars
    * of MD5, parsed base-16. 60 bits keeps the value strictly inside a
    * signed 64-bit long in every engine (no overflow-to-null edge), and
    * `conv` + `cast` mirrors DuckDB's `CAST('0x' || substr(md5(x),1,15) AS
    * BIGINT)` exactly.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted 60-bit hash: one independent hash function per integer salt
    * (the universal-hash family used by minhash signatures).
    */
  def hash60Salted(c: Column, salt: Int): Column =
    hash60(concat(lit(s"$salt:"), c))

  /** Distinct k-word shingles of the normalized text. Documents shorter
    * than k words contribute their whole text as a single shingle so no
    * row silently drops out of a dedup pass.
    */
  def wordShingles(text: Column, k: Int): Column = {
    val ws = tokens(text)
    val nShingles = size(ws) - (k - 1)
    array_distinct(
      when(nShingles >= 1,
        transform(sequence(lit(1), nShingles),
          i => concat_ws(" ", slice(ws, i, lit(k)))))
        .otherwise(array(concat_ws(" ", ws))))
  }
}
