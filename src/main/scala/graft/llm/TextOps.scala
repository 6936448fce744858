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

  /** Adjacent token pairs of a text column, each as "w1 w2": a NARROW
    * zip of the token array against its own tail — no window, no shuffle
    * to form pairs. A 0/1-token doc yields zero pairs (slice length
    * clamps to 0). Shared by BPE pair counting and bigram surprisal so
    * the pair-forming shape (and its DuckDB twin) lives in one place.
    */
  def adjacentPairs(text: Column): Column =
    element_at(transform(array(tokens(text)), ws => {
      val len = greatest(size(ws) - 1, lit(0))
      zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b))
    }), 1)

  /** A 60-bit non-negative hash of a string column: the first 15 hex chars
    * of MD5, parsed base-16. 60 bits keeps the value strictly inside a
    * signed 64-bit long in every engine (no overflow-to-null edge), and
    * the value mirrors DuckDB's `CAST('0x' || substr(md5(x),1,15) AS
    * BIGINT)` exactly. Evaluated by the native codegen'd
    * [[graft.functions.Hash60Expr]] (the composed
    * `conv(substring(md5(x),1,15),16,10)` form allocates two strings and
    * a radix parse per call — this is the hottest primitive in the
    * engine).
    */
  def hash60(c: Column): Column = graft.functions.HashFunctions.hash60(c)

  /** Salted 60-bit hash: one independent hash function per integer salt. */
  def hash60Salted(c: Column, salt: Int): Column =
    hash60(concat(lit(s"$salt:"), c))

  /** Scala-side twin of [[hash60]] — used at PLAN TIME to derive
    * deterministic constants (minhash universal-hash parameters, LSH
    * hyperplane weights) that are baked into the plan as literals instead
    * of being recomputed per row. Standard MD5, identical to the engine's.
    */
  def hash60Scala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Mersenne prime 2^31-1: the minhash universal-hash modulus. Keeping
    * hashes under 2^31 bounds a*h+b under 2^62 — exact int64 everywhere.
    */
  val MinhashP: Long = 2147483647L

  /** Deterministic universal-hash parameters (a_i, b_i) for minhash
    * function i: h_i(x) = (a_i * (hash60(x) mod P) + b_i) mod P.
    */
  def minhashParams(i: Int): (Long, Long) =
    (hash60Scala(s"a:$i") % (MinhashP - 1) + 1, hash60Scala(s"b:$i") % MinhashP)

  /** Distinct k-word shingles of the normalized text. Documents shorter
    * than k words contribute their whole text as a single shingle so no
    * row silently drops out of a dedup pass.
    */
  def wordShingles(text: Column, k: Int): Column = {
    // The token array is LET-BOUND once per row through a one-element
    // `transform` lambda. Referencing `tokens(text)` directly from every
    // element_at would duplicate the split+regexp subtree at each use
    // site, and expression evaluation re-runs it per element — ~3k
    // re-tokenizations of the document per row. Bound as a lambda
    // variable, tokenization runs exactly once per row.
    // element_at is O(1) per word; the earlier slice() form allocated a
    // k-element array per shingle inside an interpreted lambda and was the
    // single hottest expression in the dedup pipelines.
    val shingled = transform(array(tokens(text)), ws => {
      val nShingles = size(ws) - (k - 1)
      when(nShingles >= 1,
        transform(sequence(lit(1), nShingles),
          i => concat_ws(" ", (0 until k).map(o => element_at(ws, i + o)): _*)))
        .otherwise(array(concat_ws(" ", ws)))
    })
    array_distinct(element_at(shingled, 1))
  }

  /** All k-word shingles WITH multiplicity (no distinct): the variant
    * frequency analyses need ([[TextAnalysis.repetitionSignals]] counts
    * how often the hottest gram repeats — dedup would erase the signal).
    * Same let-bound single-tokenization shape as [[wordShingles]].
    */
  def wordShinglesAll(text: Column, k: Int): Column = {
    val shingled = transform(array(tokens(text)), ws => {
      val nShingles = size(ws) - (k - 1)
      when(nShingles >= 1,
        transform(sequence(lit(1), nShingles),
          i => concat_ws(" ", (0 until k).map(o => element_at(ws, i + o)): _*)))
        .otherwise(array(concat_ws(" ", ws)))
    })
    element_at(shingled, 1)
  }
}
