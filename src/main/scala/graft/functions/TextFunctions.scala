package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by ingestion, dedup and analysis operators.
  *
  * Everything is a pure `Column` composition over Spark built-ins
  * (codegen-friendly, no UDFs), and every hash is md5-based so the
  * DuckDB oracle can reproduce results bit-for-bit (SURVEY.md §6):
  * Spark's murmur3 `hash()` never appears in an oracle-checked path.
  */
object TextFunctions {

  /** Whitespace tokens (the reference tokenizes with `str.split()` —
    * core/supabase_utils.py:303).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** First `len` hex chars of md5(input), parsed as a long.
    * Cross-engine: DuckDB `('0x' || substr(md5(x), start, len))::BIGINT`.
    */
  def md5Long(c: Column, start: Int, len: Int): Column =
    conv(substring(md5(c), start, len), 16, 10).cast("long")

  /** Overlapping fixed-size chunk array — trimmed, empties dropped,
    * replicating the reference's loop semantics exactly
    * (core/utils.py:71 `chunk_text`): stride = size - overlap, and a
    * start is only emitted if it is 0 or the previous chunk did not
    * already reach end-of-text (`if end >= text_length: break`).
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    val stride = size - overlap
    val starts = filter(
      sequence(lit(0), length(text) - 1, lit(stride)),
      s => (s === 0) || (s + lit(overlap) < length(text)))
    filter(
      transform(starts, s => trim(substring(text, s + 1, lit(size)))),
      c => c =!= "")
  }

  /** Word n-gram shingle set (distinct), the unit of MinHash /
    * Jaccard dedup.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    // sequence(0, negative) counts DOWN in Spark — guard short docs
    when(size(toks) >= n, array_distinct(filter(grams, g => g =!= "")))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature component `p`: lexicographic min of
    * md5(p || '|' || shingle). Min over any total order on a good hash
    * is a valid MinHash permutation, and string-min is identical in
    * Spark and DuckDB (no integer parsing needed).
    */
  def minhashComponent(shinglesCol: Column, p: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(p.toString), lit("|"), s))))

  /** Full signature as an array of `perms` md5-string minima. */
  def minhashSignature(shinglesCol: Column, perms: Int): Column =
    array((0 until perms).map(p => minhashComponent(shinglesCol, p)): _*)
}
