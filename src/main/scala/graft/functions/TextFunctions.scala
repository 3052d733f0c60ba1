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

  /** Parse hex chars of an ALREADY-hashed column as a long. */
  def hexLong(c: Column, start: Int, len: Int): Column =
    conv(substring(c, start, len), 16, 10).cast("long")

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
    // empty text guard (chunk_text("") == [], core/utils.py:78):
    // sequence(0, -1) would otherwise count DOWN in Spark
    when(length(text) > 0,
      filter(
        transform(starts, s => trim(substring(text, s + 1, lit(size)))),
        c => c =!= ""))
      .otherwise(array().cast("array<string>"))
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

  /** Distinct word-n-gram posting list: (doc_id, s) rows. This is the
    * scale shape for shingle work — `split` is evaluated once per row
    * inside the Generate, and no shingle ARRAY ever enters a shuffle
    * (HOF lambdas over inlined expressions re-evaluate `split` per
    * element, which made the array form ~100× slower).
    */
  def shinglePosting(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      n: Int): org.apache.spark.sql.DataFrame = {
    df.select(id.as("doc_id"), tokens(text).as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - n)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(j => element_at(col("toks"), col("i") + j + 1)): _*).as("g"))
      .where(col("g") =!= "")
      // carry the 16-hex-char md5 prefix, not the gram text: ~4× less
      // shuffle payload through distinct/joins; collisions ~2^-64·pairs
      .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("s"))
      .distinct()
  }

  /** MinHash permutation p of a base shingle hash: one md5 per
    * shingle (`md5Long(s,1,8)`, 32-bit), then cheap arithmetic
    * mixing — (A_p·h + B_p) mod P with P prime > 2^32. Products stay
    * < 2^57, safe under ANSI overflow checking, and the same integer
    * expression runs in DuckDB.
    */
  def minhashPerm(h: Column, p: Column): Column =
    (lit(976369L) * (p + 1) * h + lit(1234567L) * p) % lit(4294967311L)
}
