package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Par
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.F). The synthetic corpus has no natural duplicates, so each
  * operator runs over `corpusWithDups`: the documents table plus a
  * deterministic injected copy of every 7th document (exact copy for
  * exact dedup; first-word-dropped near-copy for the near-dup
  * operators). Every path is linear-scale: hash-aggregate for exact,
  * LSH band buckets for MinHash, half-key blocking for SimHash,
  * rare-shingle blocking for Jaccard — never an all-pairs join.
  */
object Dedup {

  val MinhashPerms = 16
  val Bands        = 4          // 4 bands × 4 rows
  val SimhashBits  = 32

  /** documents ∪ copies of every-7th doc (doc_id + 100000).
    * `perturb` drops the copy's first word to make near- rather than
    * exact duplicates.
    */
  private[operators] def corpusWithDups(spark: SparkSession, dir: String,
      perturb: Boolean): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val copyText =
      if (perturb) expr("substring(text, instr(text, ' ') + 1)")
      else col("text")
    base.unionAll(
      base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), copyText.as("text")))
  }

  /** Exact dedup: one md5 hash-aggregate; duplicate groups keep the
    * minimum doc_id as canonical.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    corpusWithDups(spark, dir, perturb = false)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .where(col("n_dups") > 1)
      .orderBy(col("keep_id"))

  /** MinHash + LSH near-dup: 16-perm signature (md5-string minima),
    * 4 bands of 4 rows; docs sharing a band bucket become candidate
    * pairs, then verified with true shingle Jaccard. Only the band
    * join shuffles, keyed by (band, band_key) — candidate volume is
    * O(near-dups), not O(n²).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignature(col("sh"), MinhashPerms)
    val rows = Bands match { case b => MinhashPerms / b }
    val docs = corpusWithDups(spark, dir, perturb = true)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", sig)
    val banded = docs.select(col("doc_id"), col("sh"),
      posexplode(array((0 until Bands).map { b =>
        md5(concat_ws("|", (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*))
      }: _*)).as(Seq("band", "band_key")))
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
        size(col("a_sh")).as("na"), size(col("b_sh")).as("nb"))
      .distinct()   // a pair may collide in several bands
      .select(col("a_id"), col("b_id"),
        Par.round4(col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(50)
  }

  /** SimHash near-dup: 32-bit signature from per-bit majority votes
    * of token md5s; candidate pairs share one of the two 16-bit
    * halves (guarantees recall for hamming ≤ 1 per half; standard
    * block-key trick), verified with exact hamming ≤ 6.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = corpusWithDups(spark, dir, perturb = true)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), md5Long(col("t"), 1, 8).as("h"))
    val bitVotes = (0 until SimhashBits).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$bit")
    }
    val sim = tok.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map { bit =>
          when(col(s"v$bit") > 0, lit(1L << bit)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
    val halves = sim.select(col("doc_id"), col("simhash"),
        lit(0).as("half_idx"), shiftright(col("simhash"), 16).as("half"))
      .unionAll(sim.select(col("doc_id"), col("simhash"),
        lit(1).as("half_idx"), col("simhash").bitwiseAND(0xFFFFL).as("half")))
    val a = halves.select(col("half_idx"), col("half"),
      col("doc_id").as("a_id"), col("simhash").as("a_sim"))
    val b = halves.select(col("half_idx"), col("half"),
      col("doc_id").as("b_id"), col("simhash").as("b_sim"))
    a.join(b, Seq("half_idx", "half"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= 6)
      .orderBy(col("hamming"), col("a_id"), col("b_id"))
  }

  /** Word-3-gram Jaccard over the natural corpus, blocked by rare
    * shingles (document frequency in [2,5]) so only plausibly-similar
    * pairs are compared; top-20 by similarity.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val posting = docs.select(col("doc_id"), col("sh"), explode(col("sh")).as("s"))
    val rare = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= 5)
      .select(col("s"))
    val blocked = posting.join(rare, "s")
    val a = blocked.select(col("s"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = blocked.select(col("s"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("s"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
        size(col("a_sh")).as("na"), size(col("b_sh")).as("nb"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        Par.round4(col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(20)
  }
}
