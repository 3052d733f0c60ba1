package graft.functions

/** Pluggable tokenization for the trainer-facing operators
  * (Pack.seqPackWith, TextAnalysis.tokenVocabWith) — the same seam
  * shape as Ingest.TextEmbedder (reference: the model seam around
  * SentenceTransformer, core/utils.py:105): `open()` runs once per
  * partition (the expensive artifact load), `tokenize` receives
  * BATCHES of texts. A packing layout in whitespace-token units is
  * off by the BPE fertility factor for any real trainer; this seam
  * lets deployment swap in the production tokenizer without touching
  * pipeline code, while [[WhitespaceTokenizer]] keeps the
  * oracle-checkable default exactly equal to the pure-Column path
  * (TokenizerSpec pins the equivalence).
  */
trait Tokenizer extends Serializable {
  def open(): TokenEncoder
  /** texts per tokenize call. */
  def batchSize: Int = 256
}

trait TokenEncoder {
  /** One token sequence per input text, same order and count. */
  def tokenize(texts: Seq[String]): Seq[Seq[String]]
}

/** STUB tokenizer: the whitespace split every oracle-gated query
  * counts in (TextFunctions.tokens = `split(text, " ")`, which keeps
  * trailing empties — `split(" ", -1)` is the row-at-a-time twin).
  * seqPackWith(WhitespaceTokenizer) is bit-identical to the columnar
  * seqPack.
  */
object WhitespaceTokenizer extends Tokenizer {
  def open(): TokenEncoder = new TokenEncoder {
    def tokenize(texts: Seq[String]): Seq[Seq[String]] =
      texts.map(_.split(" ", -1).toSeq)
  }
}

/** Byte-pair-encoding over a FILE-LOADED merges artifact — the
  * deployment shape of a real trainer tokenizer (published merge
  * table, loaded once per partition), the tokenizer analog of
  * Ingest.RandomProjectionEmbedder. Texts are whitespace
  * pre-tokenized; each pre-token starts as its character symbols and
  * adjacent pairs are merged in rank order (lowest rank first —
  * standard greedy BPE). Deterministic for a fixed artifact; the
  * token count per document is the sequence-packing unit, so the
  * same corpus packs into MORE sequences than under whitespace
  * counting (fertility > 1) — exactly the correction a real
  * pretraining layout needs.
  *
  * `mergesPath` must be readable on every executor (shared storage /
  * `SparkContext.addFile` on a real cluster; a local path in local
  * mode).
  */
final class BpeTokenizer(mergesPath: String) extends Tokenizer {
  def open(): TokenEncoder = new TokenEncoder {
    private val ranks = BpeModel.load(mergesPath)   // per-partition load
    def tokenize(texts: Seq[String]): Seq[Seq[String]] =
      texts.map(t => t.split(" ", -1).toSeq.flatMap(encodeWord))

    private def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq("")   // keep whitespace-split arity: an
      // empty pre-token is one (empty) token, as in the stub
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        // lowest-rank adjacent pair present in the word
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          // merge EVERY occurrence of the chosen pair, left to right
          val (a, b) = (syms(best), syms(best + 1))
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
  }
}

/** Writer/loader/trainer for the BPE merges artifact: a small binary
  * file (magic, count, then UTF pair per merge, rank = position).
  * `train` is a driver-side utility that learns merges greedily from
  * a sample corpus (most-frequent adjacent pair, lexicographic
  * tie-break — deterministic); production runs would publish merges
  * converted from the real trainer's tokenizer artifact instead.
  */
object BpeModel {
  private val Magic = 0x47425031   // "GBP1"

  def write(path: String, merges: Seq[(String, String)]): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f)))
    try {
      out.writeInt(Magic); out.writeInt(merges.size)
      merges.foreach { case (a, b) => out.writeUTF(a); out.writeUTF(b) }
    } finally out.close()
  }

  /** rank map: merge pair → position in the learned order. */
  def load(path: String): Map[(String, String), Int] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      require(in.readInt() == Magic, s"$path is not a graft BPE merges file")
      val n = in.readInt()
      require(n >= 0 && n <= (1 << 24), s"implausible merge count $n in $path")
      (0 until n).map(i => ((in.readUTF(), in.readUTF()), i)).toMap
    } finally in.close()
  }

  def train(texts: Iterator[String], nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    // word frequencies once; each word as its evolving symbol sequence
    val wordFreq = scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.split(" ", -1).foreach { w =>
      if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    var words: Vector[(Vector[String], Long)] =
      wordFreq.toVector.sortBy(_._1).map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val pairCount = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCount(p) = pairCount.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCount.isEmpty) exhausted = true
      else {
        // deterministic argmax: highest count, then lexicographic pair
        val (a, b) = pairCount.toVector
          .minBy { case ((x, y), n) => (-n, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), n)
        }
        k += 1
      }
    }
    merges.result()
  }
}
