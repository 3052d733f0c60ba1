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

/** A [[TokenEncoder]] that can also emit VOCABULARY IDS — the
  * signature a trainer actually consumes (token streams feed the
  * embedding lookup as ints, not strings). Contract: for every text,
  * `tokenizeIds` has exactly the same arity as `tokenize` (element i
  * is the id of token i), so any layout computed in token units —
  * sequence packing offsets, budgets, fill ratios — is identical
  * whichever representation the consumer reads. Unknown symbols map
  * to [[IdTokenEncoder.UnkId]] rather than being dropped (dropping
  * would silently shift every later offset).
  */
trait IdTokenEncoder extends TokenEncoder {
  def tokenizeIds(texts: Seq[String]): Seq[Seq[Int]]
}

object IdTokenEncoder {
  /** Reserved id for symbols outside the artifact's vocabulary. */
  val UnkId = 0
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
  def open(): TokenEncoder = new TokenEncoder with IdTokenEncoder {
    // per-partition artifact load (ranks + vocab in one file read)
    private val artifact = BpeModel.loadArtifact(mergesPath)
    private def ranks = artifact.ranks
    def tokenize(texts: Seq[String]): Seq[Seq[String]] =
      texts.map(t => t.split(" ", -1).toSeq.flatMap(encodeWord))

    /** Ids via the artifact's vocab table — same greedy merge walk,
      * so the arity contract with [[tokenize]] holds by construction.
      * Requires a v2 artifact (vocab present): silently inventing ids
      * for a v1 merges-only file would make ids depend on the
      * scoring corpus instead of the artifact.
      */
    def tokenizeIds(texts: Seq[String]): Seq[Seq[Int]] = {
      require(artifact.vocabIds.nonEmpty,
        s"$mergesPath is a merges-only (v1) artifact - retrain/rewrite " +
        "with a vocab table (BpeModel.write with vocab) to emit ids")
      texts.map(t => t.split(" ", -1).toSeq.flatMap(w =>
        encodeWord(w).map(s =>
          artifact.vocabIds.getOrElse(s, IdTokenEncoder.UnkId))))
    }

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

/** Writer/loader/trainer for the BPE artifact: a small binary file —
  * v1 `GBP1` is merges-only (magic, count, UTF pair per merge, rank =
  * position); v2 `GBP2` appends the VOCAB TABLE (count, UTF symbol
  * per id, position = id) — the deployment shape a trainer consumes,
  * since an id stream is meaningless without the id↔symbol mapping
  * frozen inside the same artifact. `train` is a driver-side utility
  * that learns merges greedily from a sample corpus (most-frequent
  * adjacent pair, lexicographic tie-break — deterministic);
  * production runs would publish an artifact converted from the real
  * trainer's tokenizer instead.
  *
  * Vocab id layout (deterministic for a fixed artifact): id 0 is
  * reserved for `<unk>` ([[IdTokenEncoder.UnkId]]), then the sorted
  * single-character alphabet (including "" — the empty pre-token the
  * whitespace-arity contract emits), then one symbol per merge in
  * rank order. Contiguous 0..V-1, no gaps.
  */
object BpeModel {
  private val Magic = 0x47425031    // "GBP1" merges only
  private val Magic2 = 0x47425032   // "GBP2" merges + vocab

  /** Loaded artifact: merge ranks + (for v2) the symbol → id table.
    * `vocabIds` is empty for a v1 file — string tokenization works,
    * id emission refuses (see BpeTokenizer.tokenizeIds).
    */
  final case class Artifact(ranks: Map[(String, String), Int],
                            vocabIds: Map[String, Int])

  /** Deterministic vocab for `merges` over `alphabet`: <unk>, sorted
    * alphabet, merge outputs in rank order (duplicates — a merge
    * output that equals an alphabet symbol — keep their FIRST id so
    * ids stay contiguous and the mapping stays a function).
    */
  def vocabOf(alphabet: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.HashSet[String]()
    (("<unk>" +: alphabet.distinct.sorted) ++
        merges.map { case (a, b) => a + b }).foreach { s =>
      if (seen.add(s)) out += s
    }
    out.result()
  }

  /** Train merges AND derive the deterministic vocab from the same
    * sample corpus — the one-call path to a v2 (id-emitting)
    * artifact: `val (m, v) = trainArtifact(docs, k); write(p, m, v)`.
    * The alphabet includes "" because the whitespace-arity contract
    * emits an empty token for an empty pre-token.
    */
  def trainArtifact(texts: Seq[String], nMerges: Int): (Seq[(String, String)], Seq[String]) = {
    val merges = train(texts.iterator, nMerges)
    val alphabet = "" +: texts.flatMap(_.split(" ", -1).toSeq)
      .flatMap(_.map(_.toString)).distinct
    (merges, vocabOf(alphabet, merges))
  }

  def write(path: String, merges: Seq[(String, String)],
            vocab: Seq[String] = Nil): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f)))
    try {
      out.writeInt(if (vocab.isEmpty) Magic else Magic2)
      out.writeInt(merges.size)
      merges.foreach { case (a, b) => out.writeUTF(a); out.writeUTF(b) }
      if (vocab.nonEmpty) {
        out.writeInt(vocab.size)
        vocab.foreach(out.writeUTF)
      }
    } finally out.close()
  }

  /** rank map: merge pair → position in the learned order. */
  def load(path: String): Map[(String, String), Int] = loadArtifact(path).ranks

  /** Full artifact: ranks, plus the vocab table when the file is v2. */
  def loadArtifact(path: String): Artifact = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val magic = in.readInt()
      require(magic == Magic || magic == Magic2,
        s"$path is not a graft BPE merges file")
      val n = in.readInt()
      require(n >= 0 && n <= (1 << 24), s"implausible merge count $n in $path")
      val ranks = (0 until n).map(i => ((in.readUTF(), in.readUTF()), i)).toMap
      val vocab =
        if (magic == Magic2) {
          val v = in.readInt()
          require(v >= 0 && v <= (1 << 24), s"implausible vocab size $v in $path")
          val ids = (0 until v).map(i => in.readUTF() -> i).toMap
          // toMap keeps the LAST id for a duplicate symbol, which would
          // silently break the first-id contract — fail loudly on a
          // malformed (e.g. hand-converted) artifact instead
          require(ids.size == v,
            s"$path vocab has ${v - ids.size} duplicate symbol(s)")
          ids
        } else Map.empty[String, Int]
      Artifact(ranks, vocab)
    } finally in.close()
  }

  /** Train a v2 artifact from a DETERMINISTIC md5-coin sample of a
    * DataFrame corpus — the honest 100 TB tokenizer-training shape: a
    * production tokenizer trains on a bounded sample (GPT-2/SentencePiece
    * practice), never the full corpus, and the driver-side trainer
    * below bounds what this helper may collect. The coin is the
    * repo-standard md5(doc_id) spelling, so the sample (hence the
    * artifact) is reproducible regardless of partitioning; the scan
    * prunes to the text column and the filter pushes to the coin
    * expression — the only driver-side bytes are the SAMPLED texts.
    *
    * @param corpus     (doc_id, text) frame
    * @param sampleFrac fraction of docs to collect for training
    * @param maxDocs    hard collect() bound — fail loudly instead of
    *                   OOMing the driver when the fraction was sized
    *                   for a smaller corpus
    */
  def trainArtifactSampled(corpus: org.apache.spark.sql.DataFrame,
      nMerges: Int, sampleFrac: Double,
      maxDocs: Long = 1000000L): (Seq[(String, String)], Seq[String]) = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0,
      s"sampleFrac must be in (0, 1], got $sampleFrac")
    import org.apache.spark.sql.functions._
    val coin = TextFunctions.md5Long(
        concat(lit("bpetrain:"), col("doc_id").cast("string")), 1, 8)
      .cast("double") / 4294967296.0
    val sampled = corpus.where(coin < sampleFrac)
      .orderBy(col("doc_id")).select(col("text"))
    val n = sampled.count()
    require(n <= maxDocs,
      s"BPE training sample has $n docs (> maxDocs = $maxDocs) — " +
        "lower sampleFrac; the trainer is driver-side by design")
    trainArtifact(sampled.collect().map(_.getString(0)).toSeq, nMerges)
  }

  /** DRIVER-SIDE by design: one pass over an in-memory sample builds
    * word frequencies, then `nMerges` greedy rounds over the evolving
    * symbol sequences — memory and time are bounded by the SAMPLE's
    * distinct words, not the corpus ([[trainArtifactSampled]] is the
    * corpus-scale entry and enforces the bound). Distributing the
    * pair-count rounds would shuffle the whole corpus `nMerges`
    * times to produce an artifact a sample determines just as well.
    */
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
