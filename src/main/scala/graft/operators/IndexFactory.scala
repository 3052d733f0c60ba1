package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FAISS-style index factory strings over graft's vector index family
  * — the one-line entry point a user of the reference's FAISS surface
  * (core/faiss_utils.py builds `IndexFlatIP`; `index_factory` is the
  * standard spelling for the rest of the family) reaches for first.
  *
  * Grammar (the FAISS `index_factory` subset this engine implements):
  * {{{
  *   Flat            brute-force exact cosine        → knn_brute
  *   LSH             random-hyperplane sign codes    → ann_lsh
  *   SQ8             int8 scalar quantization        → ann_quantized
  *   PQ8 | PQ8x4     product quantization            → ann_pq
  *   OPQ8,PQ8[x4]    seeded pre-rotation + PQ        → ann_opq
  *   IVF8,Flat       k-means coarse quantizer        → ann_ivf_kmeans
  *   IVF8,PQ8[x4]    IVF + PQ fine codes             → ann_ivfpq
  * }}}
  *
  * Any string that PARSES to the grammar but names an untrained
  * configuration (a different nlist, subspace count, or code width
  * than the staged index artifacts are built with) fails fast with
  * the supported grid in the message — the index parameters are part
  * of the persisted artifact's identity, exactly as a FAISS index
  * file fixes its own nlist/M at train time.
  *
  * Boundaries, stated rather than silently absent: the OPQ stage is
  * the seeded orthonormal Hadamard-diagonal rotation
  * (VectorSearch.opqRotate) — FAISS's LEARNED OPQ rotation trains by
  * alternating SVD, which no cross-engine oracle can replay, so the
  * deterministic rotation is the supported form. `HNSW` does not
  * parse at all: graph traversal with data-dependent insertion order
  * is inherently sequential and a poor fit for declarative DataFrame
  * plans — the IVF family is this engine's scale path, and the parse
  * error says so.
  */
object IndexFactory {

  /** A parsed factory string. `nlist` = coarse clusters (0 = no IVF
    * stage); `fine` = the fine-quantization stage.
    */
  sealed trait Fine
  case object FlatFine extends Fine
  case object Lsh8 extends Fine
  /** int8 scalar quantizer. */
  case object Sq8 extends Fine
  /** product quantizer: `m` subspaces, 2^`nbits` codebook entries. */
  final case class Pq(m: Int, nbits: Int) extends Fine

  final case class IndexSpec(nlist: Int, fine: Fine, opq: Boolean = false) {
    def render: String = {
      val f = fine match {
        case FlatFine   => "Flat"
        case Lsh8       => "LSH"
        case Sq8        => "SQ8"
        case Pq(m, nb)  => s"PQ${m}x$nb"
      }
      val body = if (nlist > 0) s"IVF$nlist,$f" else f
      if (opq) s"OPQ${VectorSearch.PqM},$body" else body
    }
  }

  private val IvfRe = "^IVF(\\d+)$".r
  private val PqRe  = "^PQ(\\d+)(?:x(\\d+))?$".r
  private val SqRe  = "^SQ(\\d+)$".r
  private val OpqRe = "^OPQ(\\d+)$".r

  /** Parse a factory string to its spec, or throw
    * IllegalArgumentException naming the offending component. Parsing
    * is grammar-only — see [[search]] for the trained-grid check.
    */
  def parse(s: String): IndexSpec = {
    val parts0 = s.trim.split(",").map(_.trim).filter(_.nonEmpty).toList
    if (parts0.exists(_.startsWith("HNSW")))
      throw new IllegalArgumentException(
        s"'$s': HNSW is not implemented — graph traversal with " +
          "data-dependent insertion order is inherently sequential and a " +
          "poor fit for declarative DataFrame plans; use the IVF family " +
          s"(e.g. 'IVF${VectorSearch.KmClusters},PQ${VectorSearch.PqM}x4') " +
          "as the scale path")
    // an OPQ prefix modifies the chain that follows it
    val (opq, parts) = parts0 match {
      case OpqRe(m) :: rest =>
        if (m.toInt != VectorSearch.PqM) throw new IllegalArgumentException(
          s"OPQ$m: the rotation feeds $m-subspace PQ; only " +
            s"OPQ${VectorSearch.PqM} is implemented")
        (true, rest)
      case rest => (false, rest)
    }
    def fineOf(p: String): Fine = p match {
      case "Flat"        => FlatFine
      case "LSH"         => Lsh8
      case SqRe(b)       => if (b == "8") Sq8
        else throw new IllegalArgumentException(
          s"SQ$b: only SQ8 (int8) scalar quantization is implemented")
      case PqRe(m, nb)   => Pq(m.toInt, Option(nb).map(_.toInt).getOrElse(4))
      case other         => throw new IllegalArgumentException(
        s"unrecognized index component '$other' in '$s'")
    }
    parts match {
      case IvfRe(n) :: fine :: Nil => IndexSpec(n.toInt, fineOf(fine), opq)
      case IvfRe(_) :: Nil => throw new IllegalArgumentException(
        s"'$s': IVF needs a fine stage, e.g. 'IVF${VectorSearch.KmClusters},Flat'")
      case fine :: Nil             => IndexSpec(0, fineOf(fine), opq)
      case Nil if opq => throw new IllegalArgumentException(
        s"'$s': OPQ is a pre-rotation and needs a quantizer after it, " +
          s"e.g. 'OPQ${VectorSearch.PqM},PQ${VectorSearch.PqM}x4'")
      case _                       => throw new IllegalArgumentException(
        s"cannot parse index factory string '$s'")
    }
  }

  /** The trained parameter grid: what the staged artifacts are built
    * with (VectorSearch constants). Rendered into error messages.
    */
  private def supported: Seq[String] = Seq(
    "Flat", "LSH", "SQ8",
    s"PQ${VectorSearch.PqM}x4",
    s"OPQ${VectorSearch.PqM},PQ${VectorSearch.PqM}x4",
    s"IVF${VectorSearch.KmClusters},Flat",
    s"IVF${VectorSearch.KmClusters},PQ${VectorSearch.PqM}x4")

  /** Top-k search for the index named by `spec` over the `dir`
    * embeddings — dispatches to the family member whose staged
    * artifacts match; throws for a parseable-but-untrained
    * configuration.
    */
  def search(spark: SparkSession, dir: String, spec: String): DataFrame = {
    val p = parse(spec)
    val pq4 = Pq(VectorSearch.PqM, 4)
    (p.nlist, p.fine, p.opq) match {
      case (0, FlatFine, false)                      => VectorSearch.knnBrute(spark, dir)
      case (0, Lsh8, false)                          => VectorSearch.annLsh(spark, dir)
      case (0, Sq8, false)                           => VectorSearch.annQuantized(spark, dir)
      case (0, `pq4`, false)                         => VectorSearch.annPq(spark, dir)
      case (0, `pq4`, true)                          => VectorSearch.annOpq(spark, dir)
      case (VectorSearch.KmClusters, FlatFine, false) => VectorSearch.annIvfKmeans(spark, dir)
      case (VectorSearch.KmClusters, `pq4`, false)    => VectorSearch.annIvfPq(spark, dir)
      case _ => throw new IllegalArgumentException(
        s"'${p.render}' parses but no staged index is trained with these " +
          s"parameters; supported: ${supported.mkString(", ")}")
    }
  }

  /** Text search over a PERSISTED index (a [[graft.sources.ChunkIndex]]
    * root) by factory string — the FAISS save → load(factory) →
    * search flow end-to-end: the index's manifest records its own
    * factory identity at write time (`param factory …`), and a loader
    * naming different parameters fails fast, exactly as a FAISS index
    * file fixes its nlist/M at train time. `spec` must parse (the
    * same grammar errors as [[search]]) AND render equal to the
    * recorded identity; a pre-parameter manifest (written before
    * identities were stamped) is also a loud failure rather than an
    * unchecked search.
    */
  def searchPersisted(spark: SparkSession, indexPath: String, spec: String,
      queryText: String, nProbe: Int = 2, k: Int = 5): DataFrame = {
    import graft.sources.ChunkIndex
    val p = parse(spec)
    val params = ChunkIndex.indexParams(spark, indexPath).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed index at $indexPath"))
    val recorded = params.getOrElse("factory",
      throw new IllegalArgumentException(
        s"index at $indexPath records no factory identity (pre-parameter " +
          "manifest) — rewrite or upsert it to stamp one"))
    if (p.render != parse(recorded).render)
      throw new IllegalArgumentException(
        s"factory '$spec' does not match the persisted index's " +
          s"'$recorded' at $indexPath")
    ChunkIndex.search(spark, indexPath, queryText, nProbe, k)
  }
}
