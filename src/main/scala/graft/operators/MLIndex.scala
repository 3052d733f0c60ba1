package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector => MLVector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.sources.Tables

/** MLlib-powered batch index construction — the cluster-scale answer
  * to the reference's offline `embed_pdfs` pass
  * (core/management/commands/embed_pdfs.py:59): instead of a python
  * loop filling a FAISS IndexFlatIP, the index structure itself is
  * LEARNED distributedly (KMeans coarse quantizer for IVF; TF-IDF
  * document vectors), then persisted as partitioned columnar tables.
  * Search-time cost drops to nProbe/k of the corpus with data-adaptive
  * buckets rather than the fixed `label` partitions of
  * VectorSearch.annIvf.
  */
object MLIndex {

  val NClusters = 8
  val Seed      = 42L

  /** Fit the coarse quantizer and assign every vector its IVF bucket:
    * (vec_id, emb, bucket) plus the learned centroids.
    */
  def kmeansIvf(spark: SparkSession, dir: String): (DataFrame, Array[MLVector]) = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val assembler = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val withFeatures = vecs.withColumn("features", assembler(col("emb")))
    val model = new KMeans()
      .setK(NClusters).setSeed(Seed).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("bucket")
      .fit(withFeatures)
    (model.transform(withFeatures)
      .select(col("vec_id"), col("emb"), col("bucket")), model.clusterCenters)
  }

  /** IVF search over learned buckets: rank centroids per query, probe
    * the nearest `nProbe`, exact top-k inside them.
    */
  def kmeansIvfSearch(spark: SparkSession, dir: String, nProbe: Int, k: Int): DataFrame = {
    val (indexed, centers) = kmeansIvf(spark, dir)
    val centroids = spark.createDataFrame(
      centers.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) }.toSeq)
      .toDF("bucket", "c_emb")
    val q = indexed.where(col("vec_id") < VectorSearch.NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("bucket"),
        V.cosine4(col("q_emb"), col("c_emb")).as("c_cos"))
      .withColumn("prk", VectorSearch.rank("c_cos", "bucket", "q_id"))
      .where(col("prk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("bucket"))
    VectorSearch.topKExplode(
      indexed.where(col("vec_id") >= VectorSearch.NQueries)
        .join(broadcast(probes), Seq("bucket"))
        .select(col("q_id"), col("vec_id"),
          V.cosine4(col("q_emb"), col("emb")).as("cos")), k, "vec_id")
  }

  /** TF-IDF document vectors via the MLlib pipeline
    * (Tokenizer → HashingTF → IDF → L2 Normalizer) — a learned
    * replacement for the hashed-BoW stand-in embedding; the IDF model
    * is the "trained" component built in one distributed pass.
    */
  def tfidfVectors(spark: SparkSession, dir: String, numFeatures: Int = 256): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val tokenized = new Tokenizer().setInputCol("text").setOutputCol("words")
      .transform(docs)
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
      .setNumFeatures(numFeatures).transform(tokenized)
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    val normalized = new Normalizer().setInputCol("tfidf").setOutputCol("norm_tfidf")
      .setP(2.0).transform(idfModel.transform(tf))
    normalized.select(col("doc_id"), vector_to_array(col("norm_tfidf")).as("emb"))
  }

  /** Top-k similar-document pairs under the TF-IDF representation
    * (dense cosine over the learned vectors, label-free blocking by
    * shared max-weight feature).
    */
  def tfidfTopPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val v = tfidfVectors(spark, dir)
      .withColumn("block", expr("array_position(emb, array_max(emb)) - 1"))
    val a = v.select(col("block"), col("doc_id").as("a_id"), col("emb").as("a_emb"))
    val b = v.select(col("block"), col("doc_id").as("b_id"), col("emb").as("b_emb"))
    a.join(b, Seq("block"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        V.cosine4(col("a_emb"), col("b_emb")).as("cos"))
      // an all-zero tfidf vector (every token in every doc) yields
      // cosine 0/0 = NaN, which Spark orders ABOVE every real value
      .where(!isnan(col("cos")))
      .orderBy(col("cos").desc, col("a_id"), col("b_id"))
      .limit(k)
  }
}
