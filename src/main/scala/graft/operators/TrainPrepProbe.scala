package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall-time attribution for
  * Pack.trainPrepScored (the SimhashProbe discipline — when a bench
  * median moves, force each pipeline stage and publish receipts
  * instead of guessing). Run:
  * `runMain graft.operators.TrainPrepProbe <sfDir>` (defaults to sf0.1).
  */
object TrainPrepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // run the stages in dependency order, each forced by an action
    val surv = Curate.survivors(spark, dir)
    t("survivors (cold cache)")(surv.count())
    t("survivors (warm)")(surv.count())
    val model = t("modelOf build")(
      Perplexity.modelOf(spark, surv).localCheckpoint())
    val sc = t("scoreAgainst")(
      Perplexity.scoreAgainst(model, surv).localCheckpoint())
    val cuts = t("cutsOf")(Perplexity.cutsOf(sc).collect().head)
    t("keep filter + semi join") {
      surv.join(
        sc.where(col("xent") <= cuts.getAs[Double]("c2")).select("doc_id"),
        Seq("doc_id"), "left_semi").count()
    }
    // replicate the query's own sub-frames (no checkpoints) to find
    // the recurring cost the stage probes above don't see
    locally {
      val sc2 = graft.DfCache.getOrCompute(spark, s"pplx_surv_scored:$dir") {
        Perplexity.scoreAgainst(Perplexity.modelOf(spark, surv), surv)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val keptIds = sc2.crossJoin(broadcast(Perplexity.cutsOf(sc2)))
        .where(Perplexity.bucketOf(col("xent"), col("c1"), col("c2")) =!= "tail")
        .select(col("doc_id"))
      t("q: keptIds count")(keptIds.count())
      val scored = surv.join(keptIds, Seq("doc_id"), "left_semi").select(
        col("doc_id"), col("text"),
        TextAnalysis.predictedLang(
          TextAnalysis.profileScore(col("text"), TextAnalysis.Profiles(0)._2),
          TextAnalysis.profileScore(col("text"), TextAnalysis.Profiles(1)._2),
          TextAnalysis.profileScore(col("text"), TextAnalysis.Profiles(2)._2))
          .as("mix_lang"))
      t("q: scored count")(scored.count())
      t("q: mixRatesOf collect")(
        Pack.mixRatesOf(spark, scored, "mix_lang").collect())
      t("q: mixKeepOf count")(
        Pack.mixKeepOf(spark, scored, "mix_lang").count())
    }
    t("full trainPrepScored pass 1")(Pack.trainPrepScored(spark, dir).count())
    t("full trainPrepScored pass 2")(Pack.trainPrepScored(spark, dir).count())
    t("trainPrepMixed (reference)")(Pack.trainPrepMixed(spark, dir).count())
    locally {
      val scored = graft.DfCache.getOrCompute(spark, s"pplx_surv_kept:$dir")(
        sys.error("memo must already be populated"))
      println(s"[probe] scored storageLevel = ${scored.storageLevel}")
      t("p2: scored count (memo)")(scored.count())
      t("p2: scored count again")(scored.count())
      t("p2: scored count 3rd")(scored.count())
      t("p2: mixRatesOf")(Pack.mixRatesOf(spark, scored, "mix_lang").collect())
      t("p2: mixKeepOf count")(Pack.mixKeepOf(spark, scored, "mix_lang").count())
      t("p2: seqPackOf count")(
        Pack.seqPackOf(Pack.mixKeepOf(spark, scored, "mix_lang")
          .select(col("doc_id"), col("text")), 256, 32, sorted = true).count())
    }
    spark.stop()
  }
}
