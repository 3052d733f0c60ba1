package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

class CosineExprSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("emb"))

  test("codegen expression is bit-identical to the HOF formulation") {
    val a = vecs.where(col("vec_id") < 20)
      .select(col("vec_id").as("a_id"), col("emb").as("a"))
    val pairs = a.crossJoin(vecs.where(col("vec_id") >= 20 && col("vec_id") < 40)
      .select(col("vec_id").as("b_id"), col("emb").as("b")))
    val both = pairs.select(
      Graft.cosine_similarity(col("a"), col("b")).as("expr_cos"),
      (VectorFunctions.dot(col("a"), col("b"))
        / (VectorFunctions.norm(col("a")) * VectorFunctions.norm(col("b")))).as("hof_cos"))
      .collect()
    assert(both.length == 400)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("expr_cos"))
        == java.lang.Double.doubleToLongBits(r.getAs[Double]("hof_cos")))
    }
  }

  test("cosine_similarity is registered for SQL") {
    Graft.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT a.vec_id, cosine_similarity(CAST(a.embedding AS ARRAY<DOUBLE>),
        |  CAST(b.embedding AS ARRAY<DOUBLE>)) AS cos
        |FROM emb_v a JOIN emb_v b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
  }

  test("native lsh_sign_code is bit-identical to the HOF formulation") {
    import graft.operators.VectorSearch
    val diverged = vecs
      .select(col("vec_id"),
        VectorSearch.lshCode(col("emb")).as("native"),
        VectorSearch.lshCodeHof(col("emb")).as("hof"))
      .where(col("native") =!= col("hof"))
      .limit(3).collect()
    assert(diverged.isEmpty, s"codes diverged: ${diverged.mkString("; ")}")
    // edge parity: NaN dots set every bit (Spark's > ranks NaN above
    // all); a null element zeroes the code (HOF null propagation)
    import spark.implicits._
    val edge = Seq(
      (1L, Seq[java.lang.Double](Double.NaN, 1.0, 2.0)),
      (2L, Seq[java.lang.Double](null, 1.0, 2.0)),
      (3L, Seq[java.lang.Double](1.0, -2.0, 0.5))).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<double>").as("emb"))
    val both = edge.select(col("vec_id"),
        VectorSearch.lshCode(col("emb")).as("native"),
        VectorSearch.lshCodeHof(col("emb")).as("hof"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    both.foreach { case (id, n, h) => assert(n == h, s"vec $id: native $n vs hof $h") }
    assert(both.find(_._1 == 1L).get._2 == 63L)   // NaN → all 6 bits
    assert(both.find(_._1 == 2L).get._2 == 0L)    // null element → 0
    // loud beyond the plane table, like the HOF raise_error guard
    val big = Seq(Tuple1(Array.fill(VectorSearch.LshMaxDim + 1)(1.0).toSeq)).toDF("emb")
    val e = intercept[Exception] {
      big.select(VectorSearch.lshCode(col("emb"))).collect()
    }
    assert(e.getMessage.contains("dims") ||
      Option(e.getCause).exists(_.getMessage.contains("dims")), e.getMessage)
  }

  test("expression participates in whole-stage codegen") {
    val a = vecs.limit(5).select(col("emb").as("a"))
    val df = a.crossJoin(vecs.limit(5).select(col("emb").as("b")))
      .select(Graft.cosine_similarity(col("a"), col("b")).as("c"))
    df.collect()   // AQE finalizes the physical plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as `*(n)` in the plan string
    assert(plan.contains("*(") && plan.contains("cosine_similarity"),
      s"no codegen span in:\n$plan")
    // self-similarity sanity through the codegen path
    val self = vecs.limit(3)
      .select(Graft.cosine_similarity(col("emb"), col("emb")).as("c")).collect()
    self.foreach(r => assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-9))
  }
}
