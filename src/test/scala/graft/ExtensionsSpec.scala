package graft

import org.apache.spark.sql.graftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The config-driven install path (`spark.sql.extensions=
  * graft.GraftExtensions`): verify the installer registers the native
  * function and that the built expression evaluates — without
  * building a second SparkContext (getOrCreate would silently reuse
  * the shared test session and ignore the extensions config).
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers cosine_similarity into a session registry") {
    val registry = graftBridge.appliedFunctionRegistry(new GraftExtensions)
    assert(registry.functionExists(FunctionIdentifier("cosine_similarity")))
    val expr = registry.lookupFunction(FunctionIdentifier("cosine_similarity"),
      Seq(Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
        Literal.create(Array(2.0, 4.0), ArrayType(DoubleType))))
    val r = expr.eval(null).asInstanceOf[Double]
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("the whole SQL function catalog installs and runs through spark.sql") {
    val registry = graftBridge.appliedFunctionRegistry(new GraftExtensions)
    for (name <- Seq("cosine_similarity", "graft_dot", "graft_norm",
        "graft_tokens", "graft_shingles", "graft_chunks"))
      assert(registry.functionExists(FunctionIdentifier(name)), name)

    Graft.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_norm(array(3.0d, 4.0d)) AS n,
        |  size(graft_tokens('a b c')) AS t,
        |  graft_shingles('a b c d', 2) AS sh,
        |  graft_chunks('aaaaabbbbb', 5, 1) AS ch""".stripMargin).head()
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("n") == 5.0)
    assert(row.getAs[Int]("t") == 3)
    assert(row.getSeq[String](row.fieldIndex("sh")).toList == List("a b", "b c", "c d"))
    assert(row.getSeq[String](row.fieldIndex("ch")).head.length == 5)
    // shingle/chunk sizes must be constants — loud otherwise
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingles(t, size(graft_tokens(t))) FROM (SELECT 'a b' AS t)").head()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    // wrong arity is a named analysis error, not IndexOutOfBounds
    val a = intercept[Exception] {
      spark.sql("SELECT graft_chunks('abc', 5)").head()
    }
    assert(a.getMessage.contains("graft_chunks expects 3"), a.getMessage)
  }
}
