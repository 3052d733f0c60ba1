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
}
