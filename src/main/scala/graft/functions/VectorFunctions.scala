package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as pure higher-order
  * function compositions (no UDFs — stays inside Catalyst, no
  * serialization boundary). Folds are sequential left-to-right so the
  * DuckDB oracle (list_sum/list_dot_product, also sequential)
  * reproduces results bit-for-bit before parity rounding.
  *
  * This is the Spark re-expression of the reference's FAISS surface:
  * normalized inner product == cosine (core/utils.py:126 normalize +
  * IndexFlatIP, embed_pdfs.py:227).
  */
object VectorFunctions {

  /** Cast array<float> to array<double> — all math happens in double. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity dot/(|a|·|b|) via the native codegen
    * expression (plans.CosineSimilarity — one fused loop), parity-
    * rounded to 4 decimals. Bit-identical to the HOF form
    * `dot(a,b)/(norm(a)*norm(b))`.
    */
  def cosine4(a: Column, b: Column): Column =
    Par.round4(graft.Graft.cosine_similarity(a, b))
}
