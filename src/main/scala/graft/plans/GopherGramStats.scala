package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Gopher gram statistics over a token array: the
  * max occurrence-count × character-length "mass" of any word-n-gram
  * for n ∈ {2, 3, 4}, plus the DISTINCT word-5-gram count — the four
  * corpus-independent inputs of the Gopher repetition rules
  * (TextAnalysis.gopherMetricsOf).
  *
  * Replaces the HOF formulation (array_sort + run-length aggregate
  * per n — TextAnalysis.topGramMassHof, kept as the parity oracle):
  * interpreted lambdas cost ~ms per document (gopher_filter benched
  * 14 s at sf0.1), where this single imperative eval is O(L) hash-map
  * work per row — same narrow no-shuffle plan, three orders of
  * magnitude less per-row constant. HOF edge semantics preserved:
  * null tokens are skipped by the gram join exactly as concat_ws
  * skips them, empty grams are excluded from the distinct-5-gram set
  * (they cannot affect a max of count·length ≥ 0), and lengths count
  * unicode code points (UTF8String.numChars = Spark `length` =
  * DuckDB `length`). GopherExprSpec pins value-parity with the HOF
  * form on the real corpus and on adversarial token arrays.
  *
  * CODEGEN (r15): participates in whole-stage codegen via a generated
  * call into [[GopherGramStats.compute]] — the former CodegenFallback
  * re-evaluated the CHILD (the `split` building the token array)
  * through the interpreted path per row, boxing every token twice on
  * the curation path's hottest expression; now the child's tokens ride
  * the codegen'd projection and only the O(L) hash-map pass leaves
  * generated code.
  */
case class GopherGramStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("top2", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("top4", LongType, nullable = false),
    StructField("d5", LongType, nullable = false)))

  override def prettyName: String = "gopher_gram_stats"

  override def nullSafeEval(input: Any): Any =
    GopherGramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GopherGramStats$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherGramStats {

  private val Space = UTF8String.fromString(" ")

  /** The one-pass gram-stats body — shared by the interpreted eval and
    * the generated code (called per row from whole-stage codegen, so
    * it allocates only what the row's own gram maps need).
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](4)
    var g = 2
    while (g <= 4) {
      out(g - 2) = java.lang.Long.valueOf(topMass(toks, g))
      g += 1
    }
    out(3) = java.lang.Long.valueOf(distinct5(toks))
    new GenericInternalRow(out)
  }

  /** max over distinct n-grams of count(gram) · numChars(gram); 0 when
    * fewer than n tokens.
    */
  private def topMass(toks: Array[UTF8String], n: Int): Long = {
    if (toks.length < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      // concatWs skips null elements — the HOF's element_at/concat_ws
      // semantics for a null token
      val gram = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mass = e.getValue.toLong * e.getKey.numChars()
      if (mass > best) best = mass
    }
    best
  }

  /** distinct non-empty word-5-grams (array_distinct(filter(g ≠ ''))
    * of the HOF form).
    */
  private def distinct5(toks: Array[UTF8String]): Long = {
    val n = 5
    if (toks.length < n) return 0L
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val gram = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      if (gram.numChars() > 0) seen.add(gram)
      i += 1
    }
    seen.size().toLong
  }
}
