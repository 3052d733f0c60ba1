package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane sign code over an `array<double>` vector:
  * bit i = sign of ⟨emb, planes(i)⟩, all planes in ONE fused loop.
  *
  * Replaces the HOF formulation (`aggregate(zip_with(emb, plane))`
  * per plane — VectorSearch.lshCodeHof), which evaluates interpreted
  * lambdas per element per plane: 6 planes × dims closures per row
  * in the index-build path. Bit-parity with the HOF form is
  * spec-proven (CosineExprSpec) and includes its edge semantics:
  * same left-to-right double accumulation; a NaN dot sets the bit
  * (Spark's `>` ranks NaN above every value); a null element zeroes
  * the whole code (the HOF's null-propagated dots cleared every
  * bit); a vector longer than the plane table fails loudly.
  *
  * `planes` is a Seq-of-Seq so the case class keeps content-based
  * equality (an Array parameter would defeat semanticEquals /
  * common-subexpression elimination and render as an identity hash
  * in plan strings).
  *
  * (reference: embed_pdfs.py:227 builds a flat FAISS index; the sign
  * code is this library's bucketing scale path for it.)
  */
case class LshSignCode(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  // construction-time validation: an empty or ragged plane table
  // would otherwise surface as an IndexOutOfBounds mid-loop at eval
  // time (or inside generated code)
  require(planes.nonEmpty, "lsh_sign_code needs at least one plane")
  require(planes.forall(_.length == planes.head.length),
    "lsh_sign_code planes must all have the same length")

  // Seq is covariant — Seq[ArrayType] satisfies the inputTypes
  // contract without naming the private[sql] AbstractDataType
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def prettyName: String = "lsh_sign_code"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > planeArr(0).length) throw new IllegalArgumentException(
      s"$prettyName supports at most ${planeArr(0).length} dims, got $n")
    var d = 0
    while (d < n) {   // a null element nulls every HOF dot → code 0
      if (x.isNullAt(d)) return 0L
      d += 1
    }
    var code = 0L
    var i = 0
    while (i < planeArr.length) {
      val p = planeArr(i)
      var dot = 0.0
      d = 0
      while (d < n) { dot += x.getDouble(d) * p(d); d += 1 }
      // NaN sets the bit: Spark's GreaterThan ranks NaN above all
      if (dot > 0 || java.lang.Double.isNaN(dot)) code |= (1L << i)
      i += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $x.numElements();
         |if ($n > $planesRef[0].length) {
         |  throw new IllegalArgumentException(
         |    "lsh_sign_code supports at most " + $planesRef[0].length + " dims, got " + $n);
         |}
         |boolean $hasNull = false;
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($x.isNullAt($d)) { $hasNull = true; break; }
         |}
         |long $code = 0L;
         |if (!$hasNull) {
         |  for (int $i = 0; $i < $planesRef.length; $i++) {
         |    double[] $p = $planesRef[$i];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) { $dot += $x.getDouble($d) * $p[$d]; }
         |    if ($dot > 0 || java.lang.Double.isNaN($dot)) $code |= (1L << $i);
         |  }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
