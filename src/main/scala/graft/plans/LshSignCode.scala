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
  * spec-proven (CosineExprSpec): same left-to-right double
  * accumulation; a vector longer than the plane table fails loudly,
  * matching the HOF form's raise_error guard.
  *
  * (reference: embed_pdfs.py:227 builds a flat FAISS index; the sign
  * code is this library's bucketing scale path for it.)
  */
case class LshSignCode(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  // Seq is covariant — Seq[ArrayType] satisfies the inputTypes
  // contract without naming the private[sql] AbstractDataType
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def prettyName: String = "lsh_sign_code"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > planes(0).length) throw new IllegalArgumentException(
      s"$prettyName supports at most ${planes(0).length} dims, got $n")
    var code = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += x.getDouble(d) * p(d); d += 1 }
      if (dot > 0) code |= (1L << i)
      i += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      s"""
         |int $n = $x.numElements();
         |if ($n > $planesRef[0].length) {
         |  throw new IllegalArgumentException(
         |    "lsh_sign_code supports at most " + $planesRef[0].length + " dims, got " + $n);
         |}
         |long $code = 0L;
         |for (int $i = 0; $i < $planesRef.length; $i++) {
         |  double[] $p = $planesRef[$i];
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) { $dot += $x.getDouble($d) * $p[$d]; }
         |  if ($dot > 0) $code |= (1L << $i);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
