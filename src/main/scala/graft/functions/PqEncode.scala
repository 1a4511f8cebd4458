package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder: splits a vector into `m` contiguous
  * subspaces of `subDims` components each and emits, per subspace, the
  * GLOBAL id (`s * k + j`) of the L2-nearest codebook entry — so the
  * output `array<int>` of length `m` indexes a flattened per-query
  * lookup table directly (see [[GatherSum]]) and the in-subspace code is
  * recoverable as `code - s * k`.
  *
  * The codebook is part of the expression, not a child (same design as
  * [[CentroidAssign]]): a row-major flattened array of
  * `m * k * subDims` doubles shipped to generated code as a codegen
  * reference object. The generated method is a three-level primitive
  * loop — no per-row allocation besides the m-int result, O(1)
  * generated-code size in m and k, fully inside whole-stage codegen at
  * any codebook size. Argmin ties break toward the smaller code id;
  * a NaN distance (NaN vector component) is never chosen unless every
  * candidate is NaN (Spark double ordering: NaN greatest).
  *
  * The vector child may be array<double> or array<float>. Components
  * beyond `v.length` are treated as 0 (codebook entries trained on
  * full-width vectors never meet short rows in practice; the guard just
  * keeps the kernel total).
  *
  * SQL surface: `pq_encode(v, codebook_lit, m, k)` — trailing arguments
  * must be foldable (evaluated once at resolution, embedded). Normal
  * construction goes through [[graft.ops.Similarity.pqIndex]].
  */
case class PqEncode(child: Expression, codebook: IndexedSeq[Double],
    m: Int, k: Int) extends UnaryExpression {
  require(m > 0 && k > 0 && codebook.length % (m * k) == 0,
    s"pq_encode: codebook length ${codebook.length} must be m*k*subDims")

  private val subDims: Int = codebook.length / (m * k)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloatVec: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  /** Spark double ordering "a < b" (NaN greatest, so a NaN distance only
    * wins when the incumbent is NaN too). */
  @inline private def ltSpark(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(b)) !java.lang.Double.isNaN(a)
    else if (java.lang.Double.isNaN(a)) false
    else a < b

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fv = isFloatVec
    val cb = cbArr
    val n = v.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0.0
      var bestJ = 0
      var first = true
      var j = 0
      while (j < k) {
        var acc = 0.0
        val off = (s * k + j) * subDims
        var i = 0
        while (i < subDims) {
          val di = s * subDims + i
          val x =
            if (di >= n) 0.0
            else if (fv) v.getFloat(di).toDouble
            else v.getDouble(di)
          val d = x - cb(off + i)
          acc += d * d
          i += 1
        }
        if (first || ltSpark(acc, best)) { best = acc; bestJ = j; first = false }
        j += 1
      }
      out(s) = s * k + bestJ
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("codebook", cbArr, "double[]")
      val getV = if (isFloatVec) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val di = ctx.freshName("di")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val first = ctx.freshName("first")
      val lt = ctx.freshName("lt")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = 0.0;
         |  int $bestJ = 0;
         |  boolean $first = true;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $acc = 0.0;
         |    int $off = ($s * $k + $j) * $subDims;
         |    for (int $i = 0; $i < $subDims; $i++) {
         |      int $di = $s * $subDims + $i;
         |      double $x = $di >= $n ? 0.0 : (double) $v.$getV($di);
         |      double $d = $x - $cbRef[$off + $i];
         |      $acc += $d * $d;
         |    }
         |    boolean $lt = java.lang.Double.isNaN($best)
         |      ? !java.lang.Double.isNaN($acc)
         |      : (java.lang.Double.isNaN($acc) ? false : $acc < $best);
         |    if ($first || $lt) { $best = $acc; $bestJ = $j; $first = false; }
         |  }
         |  $out[$s] = $s * $k + $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Registry builder: evaluates the foldable codebook/m/k arguments once
    * and embeds the extracted table. */
  def fromArgs(es: Seq[Expression]): PqEncode = {
    val cb = es(1).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq
    val m = es(2).eval().asInstanceOf[Number].intValue()
    val k = es(3).eval().asInstanceOf[Number].intValue()
    PqEncode(es(0), cb, m, k)
  }
}
