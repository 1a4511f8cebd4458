package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid id for a vector: argmax over an embedded centroid
  * table of `vec_dot(v, c_j) / nrm`, ties to the smaller cluster id,
  * under Spark's double ordering (NaN greatest, -0.0 == 0.0) — so
  * assignments are bit-identical to the relational max_by formulation
  * and to the literal-array path in [[graft.ops.Similarity]].
  *
  * The centroid table is part of the expression, not a child: a
  * row-major flattened centroid array plus the cluster-id map, shipped
  * to generated code as codegen reference objects (primitive arrays).
  * The generated method is a two-level primitive loop over k×dims — no
  * per-row allocation, no struct-array materialization, O(1)
  * generated-code size in k, fully inside whole-stage codegen at ANY k.
  * (The equivalent `transform`/`array_max` HOF formulation is
  * CodegenFallback in Spark: interpreted per row, allocating a
  * k-element struct array.) Fields are IndexedSeq, not raw arrays, so
  * expression equality stays structural (CSE / exchange reuse /
  * canonicalized-plan comparisons recognize identical assignments).
  *
  * The vector child may be array<double> or array<float> (reads
  * branch on the element type, like [[VecDot]]).
  *
  * SQL surface: `centroid_assign(v, nrm, cids_lit, cvecs_lit)` — the two
  * trailing arguments must be foldable array literals (the registry
  * builder evaluates them once at resolution and embeds the extracted
  * tables; they are NOT children of the resolved expression). Normal
  * construction goes through
  * [[graft.ops.Similarity.clusterAssignment]].
  */
case class CentroidAssign(left: Expression, right: Expression,
    cids: IndexedSeq[Int], cvecs: IndexedSeq[Double], dims: Int)
    extends BinaryExpression {
  require(cids.length * dims == cvecs.length,
    "centroid_assign: cvecs must be k*dims row-major")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_assign"

  private def isFloatVec: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cidsArr: Array[Int] = cids.toArray
  @transient private lazy val cvecsArr: Array[Double] = cvecs.toArray

  /** Spark double ordering "a > b": NaN counts greater than everything
    * and equal to itself; -0.0 ties 0.0 (ties keep the earlier, i.e.
    * smaller, cluster id — cids are scanned in ascending order). */
  @inline private def gtSpark(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else if (java.lang.Double.isNaN(b)) false
    else a > b

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val fv = isFloatVec
    val ci = cidsArr
    val cv = cvecsArr
    val m = math.min(dims, v.numElements())
    var best = 0.0
    var bestC = 0
    var first = true
    var j = 0
    while (j < ci.length) {
      var acc = 0.0
      val off = j * dims
      var i = 0
      while (i < m) {
        val x = if (fv) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * cv(off + i)
        i += 1
      }
      val s = acc / nrm
      if (first || gtSpark(s, best)) { best = s; bestC = ci(j); first = false }
      j += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val cidsRef = ctx.addReferenceObj("cids", cidsArr, "int[]")
      val cvecsRef = ctx.addReferenceObj("cvecs", cvecsArr, "double[]")
      val getV = if (isFloatVec) "getFloat" else "getDouble"
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val gt = ctx.freshName("gt")
      s"""
         |int $m = java.lang.Math.min($dims, $v.numElements());
         |double $best = 0.0;
         |int $bestC = 0;
         |boolean $first = true;
         |for (int $j = 0; $j < $cidsRef.length; $j++) {
         |  double $acc = 0.0;
         |  int $off = $j * $dims;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += (double) $v.$getV($i) * $cvecsRef[$off + $i];
         |  }
         |  double $s = $acc / $nrm;
         |  boolean $gt = java.lang.Double.isNaN($s)
         |    ? !java.lang.Double.isNaN($best)
         |    : (java.lang.Double.isNaN($best) ? false : $s > $best);
         |  if ($first || $gt) { $best = $s; $bestC = $cidsRef[$j]; $first = false; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidAssign =
    copy(left = newLeft, right = newRight)
}

object CentroidAssign {
  /** Registry builder: evaluates the foldable cids/cvecs array-literal
    * arguments once and embeds the extracted centroid table. */
  def fromArgs(es: Seq[Expression]): CentroidAssign = {
    val cids = es(2).eval().asInstanceOf[ArrayData].toIntArray().toIndexedSeq
    val cvecs = es(3).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq
    val dims = if (cids.isEmpty) 0 else cvecs.length / cids.length
    CentroidAssign(es(0), es(1), cids, cvecs, dims)
  }
}
