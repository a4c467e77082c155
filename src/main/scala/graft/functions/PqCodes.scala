package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ encoder: the m per-subspace codes of one vector against a
  * driver-held codebook tensor (m x ksub x dsub) in ONE expression —
  * code s = the 0-based index of subspace s's nearest centroid
  * (squared L2 over the vector's s-th slice; EXACT tie to the lowest
  * cid), i.e. [[graft.datax.Similarity]]'s `codesArray` rule.
  *
  * Replaces the interpreted composition (per subspace:
  * `array_position(dists, array_min(dists)) - 1` over an `array(...)`
  * of `aggregate(zip_with(slice(vec, ...), lit(c), ...), 0.0, +)`
  * folds): per row that form pays m * ksub * dsub interpreted lambda
  * evaluations plus m * (ksub + 2) array allocations; this expression
  * is one codegen'd triple loop with a single m-slot output array.
  *
  * BIT-EXACTNESS (the composed form's semantics, reproduced exactly):
  *  - Per (sub, center): the ascending left fold `acc += (x-y)*(x-y)`
  *    over the slice — identical doubles in identical order.
  *  - `slice(vec, s*dsub+1, dsub)` truncates at the vector's end;
  *    zip_with then pads the shorter side with nulls and the fold
  *    poisons — so a slice shorter than the center (ragged vector), a
  *    center shorter/longer than the slice (ragged codebook), or a
  *    null element in the slice yields a NULL distance.
  *  - The min scan is array_min's total order (NaN greater than any
  *    non-NaN, -0.0 ties +0.0, nulls skipped); the code is
  *    array_position's FIRST index equivalent to that min (NaN equiv
  *    NaN, -0.0 equiv +0.0) — one first-strict-min scan produces both.
  *  - All distances of a subspace NULL (ragged/short/null-element
  *    vector, or an empty center list) -> that CODE is null.
  *  - NULL vector -> every code null; the OUTPUT ARRAY itself is never
  *    null (the composed form built `array(...)` of m null codes).
  */
case class PqCodes(child: Expression, book: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(book.nonEmpty && book.head.nonEmpty && book.head.head.nonEmpty,
    "PqCodes needs a non-empty codebook (m >= 1 subspaces, ksub >= 1 " +
      "centers, dsub >= 1 dims)")

  @transient private lazy val m = book.length
  /** The slice width — the composed form's `dsub = book.head.head.length`. */
  @transient private lazy val dsub = book.head.head.length
  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    book.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes requires an array<double> argument, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_codes"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Any](m)) // m null codes
    else new GenericArrayData(
      PqCodes.encode(v.asInstanceOf[ArrayData], bookArr, dsub))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bookRef = ctx.addReferenceObj("pqBook", bookArr, "double[][][]")
    val cls = classOf[PqCodes].getName + "$.MODULE$"
    val out = ctx.freshName("codes")
    val code =
      code"""
${childGen.code}
Object[] $out;
if (${childGen.isNull}) {
  $out = new Object[$m];
} else {
  $out = $cls.encode(${childGen.value}, $bookRef, $dsub);
}
org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
"""
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** DataFrame-API entry: the m PQ codes as one `array<int>` Column.
    * `book(s)(j)` = center j (cid-ascending) of subspace s. */
  def codes(vec: Column, book: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqCodes(Bridge.expression(vec), book))

  /** The shared encode loop — called from BOTH eval paths (generated
    * code references the companion as `PqCodes$.MODULE$`, the AdcLookup
    * pattern). One first-strict-min scan per subspace reproduces
    * array_min + array_position's first-equivalent-index composition.
    * Kept on the companion rather than inlined into generated Java:
    * the loop is allocation-free and JIT-compiles identically, and one
    * body cannot drift from its fallback twin. */
  def encode(vec: ArrayData, book: Array[Array[Array[Double]]],
             dsub: Int): Array[Any] = {
    val dim = vec.numElements()
    val m = book.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val start = s * dsub
      // slice length after end-truncation (the slice(...) semantics);
      // a distance is non-null only when the center's length equals it
      val slLen = math.max(0, math.min(dsub, dim - start))
      var sliceHasNull = false
      var i = 0
      while (i < slLen && !sliceHasNull) {
        if (vec.isNullAt(start + i)) sliceHasNull = true
        i += 1
      }
      val centers = book(s)
      var bestIx = -1
      var best = 0.0
      var j = 0
      while (j < centers.length) {
        val cv = centers(j)
        if (!sliceHasNull && cv.length == slLen) {
          var acc = 0.0
          i = 0
          while (i < slLen) {
            val d = vec.getDouble(start + i) - cv(i)
            acc += d * d
            i += 1
          }
          val lt =
            if (bestIx < 0) true
            else if (java.lang.Double.isNaN(acc)) false
            else java.lang.Double.isNaN(best) || acc < best
          if (lt) { best = acc; bestIx = j }
        }
        j += 1
      }
      out(s) = if (bestIx < 0) null else java.lang.Integer.valueOf(bestIx)
      s += 1
    }
    out
  }
}
