package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All L hyperplane-LSH bucket signatures of an `array<double>` vector
  * in ONE native expression: output element t is the sign-bit string of
  * the vector against table t's plane matrix ('1' iff dot >= 0, plane
  * order), i.e. exactly `concat_ws("", when(graft_dot(vec, lit(plane))
  * >= 0, "1").otherwise("0") ...)` per table — same dot accumulation
  * order, same sign rule, bit-identical buckets.
  *
  * Why an expression and not that composition: the composed form bakes
  * L x r plane LITERALS into the projection, so generated code grows
  * with the table count — at the bandsFor clamp (64 tables x 12 planes
  * x 64 dims) Janino fails outright with InternalCompilerException
  * (measured at 30x scale, SCALE.md). Here the flattened plane tensor
  * rides along as ONE codegen reference object and the generated code
  * is a fixed triple loop: plan size and bytecode are O(1) in L and r,
  * which is what lets `bandsFor`-scaled table counts actually run.
  *
  * Null semantics: NULL vector -> NULL (UnaryExpression default);
  * elements are assumed non-null (embedding vectors), matching
  * [[DotProduct]]. Vectors shorter than the plane dim contribute only
  * their elements (same `min(len)` rule as graft_dot).
  */
case class BandSignatures(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.head.nonEmpty && planes.head.head.nonEmpty,
    "BandSignatures needs at least one table with one non-empty plane")
  require(planes.forall(t => t.length == planes.head.length &&
      t.forall(_.length == planes.head.head.length)),
    "BandSignatures plane tensor must be rectangular (tables x planes x dim)")

  @transient private lazy val nTables = planes.length
  @transient private lazy val nPlanes = planes.head.length
  @transient private lazy val nDim = planes.head.head.length
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_sigs requires an array<double> argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_band_sigs"

  override def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val n = math.min(nDim, vec.numElements())
    val out = new Array[UTF8String](nTables)
    var off = 0
    var t = 0
    while (t < nTables) {
      val bits = new Array[Byte](nPlanes)
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        var i = 0
        while (i < n) { acc += vec.getDouble(i) * flat(off + i); i += 1 }
        off += nDim
        bits(p) = if (acc >= 0.0) '1' else '0'
        p += 1
      }
      out(t) = UTF8String.fromBytes(bits)
      t += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("bandPlanes", flat, "double[]")
      val arr = ctx.freshName("sigArr")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bits = ctx.freshName("bits")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$nTables];
         |int $n = java.lang.Math.min($nDim, $v.numElements());
         |int $off = 0;
         |for (int $t = 0; $t < $nTables; $t++) {
         |  byte[] $bits = new byte[$nPlanes];
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getDouble($i) * $flatRef[$off + $i];
         |    }
         |    $off += $nDim;
         |    $bits[$p] = ($acc >= 0.0) ? (byte) '1' : (byte) '0';
         |  }
         |  $arr[$t] = org.apache.spark.unsafe.types.UTF8String.fromBytes($bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandSignatures =
    copy(child = newChild)
}

object BandSignatures {
  /** DataFrame-API entry: per-table LSH bucket strings as a Column.
    * `planes(t)(p)(i)` = component i of plane p in table t. */
  def sigs(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(BandSignatures(Bridge.expression(vec), planes))
}
