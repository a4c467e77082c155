package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Struct <-> binary codec over Spark's own UnsafeRow format — the
  * binary payload pack behind `asofJoinStream(payloadCodec = "binary")`.
  *
  * The JSON pack (`to_json`/`from_json`) is schema-evolution-tolerant
  * and version-portable but costs a measured 1.3-1.5x in the as-of
  * steady state (SCALE.md 30x study): every payload is string-rendered
  * on the way into state and re-parsed on the way out. This pair
  * instead serializes the struct with the SAME UnsafeProjection
  * machinery Tungsten uses for every shuffle row — one buffer write,
  * no text, no parse; unpack is an O(1) pointTo over the stored bytes.
  *
  * THE TRADE (why JSON stays the default): the bytes are Spark's
  * internal row layout. It has been stable across many releases, but
  * it is an INTERNAL format — a checkpoint holding binary payloads is
  * only guaranteed readable by the same Spark major version that wrote
  * it, and the fields are positional (renaming/reordering payload
  * columns between runs changes meaning silently where JSON would
  * null-fill by name). Use it for fixed-schema hot paths; resuming a
  * JSON-mode checkpoint in binary mode (or vice versa) fails LOUDLY at
  * query start — the state payload type flips string<->binary, which
  * the state store's schema compatibility check rejects.
  */
object StructCodec {

  /** `struct -> binary`: the struct's fields rendered as one UnsafeRow,
    * returned as freshly-owned bytes. The `.copy()` before getBytes is
    * LOAD-BEARING (review finding): the projection reuses its backing
    * buffer row to row, and Spark's `UnsafeRow.getBytes` returns that
    * buffer UN-copied whenever the array exactly spans sizeInBytes —
    * a payload-size-dependent coincidence (probed empirically: 48-byte
    * rows hit it on this build) — so a consumer retaining the array
    * across rows sees every buffered payload mutate to the last row's
    * bytes. Planned operators copy into their own UnsafeRows at the
    * next operator, which is why the shipped as-of pipeline never saw
    * it; a direct eval of this PUBLIC expression does (spec-pinned
    * with a proven-failing negative control). `copy()` allocates an
    * exact-size buffer, making the subsequent getBytes alias a FRESH
    * array — one allocation, zero extra copies. NULL in, NULL out. */
  case class StructPack(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StructType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_struct_pack requires a struct argument, got $t")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_struct_pack"

    @transient private lazy val proj =
      UnsafeProjection.create(child.dataType.asInstanceOf[StructType])

    override def nullSafeEval(v: Any): Any =
      proj(v.asInstanceOf[InternalRow]).copy().getBytes

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the projection is itself GENERATED code and not serializable, so
      // it must never ride the task as a reference object — ship the
      // schema (serializable) and build the projection once per
      // partition-task via lazily-initialized mutable state
      val schemaRef = ctx.addReferenceObj("packSchema",
        child.dataType.asInstanceOf[StructType], classOf[StructType].getName)
      val projTerm = ctx.addMutableState(
        classOf[UnsafeProjection].getName, "packProj",
        v => s"$v = org.apache.spark.sql.catalyst.expressions.UnsafeProjection$$.MODULE$$.create($schemaRef);")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $projTerm.apply($v).copy().getBytes();")
    }
    override protected def withNewChildInternal(newChild: Expression): StructPack =
      copy(child = newChild)
  }

  /** `binary -> struct(schema)`: wraps the stored bytes back into an
    * UnsafeRow of `schema.length` fields — no copy, no parse. The bytes
    * MUST have been produced by [[StructPack]] over the same positional
    * schema (the state round-trip guarantees this). NULL in, NULL out. */
  case class StructUnpack(child: Expression, schema: StructType)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_struct_unpack requires a binary argument, got $t")
    }
    override def dataType: DataType = schema
    override def prettyName: String = "graft_struct_unpack"

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[Array[Byte]]
      val row = new UnsafeRow(schema.length)
      row.pointTo(bytes, bytes.length)
      row
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ur = ctx.freshName("ur")
        s"""
           |org.apache.spark.sql.catalyst.expressions.UnsafeRow $ur =
           |  new org.apache.spark.sql.catalyst.expressions.UnsafeRow(${schema.length});
           |$ur.pointTo($v, $v.length);
           |${ev.value} = $ur;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): StructUnpack =
      copy(child = newChild)
  }

  def pack(structCol: Column): Column =
    Bridge.column(StructPack(Bridge.expression(structCol)))
  def unpack(bytesCol: Column, schema: StructType): Column =
    Bridge.column(StructUnpack(Bridge.expression(bytesCol), schema))
}
