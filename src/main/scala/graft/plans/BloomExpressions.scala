package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(key)` — membership probe of a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] compiled into the plan.
  *
  * This is the executor half of the broadcast-bloom semi-join reduction
  * (see [[graft.operators.BloomPrune]]): the dim side's join keys are
  * folded into a bloom filter once, and the fact side drops rows that
  * cannot possibly join BEFORE the shuffle. False positives survive the
  * probe and are removed by the exact join that follows, so the rewrite
  * never changes results — only the number of rows that cross the wire.
  *
  * Design notes for scale:
  *  - The filter bytes are held as a plain constructor field, NOT as a
  *    child `Literal` — a megabyte binary literal would bloat every
  *    `explain` string and constant-fold pass. `toString` stays O(1).
  *  - The deserialized filter rides the generated code's references
  *    array (one copy per task closure, shipped with the stage — the
  *    same transport Spark's own injected runtime bloom filters use).
  *  - Codegen emits a single `mightContainLong` call inside the
  *    surrounding WholeStageCodegen loop — no UDF boundary, no boxing.
  */
case class BloomKeyMightContain(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a bigint key, got ${child.dataType.catalogString}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomKeyMightContain {
  /** Registry builder: `graft_bloom_might_contain(bytesLiteral, key)`.
    * The bytes argument must be foldable; it is evaluated ONCE here at
    * analysis time and stored as a plain field, so the (potentially
    * megabyte) filter never appears as a literal child in the resolved
    * plan — `explain` stays readable and constant-folding never rehashes
    * it. */
  def fromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_bloom_might_contain expects (bytes, key), got ${args.length} args")
    require(args.head.foldable,
      "graft_bloom_might_contain: filter bytes must be a foldable binary literal")
    BloomKeyMightContain(args.head.eval().asInstanceOf[Array[Byte]], args(1))
  }
}
