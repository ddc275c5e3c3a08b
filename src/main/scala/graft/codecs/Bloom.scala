package graft.codecs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(s)` against a FIXED Bloom filter baked into
  * the expression (the membership analogue of [[ArgMaxCosM]]'s baked
  * centroid matrix): true iff the string is possibly in the set the
  * filter was built over — never a false negative, false positives at
  * the filter's configured fpp. The filter bytes ride the plan into
  * every task (same mechanism Spark uses for its own runtime
  * row-group bloom pushdown), are deserialized once per executor via
  * the transient lazy, and each probe hashes the string's UTF-8 bytes
  * directly — no String materialization on the hot path.
  *
  * Built for prefilters: admit probable members at scan speed BEFORE
  * an exchange, then let an exact join decide. The overall operator
  * stays exact; the bloom only shrinks what the shuffle carries.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(filterBytes.nonEmpty, "empty bloom filter payload")

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects string, got $other")
    }

  def compute(s: UTF8String): Boolean =
    // putString hashes the UTF-8 bytes, so probing the raw bytes is
    // putString-compatible without building a java.lang.String
    bf.mightContainBinary(s.getBytes)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"

  // Array[Byte] equality is reference identity, which would make two
  // plans over the same serialized filter structurally unequal and
  // cost Catalyst canonicalization (subexpression elimination,
  // ReusedExchange). Compare payload bytes by value.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  // planning calls hashCode repeatedly (ExpressionSet, subexpression
  // elimination); the payload is MBs for a large benchmark — hash it
  // once, not per call
  @transient private lazy val payloadHash: Int =
    java.util.Arrays.hashCode(filterBytes)
  override def hashCode(): Int = 31 * child.hashCode() + payloadHash
}

object BloomBytes {
  /** Serialize a Spark BloomFilter to the byte payload
    * [[BloomMightContain]] carries. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
