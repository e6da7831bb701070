package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization — the canonical
  * text-cleaning step a multilingual corpus pipeline runs before hashing,
  * dedup, or tokenization (decomposed `e`+U+0301 and precomposed `é` must
  * fingerprint identically, or near-dup recall silently drops on any
  * non-ASCII corpus).
  *
  * Spark ships no normalization function; a Scala UDF would serialize to
  * an opaque non-codegen black box. This compiles into the generated
  * stage via the standard null-safe wrapper around
  * `java.text.Normalizer` (ICU-equivalent for the NFC/NFD forms per the
  * Unicode spec), staying inside WholeStageCodegen like any built-in.
  * DuckDB's `nfc_normalize` computes the identical form — the q78 oracle
  * hash-compares the two engines byte-for-byte over md5.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  // analysis-time type error on a non-string child (the standard contract
  // of every built-in string expression), not a codegen/cast failure
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.sql}")

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point over a string column. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
