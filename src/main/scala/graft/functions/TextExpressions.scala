package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-canonicalization expressions (SURVEY.md §2C tokenize/
  * normalize). Spark ships no Unicode-normalization builtin, and scraped
  * corpora mix precomposed and combining-mark spellings of the same grapheme
  * — exact dedup, shingling and vocabulary build all fracture on the
  * distinction unless ingestion canonicalizes first. NFC is the W3C/WHATWG
  * interchange form; DuckDB's `nfc_normalize` is the oracle twin.
  *
  * Stays inside whole-stage codegen: the generated code calls the static
  * [[TextExpressions.nfcImpl]] forwarder directly — no UDF wrapping, no
  * serialization boundary, null-safety from `nullSafeCodeGen`. The JDK and
  * ICU (DuckDB) implement the same Unicode normalization algorithm; NFC
  * results agree on any assigned codepoint.
  */
object TextExpressions {

  /** NFC-normalize a UTF8String. Fast path: `Normalizer.isNormalized` is a
    * cheap scan (true for pure-ASCII and already-composed text — the
    * overwhelming majority of real corpus rows) that skips the decompose/
    * recompose machinery and the UTF-16 round-trip allocation. Called from
    * generated code via the object's static forwarder. */
  def nfcImpl(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** `graft_nfc(string)` → NFC-normalized string. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"

    override def nullSafeEval(input: Any): Any =
      nfcImpl(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExpressions.nfcImpl($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: NFC normalization. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
