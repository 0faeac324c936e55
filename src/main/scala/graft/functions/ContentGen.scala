package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Synthetic file-content builder as a native codegen Expression: the
 * generator's content loop (word chain keyed by a splitmix64 walk) with a
 * single StringBuilder instead of a per-step UTF8String concat fold — the
 * pure-Column `aggregate` formulation re-copies the whole accumulator every
 * step (O(words²) bytes) and measured 10× slower.
 *
 * The word list travels WITH the expression (serialized in the plan and
 * exposed to generated code via `addReferenceObj`), so executors in a real
 * cluster see it without any static-state distribution.
 */
case class ContentGen(left: Expression, right: Expression, contentWords: Int,
    words: Seq[String]) extends BinaryExpression {

  @transient private lazy val wordArr: Array[String] = words.toArray

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h2: Any, seq: Any): Any =
    ContentGen.build(h2.asInstanceOf[Long], seq.asInstanceOf[Long],
      contentWords, wordArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("graftWords", wordArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, (h2, seq) =>
      s"graft.functions.ContentGen.build($h2, $seq, $contentWords, $wordsRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContentGen =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_content_gen"
}

object ContentGen {

  def build(h2: Long, seq: Long, contentWords: Int,
            wl: Array[String]): UTF8String = {
    val sb = new java.lang.StringBuilder(contentWords * 7)
    var h = Mix64.mix(h2 ^ 0x57L)
    var i = 0
    while (i < contentWords) {
      if (i > 0) sb.append(if (i % 10 == 0) '\n' else ' ')
      sb.append(wl(((h >>> 13) % wl.length).toInt))
      h = Mix64.mix(h)
      i += 1
    }
    sb.append(" // seq=").append(seq)
    UTF8String.fromString(sb.toString)
  }

  def contentGen(h2: Column, seq: Column, contentWords: Int,
                 words: Seq[String]): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    column(ContentGen(expression(h2), expression(seq), contentWords, words))
  }
}
