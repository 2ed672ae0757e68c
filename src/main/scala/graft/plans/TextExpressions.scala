package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass expressions for the near-dup signatures.
  *
  * The composed-Column forms (64 filter/size passes for SimHash, k
  * array_min/transform passes for MinHash) re-walk the token/shingle
  * array once per output slot — measured 21.5 s / 7.6 s on the sf0.1
  * bench. These expressions compute the same signatures in ONE pass
  * inside whole-stage codegen; at 100 TB the signature step is
  * fact-side map work, so per-row constant factors dominate the bill.
  */
object SimHashHelper {
  /** splitmix64 of a token's chars — stateless, allocation-free. */
  def tokenHash(s: String, from: Int, until: Int): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = from
    while (i < until) {
      h = (h ^ s.charAt(i).toLong) * 0xBF58476D1CE4E5B9L
      i += 1
    }
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** One-pass 64-bit SimHash over whitespace tokens of the lowercased
    * text: bit i set when the majority of token hashes carry bit i.
    */
  def eval(u: UTF8String): Long = {
    val s = u.toString.toLowerCase
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val h = tokenHash(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        n += 1
      }
    }
    if (n == 0) return 0L
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

case class SimHash64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(v: Any): Any =
    SimHashHelper.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashHelper$$.MODULE$$.eval($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashHelper {
  /** One-pass k-slot minhash over a long-array of shingles. */
  def eval(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getLong(i)
      var j = 0
      while (j < k) {
        var z = s ^ (j * 0x9E3779B97F4A7C15L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        if (z < mins(j)) mins(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigExpression(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    MinHashHelper.eval(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashHelper$$.MODULE$$.eval($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registry-based Column API (same pattern as GraftFunctions.pStart —
  * Column->Expression construction is not public in Spark 4).
  */
object TextExprs {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expression(exprs.head), "internal")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSigExpression(exprs.head,
        exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }), "internal")
  }

  def simhash64(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("simhash64", c)
  }
  def minhashSig(spark: SparkSession, c: Column, k: Int): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
