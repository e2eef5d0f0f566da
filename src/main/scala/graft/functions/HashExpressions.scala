package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-row kernels.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback — every lambda application is an interpreted
  * expression eval. For kernels that touch every array element × every
  * hash index (minhash: |shingles| × numHashes evals) that interpreter
  * overhead dominates by >10×. These expressions keep the DataFrame
  * declarative surface but run one tight JVM loop per row: the
  * interpreted dispatch happens once per row, not once per element.
  */
object HashExpressions {

  /** MinHash signature of an array<string> shingle set: element i is
    * min over shingles of xxhash64(xxhash64(shingle), seed=i). Same
    * family as the HOF formulation in spirit; one string hash per
    * shingle, then numHashes cheap long-mixes. */
  case class MinHash64(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < numHashes) {
          val g = XXH64.hashLong(h, j.toLong)
          if (g < sig(j)) sig(j) = g
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHash64 = copy(child = c)
    override def prettyName: String = "minhash64"
  }

  /** 64-bit SimHash of an array<string> token stream: bit k of the
    * result is the sign of Σ_tokens (±1 by bit k of xxhash64(token)). */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
        i += 1
      }
      var sig = 0L
      var k = 0
      while (k < 64) {
        if (counts(k) > 0) sig |= (1L << k)
        k += 1
      }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Dot product of two array<double> columns — one fused loop. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  // Column wrappers (Spark 4 classic API: Column no longer wraps a
  // catalyst Expression directly — see GraftBridge)
  import GraftBridge.{column, expression}
  def minhash64(shingles: Column, numHashes: Int): Column =
    column(MinHash64(expression(shingles), numHashes))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def vec_dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))
}
