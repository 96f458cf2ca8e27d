package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native kernels of the BINARY (1-bit) embedding family — the extreme
  * point of the quantization matrix (float32 → int8 → 1 bit): pack each
  * vector's coordinate SIGNS into 64-bit words once, then compare
  * vectors with xor + popcount. Per-pair cost drops from `dim` float
  * ops to `dim/64` word ops, and the packed corpus is 32× smaller than
  * float32 at rest and on the wire — the bandwidth lever that makes a
  * first-stage scan of a 100 TB embedding corpus feasible on commodity
  * I/O. Sign-bit Hamming distance is a monotone proxy for angular
  * distance (Charikar 2002: P[sign mismatch] = θ/π per hyperplane —
  * here the coordinate axes), so a Hamming shortlist + exact rerank is
  * the standard binary-embedding retrieval recipe.
  */

/** Pack coordinate signs into ceil(dim/64) longs: word w bit j is set
  * iff v[w·64+j] > 0 (strict — zero packs as 0, and NaN packs as 0
  * too: the Java compare is false for NaN, a corrupt coordinate must
  * not become a phantom positive sign). Null array or null element →
  * null (the [[VectorBinaryExpression]] contract). Matches the
  * declarative HOF twin bit-for-bit (parity-tested incl. the NaN,
  * empty, and null-element edges). */
case class SignPack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_sign_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = elemType match {
        case FloatType => a.getFloat(i).toDouble
        case _ => a.getDouble(i)
      }
      if (v > 0) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(words.toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |final long[] $words = new long[($n + 63) / 64];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  if (${get(a, i)} > 0) $words[$i / 64] |= (1L << ($i % 64));
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($words); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two [[SignPack]] word arrays:
  * Σ popcount(a[i] xor b[i]). Null array or length mismatch → null.
  * Long output (the shortlist negates it into a score). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |boolean $bad = ($n != $b.numElements());
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
