package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic pseudo-random hyperplane weights for LSH, shared by
  * the Column API ([[graft.similarity.Similarity.planeWeight]]
  * delegates here) and the native [[HyperplaneBuckets]] kernel so
  * both produce identical buckets.
  */
object LshPlanes {
  /** Weight for (plane, dim) in [-0.5, 0.5), reproducible anywhere. */
  def planeWeight(plane: Int, dim: Int, dims: Int): Double =
    ((plane.toLong * dims + dim + 1) * 2654435761L % TextHash.P).toDouble /
      TextHash.P - 0.5
}

/** All `tables` hyperplane-LSH bucket ids of one vector in a single
  * native kernel: table t's bucket is the sign-bit word of planes
  * [t·planes, (t+1)·planes) — bit p set iff vec · w(t·planes+p) ≥ 0,
  * identical to the per-plane Column composition
  * (sum of when(VecDot ≥ 0, 2^p)).
  *
  * Why an expression and not 80 composed VecDots: at 8 tables × 10
  * planes the composed form generates a projection past Spark's
  * huge-method codegen limit, and the whole stage silently falls
  * back to interpreted evaluation — measured 8–9 s for 20k rows vs
  * ~0.3 s for this kernel. The weight matrix is materialized once
  * per executor as a flat primitive double[] (lazy, derived from the
  * deterministic [[LshPlanes.planeWeight]] formula — nothing is
  * serialized), and the kernel runs as compiled Scala behind a
  * reference object so the surrounding stage keeps whole-stage
  * codegen (the [[WordGramHashes]] pattern). Float elements are
  * widened per element, same as [[VecDot]].
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
    dims: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 62, s"planes 1..62, got $planes")
  require(tables >= 1, s"tables >= 1, got $tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](tables * planes * dims)
    var p = 0
    while (p < tables * planes) {
      var i = 0
      while (i < dims) {
        w(p * dims + i) = LshPlanes.planeWeight(p, i, dims)
        i += 1
      }
      p += 1
    }
    w
  }

  def compute(v: ArrayData): GenericArrayData = {
    val isF = elemIsFloat
    val w = weights
    val n = math.min(v.numElements(), dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < planes) {
        val off = (t * planes + p) * dims
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
          acc += x * w(off + i)
          i += 1
        }
        if (acc >= 0) b |= 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBuckets", this,
      classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}
