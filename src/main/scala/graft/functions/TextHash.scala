package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshims.SparkShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text hashing shared with the DuckDB oracles
  * (SURVEY §5): base-31 polynomial over Unicode code points,
  * modulo P = 1e9+7. Iterating code points (not UTF-16 units)
  * matches SQL engines' character semantics (`unicode(substr(s,i,1))`
  * in DuckDB) for the full Unicode range including astral chars.
  * Code points < 2^21 and h < 2^30, so every intermediate product
  * fits a signed 64-bit long — the same arithmetic is expressible in
  * portable SQL (list_reduce / list_transform), which is what makes
  * hash-based operators oracle-checkable.
  *
  * Implemented as native Catalyst expressions (not UDFs): no
  * serialization boundary, null handling in the expression layer,
  * and [[PolyHash]] participates in whole-stage codegen.
  */
object TextHash {
  val P: Long = 1000000007L

  def polyHashStr(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Rolling k-codepoint shingle hashes: O(n) for all shingles. */
  def shingleHashesStr(s: String, k: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.empty
    var pow = 1L // 31^(k-1) mod P
    var i = 1
    while (i < k) { pow = pow * 31 % P; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + cps(i)) % P; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = ((h - cps(i - 1) * pow % P + P) % P * 31 + cps(i + k - 1)) % P
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash permutation constants, reproducible in SQL:
    * a_j = (j+1)·2654435761 mod P,  b_j = (j+1)·40503 mod P.
    */
  def minA(j: Int): Long = (j + 1) * 2654435761L % P
  def minB(j: Int): Long = (j + 1) * 40503L % P

  // Column API --------------------------------------------------------

  private def expr(c: Column): Expression = SparkShims.expression(c)

  def poly_hash(c: Column): Column =
    SparkShims.column(PolyHash(expr(c)))

  def shingle_hashes(c: Column, k: Int): Column =
    SparkShims.column(ShingleHashes(expr(c), k))

  def minhash_sig(hashes: Column, numPerms: Int): Column =
    SparkShims.column(MinHashSig(expr(hashes), numPerms))

  def simhash(hashes: Column, bits: Int): Column =
    SparkShims.column(SimHash(expr(hashes), bits))

  def word_gram_hashes(text: Column, n: Int, distinct: Boolean): Column =
    SparkShims.column(WordGramHashes(expr(text), n, distinct))

  /** |a ∩ b| for two SORTED distinct long arrays — see
    * [[SortedIntersectCount]].
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    SparkShims.column(SortedIntersectCount(expr(a), expr(b)))

  /** CDC chunk summaries from text — see [[CdcChunkRows]]. */
  def cdc_chunk_rows(text: Column, divisor: Int): Column =
    SparkShims.column(CdcChunkRows(expr(text), divisor))

  /** Winnowing window-min fingerprints — see [[WinnowPrints]]. */
  def winnow_prints(grams: Column, window: Int): Column =
    SparkShims.column(WinnowPrints(expr(grams), window))

  /** Word-token poly hashes of lower(trim(text)) split on \s+ —
    * the single-pass twin of
    * transform(split(trim(lower(text)), "\\s+"), poly_hash).
    */
  def wordGramHashesStr(text: String, n: Int, distinct: Boolean): Array[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val th = toks.map(polyHashStr)
    if (th.length < n) return Array.empty
    val grams = new Array[Long](th.length - n + 1)
    var i = 0
    while (i <= th.length - n) {
      var g = th(i)
      var j = 1
      while (j < n) { g = (g * 31 + th(i + j)) % P; j += 1 }
      grams(i) = g
      i += 1
    }
    if (distinct) grams.distinct else grams
  }
}

/** Sequential-fold dot product of two numeric arrays: identical
  * arithmetic to aggregate(zip_with(a, b, _*_), 0.0, _+_) — i.e. a
  * left fold, reproducible on any engine — in one native pass.
  * Full doGenCode (primitive loop): stays inside whole-stage codegen
  * on the d9/d10/d17/d19 hot paths.
  *
  * Float arrays are consumed directly, each element widened to
  * double inside the loop — the IEEE-exact same value the
  * transform(v, x -> cast(x as double)) pre-pass produces, without
  * paying that pre-pass: ArrayTransform is a codegen-fallback
  * higher-order function, and projection collapse inlines it into
  * EVERY consuming expression, so e.g. hashing one vector against 80
  * LSH planes re-ran the interpreted per-element lambda 80× per row
  * (measured 8–9 s for 20k rows; native float access is ~40×
  * faster). The element accessor is chosen per side at plan time
  * from the child's dataType — no per-row branching.
  */
case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // BIGINT embeddings (HashEmbed milli-vectors) widen exactly for
  // |x| < 2^53 — same doubles as a CAST AS DOUBLE pre-pass, minus
  // the interpreted ArrayTransform that pre-pass would inline into
  // every consumer (measured 8x on the c26 norm stage)
  private def elemIsLong(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val ll = elemIsLong(left)
    val rl = elemIsLong(right)
    var acc = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble
        else if (ll) x.getLong(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble
        else if (rl) y.getLong(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ax = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else if (elemIsLong(left)) s"(double) $a.getLong($i)"
        else s"$a.getDouble($i)"
      val bx = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else if (elemIsLong(right)) s"(double) $b.getLong($i)"
        else s"$b.getDouble($i)"
      code"""
        |double $acc = 0.0;
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += $ax * $bx;
        |}
        |${ev.value} = $acc;
      """.stripMargin.toString
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Distinct-or-not word n-gram hashes straight from text: one JVM
  * pass replacing a nested interpreted-lambda chain (tokenize →
  * per-token PolyHash → n-gram combine). Same arithmetic as the
  * composed form: gram = fold over token hashes of
  * (acc·31 + h) mod P.
  */
case class WordGramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(v: UTF8String): GenericArrayData =
    new GenericArrayData(TextHash.wordGramHashesStr(v.toString, n, distinct))

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  // The kernel runs as compiled Scala behind a referenced object so
  // the surrounding stage keeps whole-stage codegen (no interpreted
  // projection fallback for the whole expression tree).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordGramHashes", this, classOf[WordGramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WordGramHashes =
    copy(child = c)
}

/** Intersection size of two SORTED distinct long arrays, as a
  * single primitive merge walk — O(n1+n2) with zero allocation.
  *
  * The builtin `size(array_intersect(a, b))` builds a boxed hash set
  * per PAIR; on the LSH verification path that pair count is the
  * candidate volume (24.7M at the 100× dedup gate), and the alloc
  * churn dominated the whole d18 run (278 s of a 422 s query —
  * GATE_SF1.md round-8 addendum). Sorting the per-document set once
  * (array_sort at feature-build time, amortized over every pair the
  * doc appears in) turns each pair check into this branch-predictable
  * merge. Caller contract: both inputs sorted ascending + distinct —
  * the count is wrong otherwise (callers build them with
  * array_sort(array_distinct(...))).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      code"""
        |int $n = $a.numElements();
        |int $m = $b.numElements();
        |int $i = 0; int $j = 0; long $c = 0L;
        |while ($i < $n && $j < $m) {
        |  long $xv = $a.getLong($i);
        |  long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $c++; $i++; $j++; }
        |  else if ($xv < $yv) { $i++; } else { $j++; }
        |}
        |${ev.value} = $c;
      """.stripMargin.toString
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Base-31 polynomial string hash mod 1e9+7; whole-stage codegen. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.polyHashStr(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      code"""
        |String $s = $c.toString();
        |long $h = 0L;
        |int $i = 0;
        |while ($i < $s.length()) {
        |  int $cp = $s.codePointAt($i);
        |  $h = ($h * 31 + $cp) % ${TextHash.P}L;
        |  $i += Character.charCount($cp);
        |}
        |${ev.value} = $h;
      """.stripMargin.toString
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
}

/** All k-char shingle hashes of a string as array<long>, computed
  * with a rolling hash (O(n), not O(n·k)).
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(v: UTF8String): GenericArrayData =
    new GenericArrayData(TextHash.shingleHashesStr(v.toString, k))

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** MinHash signature over a set of element hashes:
  * sig_j = min over h of (a_j·h + b_j) mod P. Empty input → P
  * sentinel per slot (never produced by a real hash).
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val sig = Array.fill(numPerms)(TextHash.P)
    var j = 0
    while (j < numPerms) {
      val a = TextHash.minA(j); val b = TextHash.minB(j)
      var i = 0
      while (i < arr.numElements()) {
        val x = (a * arr.getLong(i) + b) % TextHash.P
        if (x < sig(j)) sig(j) = x
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** SimHash over element hashes: bit b of the result is set when the
  * majority of elements have bit b set (ties → unset, vote must be
  * strictly positive).
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var result = 0L
    var b = 0
    while (b < bits) {
      var vote = 0L
      var i = 0
      while (i < arr.numElements()) {
        if (((arr.getLong(i) >> b) & 1L) == 1L) vote += 1 else vote -= 1
        i += 1
      }
      if (vote > 0) result |= (1L << b)
      b += 1
    }
    result
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

/** CDC chunk summaries straight from text, one compiled pass —
  * array<struct<idx, chunk_len, h1, h2>> with EXACTLY the arithmetic
  * of the composed column form it replaces (tokenize → per-token
  * PolyHash → boundary after token i when hash % divisor == 0 →
  * per-chunk base-31/37 folds). The composed form ran the two fold
  * aggregates as interpreted Catalyst lambdas per chunk row, which
  * dominated d53/c30 at sf1.0 (24.3 s isolated — GATE_SF1.md r15
  * part 3); this kernel is the same O(n_tokens) work as straight
  * JVM loops, with the surrounding stage kept in whole-stage
  * codegen via the referenced-object call (the WordGramHashes
  * pattern).
  */
case class CdcChunkRows(child: Expression, divisor: Int)
    extends UnaryExpression {
  require(divisor >= 1)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", LongType, nullable = false),
      StructField("chunk_len", LongType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  def compute(v: UTF8String): GenericArrayData = {
    val toks = v.toString.trim.toLowerCase.split("\\s+")
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = TextHash.polyHashStr(toks(i)); i += 1 }
    // boundaries: 0, every i in [1, n-1] with th(i-1) % divisor == 0, n
    val bs = new scala.collection.mutable.ArrayBuffer[Int](n / divisor + 2)
    bs += 0
    i = 1
    while (i <= n - 1) { if (th(i - 1) % divisor == 0) bs += i; i += 1 }
    bs += n
    val out = new scala.collection.mutable.ArrayBuffer[Any](bs.length - 1)
    var ci = 1
    while (ci < bs.length) {
      val lo = bs(ci - 1); val hi = bs(ci)
      if (hi - lo > 0) {
        var h1 = 0L; var h2 = 0L
        var j = lo
        while (j < hi) {
          h1 = (h1 * 31 + th(j)) % TextHash.P
          h2 = (h2 * 37 + th(j)) % TextHash.P
          j += 1
        }
        out += org.apache.spark.sql.catalyst.InternalRow(
          ci.toLong, (hi - lo).toLong, h1, h2)
      }
      ci += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cdcChunkRows", this, classOf[CdcChunkRows].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CdcChunkRows =
    copy(child = c)
}

/** Winnowing fingerprint selection over a gram-hash array: the
  * distinct min of every sliding `window` of consecutive hashes
  * (Schleimer et al. 2003), one compiled pass replacing the
  * interpreted transform(sequence)/slice/array_min/array_distinct
  * chain (27.6 s isolated at sf1.0 — GATE_SF1.md r15 part 3). Fewer
  * grams than a window → the min of what is there (one window),
  * matching the composed form and the d60 oracle. Output order is
  * first-selection order; every consumer treats the result as a
  * set.
  */
case class WinnowPrints(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val windows = math.max(n - window + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < windows) {
      var m = Long.MaxValue
      var j = i
      val hi = math.min(i + window, n)
      while (j < hi) {
        val x = arr.getLong(j)
        if (x < m) m = x
        j += 1
      }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowPrints", this, classOf[WinnowPrints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WinnowPrints =
    copy(child = c)
}
