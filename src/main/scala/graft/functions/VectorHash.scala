package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's numeric/hashing hot loops —
  * the similarity and dedup operators' per-pair and per-row kernels.
  *
  * Each replaces an interpreted higher-order-function pipeline (HOFs never
  * enter whole-stage codegen, and interpreted lambdas cost an Expression-tree
  * walk per element) with a single tight JVM loop, while reproducing the
  * pipeline's arithmetic bit-for-bit:
  *
  *  - sums run left-to-right in double, exactly like
  *    `aggregate(…, lit(0.0), (acc, v) => acc + v)`;
  *  - hashes call the same XXH64 primitives (seed 42, argument order) the
  *    built-in `xxhash64(…)` expression uses, so signatures, band keys and
  *    bucket assignments are unchanged down to the bit.
  *
  * The oracle contract depends on this: DuckDB recomputes cosines from the
  * same float inputs, and the CORRECTNESS gate hashes the rounded values.
  */
object VecOps {

  /** Left-to-right double dot product of two float arrays. Twin of
    * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, +)`
    * including its null algebra: ragged lengths (zip_with pads with null) or
    * any null element poison the sum → null result, never an out-of-bounds
    * read or a garbage number.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** sqrt of the left-to-right double sum of squares; null element → null
    * (the HOF's null propagation).
    */
  def norm(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** 64-bit SimHash of a token-hash array: per bit position, sum +1/-1 votes
    * of that bit across hashes; non-negative vote → bit set. Integer sums are
    * exact, so any evaluation order matches the per-position HOF loop. A null
    * element votes −1 on every bit exactly like the HOF (its
    * `when(bit-test).otherwise(-1)` turns the null test into the else
    * branch) — i.e. it behaves as h = 0.
    */
  def simhash(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = if (hashes.isNullAt(i)) 0L else hashes.getLong(i)
      var p = 0
      while (p < 64) {
        if (((h >> p) & 1L) == 1L) votes(p) += 1 else votes(p) -= 1
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (votes(p) >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** MinHash signature: element i = min over shingles of xxhash64(i, shingle),
    * reproducing the built-in's chained-seed evaluation
    * (seed 42 → hashInt(i) → hashUTF8String(s)) INCLUDING its null algebra:
    * a null shingle hashes to the unchanged seed (hash functions skip nulls),
    * and an empty array yields k null elements (`array_min` of empty), not a
    * null array.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = if (shingles.isNullAt(j)) null else shingles.getUTF8String(j)
      var i = 0
      while (i < k) {
        val seed = XXH64.hashInt(i, 42L)
        val h = if (s == null) seed else XXH64.hashUTF8String(s, seed)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Jaccard similarity of two distinct string arrays (see JaccardSimExpr). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(4, nb * 2))
    var i = 0
    while (i < nb) { set.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < na) { if (set.contains(a.getUTF8String(i))) inter += 1; i += 1 }
    val denom = na + nb - inter
    if (denom == 0) Double.NaN else inter.toDouble / denom
  }

  /** Sign-random-projection signature: bit p = [Σ_d x_d · plane(p, d) ≥ 0]
    * with plane(p, d) = pmod(xxhash64(p, d), 100000)/100000 − 0.5 — the
    * deterministic pseudo-random hyperplane family of
    * graft.operators.Similarity (no RNG state to ship to a cluster).
    */
  def srpSig(emb: ArrayData, bits: Int): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Int](bits)
    // empty array or any null element nulls every projection (zip_with over
    // an empty/padded array → null sum); when(null >= 0, 1).otherwise(0)
    // takes the else branch → the HOF yields all-zero bits
    if (n == 0) return new GenericArrayData(out)
    var chk = 0
    while (chk < n) {
      if (emb.isNullAt(chk)) return new GenericArrayData(out)
      chk += 1
    }
    var p = 0
    while (p < bits) {
      val seedP = XXH64.hashInt(p, 42L)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = XXH64.hashInt(d, seedP)
        val m = ((h % 100000L) + 100000L) % 100000L
        acc += emb.getFloat(d).toDouble * (m.toDouble / 100000.0 - 0.5)
        d += 1
      }
      out(p) = if (acc >= 0.0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait FloatArrayInput { self: Expression =>
  protected def checkFloatArray(dt: DataType, what: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires ARRAY<FLOAT>, got ${other.sql}")
  }
}

/** `graft_dot(a, b)` — left-to-right double dot product of float vectors. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInput {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkFloatArray(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkFloatArray(right.dataType, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs → null
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecOps.dot($a, $b);
      ${ev.isNull} = ${ev.value}_r == null;
      if (!${ev.isNull}) ${ev.value} = ${ev.value}_r.doubleValue();
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_norm(a)` — L2 norm of a float vector. */
case class VecNormExpr(child: Expression) extends UnaryExpression with FloatArrayInput {
  override def checkInputDataTypes(): TypeCheckResult =
    checkFloatArray(child.dataType, prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null-element input → null
  override def prettyName: String = "graft_norm"
  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecOps.norm($a);
      ${ev.isNull} = ${ev.value}_r == null;
      if (!${ev.isNull}) ${ev.value} = ${ev.value}_r.doubleValue();
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(hashes)` — 64-bit SimHash of an ARRAY<BIGINT> of token hashes. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(a: Any): Any =
    VecOps.simhash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.simhash($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash(shingles, k)` — k-element MinHash signature of ARRAY<STRING>. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> and k > 0, got ${other.sql}")
  }
  // empty shingle array → k-element array of nulls (array_min of empty)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(a: Any): Any =
    VecOps.minhashSig(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.minhashSig($a, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_srp_sig(emb, bits)` — sign-random-projection signature of ARRAY<FLOAT>. */
case class SrpSigExpr(child: Expression, bits: Int)
    extends UnaryExpression with FloatArrayInput {
  override def checkInputDataTypes(): TypeCheckResult =
    if (bits <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName requires bits > 0")
    else checkFloatArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_srp_sig"
  override protected def nullSafeEval(a: Any): Any =
    VecOps.srpSig(a.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.srpSig($a, $bits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_jaccard(a, b)` — exact Jaccard similarity of two DISTINCT string
  * arrays: |a∩b| / (|a|+|b|−|a∩b|). Bit-identical to
  * `size(array_intersect(a,b)).double / size(array_distinct(concat(a,b)))`
  * for distinct inputs (the dedup pipeline's shingle sets are
  * `array_distinct`-ed at creation), including the 0/0 → NaN edge; one
  * hash-set pass instead of three array-walk expressions per candidate pair.
  */
case class JaccardSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires two ARRAY<STRING> arguments")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `IvfProbeExpr(emb, centroids, nprobe)` — the nprobe nearest coarse-quantizer
  * cells for a vector, by (cosine desc, cell index asc). The centroid matrix
  * is embedded in the expression as a plan-time snapshot (the IDF-weights
  * pattern: collected once, shipped as part of the serialized plan — the
  * broadcast-variable analogue for expression trees). One tight JVM loop per
  * row; codegen embeds the expression instance via `addReferenceObj`.
  */
case class IvfProbeExpr(child: Expression, centroids: Seq[Seq[Float]], nprobe: Int)
    extends UnaryExpression with FloatArrayInput {
  override def checkInputDataTypes(): TypeCheckResult =
    if (centroids.isEmpty || nprobe <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires centroids and nprobe > 0")
    else checkFloatArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_probe"

  @transient private lazy val cents: Array[Array[Float]] = centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { val x = c(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  /** Top-nprobe cell indices for one vector (cosine desc, index asc). */
  def probe(emb: ArrayData): ArrayData = {
    val n = cents.length
    val p = math.min(nprobe, n)
    val cos = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      var acc = 0.0
      var normAcc = 0.0
      var i = 0
      val d = math.min(cent.length, emb.numElements())
      while (i < d) {
        val x = emb.getFloat(i).toDouble
        acc += x * cent(i).toDouble
        normAcc += x * x
        i += 1
      }
      cos(c) = if (centNorms(c) == 0.0 || normAcc == 0.0) -2.0
               else acc / (math.sqrt(normAcc) * centNorms(c))
      c += 1
    }
    val idx = Array.range(0, n).sortBy(i => (-cos(i), i)).take(p)
    new GenericArrayData(idx)
  }

  override protected def nullSafeEval(a: Any): Any = probe(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfProbe", this, classOf[IvfProbeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorHash {
  def dotCol(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  def normCol(a: Column): Column =
    GraftBridge.column(VecNormExpr(GraftBridge.expression(a)))
  def simhashCol(hashes: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(hashes)))
  def minhashCol(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(shingles), k))
  def srpSigCol(emb: Column, bits: Int): Column =
    GraftBridge.column(SrpSigExpr(GraftBridge.expression(emb), bits))
  def ivfProbeCol(emb: Column, centroids: Seq[Seq[Float]], nprobe: Int): Column =
    GraftBridge.column(IvfProbeExpr(GraftBridge.expression(emb), centroids, nprobe))
  def jaccardCol(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
