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
    * min over shingles of g_i(shingle), with the Kirsch–Mitzenmacher
    * two-hash family g_i(x) = h1(x) + i·h2(x) (h2 forced odd so every
    * g_i is a bijection on 2^64, wrapping arithmetic intended) — two
    * string hashes per shingle instead of numHashes remixes, with the
    * same pairwise-independence guarantees the banding analysis needs. */
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
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 77L) | 1L
        var g = h1
        var j = 0
        while (j < numHashes) {
          if (g < sig(j)) sig(j) = g
          g += h2
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
    * result is the sign of Σ_tokens (±1 by bit k of hash(token)).
    *
    * `md5Parity = false` (default) hashes tokens with xxhash64 — the
    * cheap scale path. `md5Parity = true` uses the top 8 bytes of
    * md5(token) instead, bit-reproducible in DuckDB as
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` — the knob that makes
    * a SimHash pipeline oracle-checkable end to end (d04). Everything
    * downstream of the per-token hash (bit-majority signature,
    * pigeonhole blocks, hamming verify) is shared between the modes. */
  case class SimHash64(child: Expression, md5Parity: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md = if (md5Parity) java.security.MessageDigest.getInstance("MD5") else null
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h =
          if (md5Parity) {
            md.reset()
            val d = md.digest(s.getBytes)
            // first 8 digest bytes, big-endian — matches the hex prefix
            ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
              ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
              ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
              ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          } else
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
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

  /** Dot product of two array<double> columns — one fused loop. The
    * hottest kernel (every ANN scoring pair), so unlike the other
    * expressions here it implements real `doGenCode`: the loop inlines
    * into whole-stage codegen with no interpreted dispatch and no
    * codegen-fallback boundary splitting the surrounding stage. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
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
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** Euclidean distance of two array<double> vectors — Σ(x−y)² summed
    * left-to-right (the association order external oracles use), then
    * √. Same codegen treatment as [[VecDot]]: the loop inlines into
    * whole-stage codegen, replacing the interpreted
    * zip_with + aggregate lambda pair in the L2 probe hot path. */
  case class VecL2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      java.lang.Double.valueOf(math.sqrt(acc))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $x.getDouble($i) - $y.getDouble($i);
           |  ${ev.value} += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt(${ev.value});
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2 =
      copy(left = l, right = r)
    override def prettyName: String = "vec_l2"
  }

  /** Winnowing document fingerprints (the MOSS scheme): polynomial
    * rolling hash over character k-grams of the normalized text, then
    * the minimum hash of every w-gram window, deduplicated — a
    * position-robust fingerprint set whose overlap localizes shared
    * passages (unlike one whole-document digest). */
  case class Winnow(child: Expression, k: Int, w: Int,
      md5Parity: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    require(k >= 2 && w >= 1, "winnow needs k >= 2, w >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n = s.length
      if (n < k) return new GenericArrayData(Array(hashRange(s, 0, n)))
      val nGrams = n - k + 1
      val grams = new Array[Long](nGrams)
      // rolling polynomial hash base 257 over chars (wrapping arithmetic)
      val B = 257L
      var pow = 1L
      var i = 1
      while (i < k) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      grams(0) = finalize(h)
      i = 1
      while (i < nGrams) {
        h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
        grams(i) = finalize(h)
        i += 1
      }
      // winnow: min of each window of w grams, dedup consecutive picks
      val out = scala.collection.mutable.LinkedHashSet[Long]()
      var start = 0
      while (start <= nGrams - math.min(w, nGrams)) {
        var m = Long.MaxValue
        var j = start
        val end = math.min(start + w, nGrams)
        while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
        out += m
        start += 1
      }
      new GenericArrayData(out.toArray.sorted)
    }
    // xxhash-style avalanche so the weak polynomial bits spread. The
    // md5Parity mode (d11's oracle knob, the Winnow twin of
    // SimHash64's) replaces it with the top 60 bits of
    // md5(h.toString): non-negative, so Java's signed min-selection
    // and an external engine's comparison agree, and reproducible as
    // ('0x' || substr(md5(CAST(h AS VARCHAR)), 1, 15))::UBIGINT.
    // Valid because for k = 5 and BMP text the polynomial never wraps
    // (max < 257⁴·65535·5 < 2⁶³): the incremental value IS the direct
    // polynomial an external engine computes.
    private def finalize(h: Long): Long =
      if (md5Parity) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(java.lang.Long.toString(h)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        top >>> 4 // first 15 hex chars = 60 bits, always non-negative
      } else XXH64.hashLong(h, 42L)
    private def hashRange(s: String, from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) { h = h * 257L + s.charAt(i); i += 1 }
      finalize(h)
    }
    override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
    override def prettyName: String = "winnow"
  }

  /** k-word shingles of an array<string> token stream, space-joined —
    * the shingle constructor for the dedup family. The array-builtin
    * formulation (k-1 chained zip_with lambdas) interprets one
    * expression tree per shingle element; this is one loop per row.
    * `distinct = true` keeps first-occurrence order (array_distinct
    * semantics). Fewer than k tokens → one shingle: all tokens joined
    * (the short-doc fallback the Jaccard operators rely on). */
  case class NGrams(child: Expression, k: Int, distinct: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1, "k >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val sep = UTF8String.fromString(" ")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < k) {
        val all = new Array[UTF8String](n)
        var i = 0
        while (i < n) { all(i) = arr.getUTF8String(i); i += 1 }
        return new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
      }
      val m = n - k + 1
      val parts = new Array[UTF8String](k)
      if (distinct) {
        val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
        var i = 0
        while (i < m) {
          var j = 0
          while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          seen.add(UTF8String.concatWs(sep, parts: _*))
          i += 1
        }
        val out = new Array[Any](seen.size)
        val it = seen.iterator()
        var i2 = 0
        while (it.hasNext) { out(i2) = it.next(); i2 += 1 }
        new GenericArrayData(out)
      } else {
        val out = new Array[Any](m)
        var i = 0
        while (i < m) {
          var j = 0
          while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          out(i) = UTF8String.concatWs(sep, parts: _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override protected def withNewChildInternal(c: Expression): NGrams = copy(child = c)
    override def prettyName: String = "ngrams"
  }

  /** Per-window 128-bit hash pairs of the k-token sliding windows of an
    * array<string>: element i is struct(h1, h2) identifying window
    * [i, i+k). Replaces hash(ngrams(...)) where only window IDENTITY is
    * needed (duplicated-substring detection): each token is xxhash64'd
    * once per seed channel, then each window combines its k token
    * hashes with a fixed-length polynomial in 2⁶⁴ — O(T) string hashing
    * + O(T·k) multiply-adds, no gram-string allocation at all, vs the
    * ngrams shape's O(T·k·len) re-hashing of every character k times
    * plus T concatenated strings of garbage per row. Equal token
    * sequences always agree; distinct ones collide with probability
    * ~2⁻¹²⁸ per pair across the two independently-seeded channels
    * (constant window length k makes the polynomial injective up to
    * hash collisions). Short-input rule: 1..k-1 tokens yield one
    * window covering them all (as [[NGrams]]); an empty array yields
    * no windows (where NGrams emits one empty-string gram). */
  case class NGramHashPairs(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1, "k >= 1")
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("h1", LongType, nullable = false),
        StructField("h2", LongType, nullable = false))),
      containsNull = false)
    // distinct odd multipliers keep the two channels independent
    private val P1 = 0x9E3779B97F4A7C15L // golden-ratio odd constant
    private val P2 = 0xC2B2AE3D27D4EB4FL // xxhash64 prime_2 (odd)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val t1 = new Array[Long](n)
      val t2 = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        t1(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        t2(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 77L)
        i += 1
      }
      val kk = math.min(k, math.max(n, 1))
      val m = math.max(n - kk + 1, if (n == 0) 0 else 1)
      val out = new Array[Any](m)
      var w = 0
      while (w < m) {
        var h1 = 0L
        var h2 = 0L
        val end = math.min(w + kk, n)
        var p = w
        while (p < end) {
          h1 = h1 * P1 + t1(p)
          h2 = h2 * P2 + t2(p)
          p += 1
        }
        out(w) = InternalRow(h1, h2)
        w += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): NGramHashPairs =
      copy(child = c)
    override def prettyName: String = "ngram_hash_pairs"
  }

  /** `size(array_intersect(a, b))` computed without materializing the
    * intersection array: right side into a hash set, one counting scan
    * over the left (distinct matches). String arrays without null
    * elements only — [[graft.plans.IntersectSizeRewrite]] pattern-
    * matches exactly that shape out of Jaccard-style plans. */
  case class IntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val la = a.asInstanceOf[ArrayData]
      val ra = b.asInstanceOf[ArrayData]
      val rn = ra.numElements()
      val rset = new java.util.HashSet[UTF8String](rn * 2)
      var i = 0
      while (i < rn) { rset.add(ra.getUTF8String(i)); i += 1 }
      val seen = new java.util.HashSet[UTF8String]()
      var c = 0
      val ln = la.numElements()
      i = 0
      while (i < ln) {
        val s = la.getUTF8String(i)
        if (rset.contains(s) && seen.add(s)) c += 1
        i += 1
      }
      java.lang.Integer.valueOf(c)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
      copy(left = l, right = r)
    override def prettyName: String = "intersect_size"
  }

  /** Per-row gram-multiplicity stats of an array<string>:
    * struct(top = count of the most frequent element, tot = total
    * elements). The repetition-detection statistic — computed row-local
    * with one hash map, because a per-document statistic must never
    * explode the corpus into a (doc, gram) shuffle to count within one
    * row. Empty arrays yield (0, 0). */
  case class TopGramStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("top", IntegerType, nullable = false),
      StructField("tot", IntegerType, nullable = false)))
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
      var top = 0
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val c = counts.merge(s, 1, (a, b) => a + b)
        if (c > top) top = c
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](top, n))
    }
    override protected def withNewChildInternal(c: Expression): TopGramStats =
      copy(child = c)
    override def prettyName: String = "gram_stats"
  }

  /** Product-quantization encode: per subspace, the centroid index
    * maximizing 2·dot − ‖c‖² (argmin L2). One loop per row over
    * m×k×dsub — the Column-composition alternative re-evaluates a
    * subvector `slice` per (subspace × centroid), i.e. m·k array
    * allocations per row. Ties pick the lowest centroid index. */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    private val m = codebooks.length
    private val dsub = codebooks(0)(0).length
    private val cNorm2 = codebooks.map(_.map(c => c.map(x => x * x).sum))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[ArrayData]
      val out = new Array[Any](m)
      var s = 0
      while (s < m) {
        val base = s * dsub
        val cb = codebooks(s)
        var best = 0
        var bestScore = Double.NegativeInfinity
        var j = 0
        while (j < cb.length) {
          val c = cb(j)
          var dot = 0.0
          var i = 0
          while (i < dsub) { dot += u.getDouble(base + i) * c(i); i += 1 }
          val score = 2 * dot - cNorm2(s)(j)
          if (score > bestScore) { bestScore = score; best = j }
          j += 1
        }
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
    override def prettyName: String = "pq_encode"
  }

  /** Asymmetric-distance PQ score: Σ_s dot(query_sub_s, centroid_s(code_s))
    * — m codebook lookups + small dots, one loop per (query, codes) pair. */
  case class PqAdcScore(left: Expression, right: Expression,
      codebooks: Array[Array[Array[Double]]])
      extends BinaryExpression with CodegenFallback {
    private val m = codebooks.length
    private val dsub = codebooks(0)(0).length
    override def dataType: DataType = DoubleType
    override def nullSafeEval(q: Any, codes: Any): Any = {
      val u = q.asInstanceOf[ArrayData]
      val cd = codes.asInstanceOf[ArrayData]
      var acc = 0.0
      var s = 0
      while (s < m) {
        val c = codebooks(s)(cd.getInt(s))
        val base = s * dsub
        var i = 0
        while (i < dsub) { acc += u.getDouble(base + i) * c(i); i += 1 }
        s += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
      copy(left = l, right = r)
    override def prettyName: String = "pq_adc_score"
  }

  /** All banded hyperplane signatures of an array<double> unit vector
    * in ONE loop: element b is the `bandBits`-bit sign signature of the
    * vector against Gaussian planes derived from `seed + b` — generated
    * lazily per executor JVM, never serialized into the plan. (The
    * literal-plane formulation embedded bands×bits 64-double arrays as
    * separate dot expressions: 8+ MiB task binaries and minutes of
    * Janino on wide configs.) Plane values replicate
    * [[graft.functions.Vec.randomPlanes]] exactly — `Random(seed)`
    * Gaussians drawn plane-major — so signatures are bit-identical to
    * the per-plane form at the same seeds. */
  /** Uniform deviate in [0, 1) from a string key: the md5 digest's
    * first 4 bytes as an unsigned 32-bit over 2³² — EXACTLY
    * `('0x' || substr(md5(key), 1, 8))::UBIGINT / 4294967296.0` in any
    * SQL engine with md5, the cross-engine contract the parity plane
    * mode below and the sampling operators share. */
  def md5UnitOf(key: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }

  case class BandedHyperplaneSigs(child: Expression, bandBits: Int,
      bands: Int, dim: Int, seed: Long, md5Parity: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    require(bandBits >= 1 && bandBits <= 63, "1..63 bits per band")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // Gaussian planes (seeded JVM Random) for production; `md5Parity`
    // swaps in centered md5-uniform components keyed "band:bit:dim" so
    // an external SQL engine rebuilds the planes bit-for-bit (the v03
    // oracle) — sign-LSH needs only a symmetric direction distribution,
    // so the uniform cube trades a little isotropy for replayability.
    @transient private lazy val planes: Array[Array[Double]] =
      if (md5Parity)
        Array.tabulate(bands) { b =>
          Array.tabulate(bandBits * dim) { off =>
            md5UnitOf(s"$b:${off / dim}:${off % dim}") - 0.5
          }
        }
      else Array.tabulate(bands) { b =>
        val rnd = new scala.util.Random(seed + b)
        Array.fill(bandBits * dim)(rnd.nextGaussian())
      }
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        val p = planes(b)
        var sig = 0L
        var j = 0
        while (j < bandBits) {
          val off = j * dim
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v.getDouble(i) * p(off + i); i += 1 }
          if (acc > 0) sig |= (1L << j)
          j += 1
        }
        out(b) = sig
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): BandedHyperplaneSigs =
      copy(child = c)
    override def prettyName: String = "banded_hyperplane_sigs"
  }

  /** Band bucket keys of a minhash signature: element b is a 64-bit
    * hash of signature rows [b·r, (b+1)·r) — the LSH banding join key.
    * One loop per row instead of `transform(sequence, b =>
    * xxhash64(slice(sig, …)))`, whose lambda applications are
    * interpreted and whose slices allocate per band. Any deterministic
    * mix works here (equal slices ⇒ equal keys is the only property
    * banding needs); this chains XXH64.hashLong. */
  case class MinHashBandKeys(child: Expression, bands: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val n = sig.numElements()
      val r = n / bands
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 42L
        var j = b * r
        val end = j + r
        while (j < end) { h = XXH64.hashLong(sig.getLong(j), h); j += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashBandKeys =
      copy(child = c)
    override def prettyName: String = "minhash_band_keys"
  }

  /** Unicode canonicalization for dedup keys — the CCNet/CC-style
    * "same text modulo rendering" fold: NFKC compatibility fold
    * (ligatures, full-width forms), NFD + non-spacing-mark strip
    * (accent removal), locale-free lowercase, whitespace collapse.
    * One pass per row; the equivalent chain of regexp/translate
    * builtins can't express the Unicode tables at all. Mirrors
    * `lower(strip_accents(...))` in engines that have it, plus the
    * compatibility fold those engines lack. */
  // Hoisted (Pattern.compile per row would dominate short strings);
  // UNICODE_CHARACTER_CLASS so \s covers U+2028/U+2029/NEL etc. —
  // whitespace codepoints NFKC does not fold to ASCII space
  private val UnicodeWs =
    java.util.regex.Pattern.compile("\\s+",
      java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  case class NormalizeUtf8(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      import java.text.Normalizer
      val s = input.asInstanceOf[UTF8String].toString
      val nfd = Normalizer.normalize(
        Normalizer.normalize(s, Normalizer.Form.NFKC), Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      val folded = UnicodeWs
        .matcher(sb.toString.toLowerCase(java.util.Locale.ROOT))
        .replaceAll(" ").trim
      UTF8String.fromString(folded)
    }
    override protected def withNewChildInternal(c: Expression): NormalizeUtf8 =
      copy(child = c)
    override def prettyName: String = "normalize_utf8"
  }

  /** Shannon entropy in bits per code point over the string's character
    * distribution — the information-density quality signal (low entropy
    * = repetitive/degenerate text, keyboard mashing, padded filler;
    * prose sits near 4–4.5 bits). Row-local single pass: one count map,
    * one loop over distinct code points — the explode-to-(doc, char)
    * alternative shuffles the corpus to compute a per-row statistic.
    * Empty string yields 0.0. */
  case class CharEntropy(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var n = 0
      val counts = new java.util.HashMap[Integer, Integer]()
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        counts.merge(cp, 1, (a, b) => a + b)
        n += 1
        i += Character.charCount(cp)
      }
      if (n == 0) 0.0
      else {
        val ln2 = math.log(2.0)
        var h = 0.0
        val it = counts.values().iterator()
        while (it.hasNext) {
          val p = it.next().toDouble / n
          h -= p * (math.log(p) / ln2)
        }
        h
      }
    }
    override protected def withNewChildInternal(c: Expression): CharEntropy =
      copy(child = c)
    override def prettyName: String = "char_entropy"
  }

  // Column wrappers (Spark 4 classic API: Column no longer wraps a
  // catalyst Expression directly — see GraftBridge)
  import GraftBridge.{column, expression}
  def minhash_band_keys(sig: Column, bands: Int): Column =
    column(MinHashBandKeys(expression(sig), bands))
  def banded_hyperplane_sigs(unit: Column, bandBits: Int, bands: Int,
      dim: Int, seed: Long, md5Parity: Boolean = false): Column =
    column(BandedHyperplaneSigs(expression(unit), bandBits, bands, dim, seed,
      md5Parity))
  def minhash64(shingles: Column, numHashes: Int): Column =
    column(MinHash64(expression(shingles), numHashes))
  def simhash64(tokens: Column, md5Parity: Boolean = false): Column =
    column(SimHash64(expression(tokens), md5Parity))
  def vec_dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))
  def vec_l2(a: Column, b: Column): Column =
    column(VecL2(expression(a), expression(b)))
  def winnow(text: Column, k: Int = 5, w: Int = 4,
      md5Parity: Boolean = false): Column =
    column(Winnow(expression(text), k, w, md5Parity))
  def ngrams(tokens: Column, k: Int, distinct: Boolean): Column =
    column(NGrams(expression(tokens), k, distinct))
  def ngram_hash_pairs(tokens: Column, k: Int): Column =
    column(NGramHashPairs(expression(tokens), k))
  def gram_stats(grams: Column): Column =
    column(TopGramStats(expression(grams)))
  def intersect_size(a: Column, b: Column): Column =
    column(IntersectSize(expression(a), expression(b)))
  def normalize_utf8(text: Column): Column =
    column(NormalizeUtf8(expression(text)))
  def char_entropy(text: Column): Column =
    column(CharEntropy(expression(text)))
  def pq_encode(unit: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(unit), codebooks))
  def pq_adc_score(qUnit: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    column(PqAdcScore(expression(qUnit), expression(codes), codebooks))
}
