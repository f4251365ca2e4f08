package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Custom Catalyst expressions for operators Spark's built-ins can't
  * express directly. All are deterministic pure functions of their input so
  * they stay safe under retries/speculation at cluster scale.
  *
  * All three implement `doGenCode`, so they stay inside whole-stage
  * codegen on the hot per-document/per-vector paths.
  */
object Expressions {

  /** 64-bit polynomial rolling-hash fingerprint of a token array
    * (document fingerprinting, SURVEY §2.C5). Order-sensitive: token
    * sequences, not bags, distinguish documents.
    */
  case class PolyFingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var h   = 1125899906842597L // large prime seed
      var i   = 0
      while (i < arr.numElements()) {
        val s  = arr.getUTF8String(i)
        var th = 0L
        val bytes = s.getBytes
        var j  = 0
        while (j < bytes.length) { th = 31L * th + (bytes(j) & 0xff); j += 1 }
        h = 1000003L * h + th
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i, j, th, bytes = ctx.freshName("v")
        s"""
           |long ${ev.value}_h = 1125899906842597L;
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  byte[] $bytes = $c.getUTF8String($i).getBytes();
           |  long $th = 0L;
           |  for (int $j = 0; $j < $bytes.length; $j++) {
           |    $th = 31L * $th + ($bytes[$j] & 0xff);
           |  }
           |  ${ev.value}_h = 1000003L * ${ev.value}_h + $th;
           |}
           |${ev.value} = ${ev.value}_h;
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): PolyFingerprint = copy(c)
  }

  /** 64-bit SimHash over an array of (already hashed) token longs
    * (SURVEY §2.C7): per bit, sum +1/-1 across token hashes; result bit set
    * where the sum is positive. Token multiplicity acts as the weight.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr    = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i      = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b   = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i, b, h, counts = ctx.freshName("v")
        s"""
           |int[] $counts = new int[64];
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  long $h = $c.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
           |  }
           |}
           |${ev.value} = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] > 0) ${ev.value} |= (1L << $b);
           |}
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** Random-hyperplane LSH bucket id for an array<double> embedding
    * (SURVEY §2.C10): sign bits of `planes` fixed pseudo-random hyperplanes,
    * offset by `table * planes` so multiple independent tables can share one
    * plane matrix; in codegen the matrix rides along as a reference object.
    *
    * Plane weights are ±1 Rademacher signs derived from Spark's own
    * `XXH64.hashLong((table·64 + p)·64 + d, 42)` — sign-random-projection
    * LSH is valid for any symmetric subgaussian weight distribution, and a
    * hash-derived matrix (unlike a JVM `Random` Gaussian sequence) is
    * reproducible in the DuckDB oracle, which makes the ANN search
    * hard-verifiable end to end (see VectorOps.annLshSql).
    */
  case class HyperplaneBucket(child: Expression, table: Int, planes: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    private lazy val weights: Array[Array[Double]] =
      Array.tabulate(planes, HyperplaneBucket.Dims) { (p, d) =>
        val idx = (table.toLong * 64L + p) * 64L + d
        if ((XXH64.hashLong(idx, 42L) & 1L) == 1L) 1.0 else -1.0
      }
    override def nullSafeEval(input: Any): Any = {
      val arr    = input.asInstanceOf[ArrayData]
      val n      = math.min(arr.numElements(), HyperplaneBucket.Dims)
      var bucket = 0
      var p      = 0
      while (p < planes) {
        var dot = 0.0
        val w   = weights(p)
        var d   = 0
        while (d < n) { dot += arr.getDouble(d) * w(d); d += 1 }
        if (dot > 0) bucket |= (1 << p)
        p += 1
      }
      java.lang.Integer.valueOf(bucket)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val w = ctx.addReferenceObj("hyperplaneWeights", weights, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val n, p, d, dot = ctx.freshName("v")
        s"""
           |int $n = java.lang.Math.min($c.numElements(), ${HyperplaneBucket.Dims});
           |${ev.value} = 0;
           |for (int $p = 0; $p < $planes; $p++) {
           |  double $dot = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $dot += $c.getDouble($d) * $w[$p][$d];
           |  }
           |  if ($dot > 0) ${ev.value} |= (1 << $p);
           |}
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
  }
  object HyperplaneBucket { val Dims = 64 }

  /** Johnson–Lindenstrauss random projection of an array<double> embedding
    * to `outDims` dimensions: `y_j = (Σ_d v_d · w_jd) / √outDims` with the
    * same hash-derived ±1 Rademacher weights as [[HyperplaneBucket]]
    * (Achlioptas 2003 — database-friendly random projections: Rademacher
    * entries satisfy the JL lemma like Gaussians). `table` offsets the hash
    * index space so the projection is independent of any LSH table sharing
    * the family. Map-side, codegen'd, and — because the weights come from
    * `XXH64.hashLong` rather than a JVM RNG — exactly reproducible in the
    * DuckDB oracle, fold order d ascending per output dim.
    */
  case class RademacherProject(child: Expression, table: Int, outDims: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private lazy val scale: Double = math.sqrt(outDims.toDouble)
    private lazy val weights: Array[Array[Double]] =
      Array.tabulate(outDims, HyperplaneBucket.Dims) { (p, d) =>
        val idx = (table.toLong * 64L + p) * 64L + d
        if ((XXH64.hashLong(idx, 42L) & 1L) == 1L) 1.0 else -1.0
      }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n   = math.min(arr.numElements(), HyperplaneBucket.Dims)
      val out = new Array[Double](outDims)
      var p   = 0
      while (p < outDims) {
        var dot = 0.0
        val w   = weights(p)
        var d   = 0
        while (d < n) { dot += arr.getDouble(d) * w(d); d += 1 }
        out(p) = dot / scale
        p += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val w = ctx.addReferenceObj("rademacherWeights", weights, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val n, p, d, dot, out = ctx.freshName("v")
        s"""
           |int $n = java.lang.Math.min($c.numElements(), ${HyperplaneBucket.Dims});
           |double[] $out = new double[$outDims];
           |for (int $p = 0; $p < $outDims; $p++) {
           |  double $dot = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $dot += $c.getDouble($d) * $w[$p][$d];
           |  }
           |  $out[$p] = $dot / $scale;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): RademacherProject =
      copy(child = c)
  }

  /** Indices of the `n` nearest centroids for an array<double> vector, by
    * descending dot product (SURVEY §2.C10b — IVF cell assignment / probe
    * selection). Centroids must be L2-normalized by the caller so dot order
    * equals cosine order (the row's own norm is a positive constant and
    * cannot change its argmax). Ties break to the lowest cell index.
    *
    * This is the map-side replacement for crossJoin(centroids) + window
    * argmax: the centroid matrix rides along as a broadcast-safe reference
    * object and assignment needs ZERO shuffle — the property that makes IVF
    * viable at 100 TB (the old window plan shuffled NCells× the corpus).
    */
  case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr  = input.asInstanceOf[ArrayData]
      val k    = centroids.length
      val dots = new Array[Double](k)
      var c    = 0
      while (c < k) {
        val w  = centroids(c)
        val nd = math.min(arr.numElements(), w.length)
        var s  = 0.0
        var d  = 0
        while (d < nd) { s += arr.getDouble(d) * w(d); d += 1 }
        dots(c) = s
        c += 1
      }
      val m    = math.min(n, k)
      val out  = new Array[Int](m)
      val used = new Array[Boolean](k)
      var r    = 0
      while (r < m) {
        // NaN guards: a NaN dot (NaN vector element or NaN centroid) makes
        // `>` comparisons always false — without them `best` could stay -1
        // (used(-1) throws), and a NaN bestV would beat every finite dot.
        // Any finite dot replaces a NaN one; all-NaN falls back to index
        // order.
        var best  = -1
        var bestV = Double.NegativeInfinity
        var i     = 0
        while (i < k) {
          if (!used(i) && (best == -1 || dots(i) > bestV || (bestV.isNaN && !dots(i).isNaN))) {
            best = i; bestV = dots(i)
          }
          i += 1
        }
        used(best) = true
        out(r) = best
        r += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      val m     = math.min(n, centroids.length)
      nullSafeCodeGen(ctx, ev, c => {
        val k, dots, i, d, nd, s, out, used, r, best, bestV = ctx.freshName("v")
        s"""
           |int $k = $cents.length;
           |double[] $dots = new double[$k];
           |for (int $i = 0; $i < $k; $i++) {
           |  int $nd = java.lang.Math.min($c.numElements(), $cents[$i].length);
           |  double $s = 0.0;
           |  for (int $d = 0; $d < $nd; $d++) {
           |    $s += $c.getDouble($d) * $cents[$i][$d];
           |  }
           |  $dots[$i] = $s;
           |}
           |int[] $out = new int[$m];
           |boolean[] $used = new boolean[$k];
           |for (int $r = 0; $r < $m; $r++) {
           |  int $best = -1;
           |  double $bestV = Double.NEGATIVE_INFINITY;
           |  for (int $i = 0; $i < $k; $i++) {
           |    if (!$used[$i] && ($best == -1 || $dots[$i] > $bestV || ($bestV != $bestV && $dots[$i] == $dots[$i]))) {
           |      $best = $i; $bestV = $dots[$i];
           |    }
           |  }
           |  $used[$best] = true;
           |  $out[$r] = $best;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroids =
      copy(child = c)
  }

  /** All k MinHash signature values in ONE pass over an array of 64-bit
    * base hashes: `sig_i = min_b XXH64.hashInt(i, XXH64.hashLong(b, 42))` —
    * element-for-element the same chain as `xxhash64(b, i)`, so replacing
    * the k separate `array_min(transform(bh, b -> xxhash64(b, i)))` folds
    * (each an interpreted lambda pass) changes NOTHING in the output or
    * the DuckDB oracle, only the cost: one codegen'd loop computes
    * `hashLong` once per element and k cheap `hashInt` mixes, instead of
    * k interpreted passes re-deriving it.
    */
  case class MinHashSignatures(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr  = input.asInstanceOf[ArrayData]
      val sigs = Array.fill(k)(Long.MaxValue)
      var i    = 0
      while (i < arr.numElements()) {
        val hl = XXH64.hashLong(arr.getLong(i), 42L)
        var p  = 0
        while (p < k) {
          val h = XXH64.hashInt(p, hl)
          if (h < sigs(p)) sigs(p) = h
          p += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i, p, hl, h, sigs = ctx.freshName("v")
        val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
        s"""
           |long[] $sigs = new long[$k];
           |java.util.Arrays.fill($sigs, Long.MAX_VALUE);
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  long $hl = $xxh.hashLong($c.getLong($i), 42L);
           |  for (int $p = 0; $p < $k; $p++) {
           |    long $h = $xxh.hashInt($p, $hl);
           |    if ($h < $sigs[$p]) $sigs[$p] = $h;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): MinHashSignatures =
      copy(child = c)
  }

  /** The whole per-document winnowing selection (gram hash sequence +
    * rightmost-minimum window fold + position dedupe) as ONE compiled call
    * per row, replacing a doubly-nested higher-order-function expression
    * whose lambdas Spark evaluates INTERPRETED per element (the q60/q64
    * hot path: one lambda dispatch per window step per row).
    *
    * Semantics are bit-identical to the HOF formulation (and its DuckDB
    * oracle): gram hash `i` = `xxhash64(concat_ws(' ', toks[i..i+k-1]))`
    * via the same `XXH64.hashUTF8String(…, 42)`; per window the fold keeps
    * the RIGHTMOST minimum (`<=` while scanning ascending); dedupe relies
    * on the selection sequence being non-decreasing — the rightmost-tie
    * rule means a still-in-window selection is only ever replaced by a
    * LATER index, so dropping consecutive repeats equals `array_distinct`
    * in first-occurrence order. Docs shorter than w+k-1 tokens emit
    * nothing, like the CASE guards they replace.
    */
  case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
    import org.apache.spark.sql.types.{StructField, StructType}
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("pos", IntegerType, nullable = false),
        StructField("fp", LongType, nullable = false))),
      containsNull = false)

    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    def compute(input: ArrayData): ArrayData = {
      val n = input.numElements()
      val m = n - k + 1
      if (n < k || m < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
      val hs = new Array[Long](m)
      var i  = 0
      while (i < m) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
        var j     = 0
        while (j < k) { parts(j) = input.getUTF8String(i + j); j += 1 }
        hs(i) = XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), 42L)
        i += 1
      }
      val out  = scala.collection.mutable.ArrayBuffer.empty[Any]
      var last = -1
      var ww   = 0
      while (ww <= m - w) {
        var acc = ww
        var j   = ww + 1
        while (j < ww + w) { if (hs(j) <= hs(acc)) acc = j; j += 1 }
        if (acc != last) {
          out += org.apache.spark.sql.catalyst.InternalRow(acc + 1, hs(acc))
          last = acc
        }
        ww += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
  }

  /** Most-frequent-2-gram count of a token array in ONE compiled pass (the
    * q41 Gopher-repetition hot path): adjacent-pair multiplicities in a
    * hash map, max count out. Replaces an interpreted-lambda chain
    * (transform-concat → array_sort with comparator lambda → struct-
    * accumulator fold). Mode count ≡ longest equal-run of the sorted gram
    * array ≡ the oracle's relational GROUP BY route — all three compute
    * the same integer. Docs under 2 tokens return 0, like the CASE guard
    * this replaces.
    */
  case class Top2GramCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    def compute(arr: ArrayData): Int = {
      val n = arr.numElements()
      if (n < 2) return 0
      val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
      var best   = 0
      var i      = 0
      while (i < n - 1) {
        val g = org.apache.spark.unsafe.types.UTF8String
          .concatWs(sep, arr.getUTF8String(i), arr.getUTF8String(i + 1))
        val c = counts.merge(g, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > best) best = c
        i += 1
      }
      best
    }
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(compute(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("top2gram", this, classOf[Top2GramCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Top2GramCount = copy(c)
  }

  /** The q36 int8 max-abs quantization summaries in ONE compiled pass:
    * amax, then per-element `cast(round(x·127/amax) AS int)` with Spark's
    * own Round semantics (`BigDecimal.setScale(0, HALF_UP)` — half away
    * from zero, identical to the DuckDB oracle), accumulating
    * min/max/sum/sum-of-squares. NULL (→ filtered) when the vector has a
    * NaN, an infinity, or no non-zero element — the
    * `amax > 0 AND NOT isnan AND NOT isinf` gate. Replaces four
    * interpreted higher-order folds per row.
    */
  case class Int8QuantSummary(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.types.{StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("q_min", IntegerType, nullable = false),
      StructField("q_max", IntegerType, nullable = false),
      StructField("q_sum", LongType, nullable = false),
      StructField("q_sumsq", LongType, nullable = false)))
    override def nullable: Boolean = true
    def compute(arr: ArrayData): Any = {
      val n       = arr.numElements()
      var amax    = 0.0
      var hasNaN  = false
      var i       = 0
      while (i < n) {
        val a = math.abs(arr.getDouble(i))
        if (a.isNaN) hasNaN = true else if (a > amax) amax = a
        i += 1
      }
      // ±Inf joins NaN in the null gate: an infinite amax would make the
      // per-element quotient NaN (Inf/Inf) and BigDecimal.valueOf throw.
      if (hasNaN || amax.isInfinite || amax <= 0) return null
      var qMin  = Int.MaxValue
      var qMax  = Int.MinValue
      var qSum  = 0L
      var qSsq  = 0L
      i = 0
      while (i < n) {
        val q = java.math.BigDecimal
          .valueOf(arr.getDouble(i) * 127.0 / amax)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue()
          .toInt
        if (q < qMin) qMin = q
        if (q > qMax) qMax = q
        qSum += q
        qSsq += q.toLong * q
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(qMin, qMax, qSum, qSsq)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("int8sum", this, classOf[Int8QuantSummary].getName)
      nullSafeCodeGen(ctx, ev, c => {
        val r = ctx.freshName("v")
        s"""
           |Object $r = $self.compute($c);
           |if ($r == null) { ${ev.isNull} = true; } else {
           |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r;
           |}
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): Int8QuantSummary = copy(c)
  }

  /** Distinct hashed token n-grams in ONE compiled pass — the gram stage
    * of q39/q51/q54 (`array_distinct(transform(…, xxhash64(concat_ws(…))))`
    * with interpreted lambdas). Same hashes (`XXH64.hashUTF8String` of the
    * space-joined gram), same distinct set; first-occurrence order like
    * `array_distinct` (irrelevant post-explode, kept anyway).
    */
  case class HashedGrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    def compute(arr: ArrayData): ArrayData = {
      val len = arr.numElements()
      val m   = len - n + 1
      if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i    = 0
      while (i < m) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j     = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), 42L))
        i += 1
      }
      val out = new Array[Long](seen.size())
      val it  = seen.iterator()
      var k   = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("hashedGrams", this, classOf[HashedGrams].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): HashedGrams = copy(child = c)
  }

  /** Distinct hashed token n-grams at SEVERAL grain sizes in ONE compiled
    * pass — the multi-grain twin of [[HashedGrams]] for q205's severity
    * sweep (which otherwise runs the single-grain kernel once per grain:
    * 3 separate array walks and Σn token copies per position). One shared
    * row buffer (all tokens space-joined, built once per row with
    * cumulative byte offsets) makes every (position, n) gram a zero-copy
    * byte slice; `XXH64.hashUnsafeBytes` over the slice hashes the exact
    * bytes `hashUTF8String(concatWs(" ", parts))` would — same hashes,
    * same per-grain distinct sets, so downstream values (and the DuckDB
    * oracles) are unchanged. Output: array of (n, g) structs, all grains
    * of a row in one array (first-occurrence order per grain, grains in
    * the given order — irrelevant post-explode, deterministic anyway).
    */
  case class MultiGramHashes(child: Expression, ns: Seq[Int]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("n", IntegerType, nullable = false),
        StructField("g", LongType, nullable = false))),
      containsNull = false)
    def compute(arr: ArrayData): ArrayData = {
      val len = arr.numElements()
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var total   = 0L
      var i       = 0
      var anyNull = false
      while (i < len) {
        toks(i) = arr.getUTF8String(i)
        if (toks(i) == null) anyNull = true else total += toks(i).numBytes
        i += 1
      }
      // a null ELEMENT (the declared type is containsNull-tolerant) breaks
      // the contiguous-buffer slice math — fall back to the per-window
      // concatWs spelling, whose null-SKIPPING is exactly the HashedGrams
      // semantics this kernel must stay hash-identical to
      if (anyNull) return computeWithNulls(toks)
      // offs(i) = byte start of token i in the joined buffer; offs(len) = end
      val bufLen = (total + math.max(0, len - 1)).toInt
      val buf    = new Array[Byte](bufLen)
      val offs   = new Array[Int](len + 1)
      var pos    = 0
      i = 0
      while (i < len) {
        if (i > 0) { buf(pos) = ' '.toByte; pos += 1 }
        offs(i) = pos
        val t = toks(i)
        org.apache.spark.unsafe.Platform.copyMemory(
          t.getBaseObject, t.getBaseOffset,
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos, t.numBytes)
        pos += t.numBytes
        i += 1
      }
      offs(len) = pos + 1 // virtual separator past the end, so slice math is uniform
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      ns.foreach { n =>
        val m = len - n + 1
        if (m > 0) {
          val seen = new java.util.HashSet[java.lang.Long]()
          var j    = 0
          while (j < m) {
            val start = offs(j)
            val glen  = offs(j + n) - 1 - start // drop the trailing separator
            val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, glen, 42L)
            if (seen.add(h)) out += org.apache.spark.sql.catalyst.InternalRow(n, h)
            j += 1
          }
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    /** Slow path for arrays carrying null elements: per window,
      * `concatWs(" ", parts…)` (which SKIPS nulls — UTF8String semantics,
      * so "a", null, "b" joins to "a b") hashed whole — byte-identical to
      * the HashedGrams kernel on the same input.
      */
    private def computeWithNulls(
        toks: Array[org.apache.spark.unsafe.types.UTF8String]): ArrayData = {
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      ns.foreach { n =>
        val m = toks.length - n + 1
        if (m > 0) {
          val seen  = new java.util.HashSet[java.lang.Long]()
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
          var j     = 0
          while (j < m) {
            var k = 0
            while (k < n) { parts(k) = toks(j + k); k += 1 }
            val h = XXH64.hashUTF8String(
              org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), 42L)
            if (seen.add(h)) out += org.apache.spark.sql.catalyst.InternalRow(n, h)
            j += 1
          }
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("multiGramHashes", this, classOf[MultiGramHashes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): MultiGramHashes =
      copy(child = c)
  }

  /** POSITIONAL stride-1 window hashes: element i is the `xxhash64` of the
    * space-joined n-token window starting at token i (no distinct — the
    * instance-grain twin of [[HashedGrams]] for q116/q214, whose
    * ownership/coverage semantics need every window occurrence WITH its
    * position). Replaces the `transform(sequence, md5(concat_ws(slice)))`
    * spelling: the downstream shuffle/join key is an 8-byte long instead
    * of a 32-char md5 hex string (~5× less exchange volume at the
    * corpus-token grain, the suite's widest shuffle), and the slice-copy
    * per window is gone. Oracles re-derive the identical hashes via
    * [[graft.functions.DuckHash]], so the operators stay hard-verified.
    */
  case class WindowGramHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    def compute(arr: ArrayData): ArrayData = {
      val len = arr.numElements()
      val m   = len - n + 1
      if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
      val out = new Array[Long](m)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), 42L)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("windowGramHashes", this, classOf[WindowGramHashes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): WindowGramHashes =
      copy(child = c)
  }

  /** The hashed 1/2-gram DSIR feature sequence (unigrams then bigrams, in
    * token order) as one compiled call — the feature-extraction half of
    * [[DsirScore]], for paths that need the exploded features themselves
    * (the model-build aggregate, the E11 doc-order fold). Identical hashes
    * to the `transform(...pmod(xxhash64(...)))` chain it replaces.
    */
  case class HashedNgramFeats(child: Expression, buckets: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    def compute(arr: ArrayData): ArrayData = {
      val n   = arr.numElements()
      val m   = if (n >= 2) 2 * n - 1 else n
      val out = new Array[Long](m)
      def pmod(h: Long): Long = ((h % buckets) + buckets) % buckets
      var i = 0
      while (i < n) {
        out(i) = pmod(XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
        i += 1
      }
      i = 0
      while (i < n - 1) {
        out(n + i) = pmod(XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String
            .concat(arr.getUTF8String(i), sep, arr.getUTF8String(i + 1)),
          42L))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("ngramFeats", this, classOf[HashedNgramFeats].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): HashedNgramFeats =
      copy(child = c)
  }

  /** Ascending per-feature counts of the hashed 1/2-gram features —
    * shared by [[DsirScore]] and [[NBClassify]].
    */
  private val FeatSep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private[functions] def ngramFeatureCounts(
      arr: ArrayData,
      buckets: Int
  ): java.util.TreeMap[java.lang.Long, Int] = {
    val n      = arr.numElements()
    val counts = new java.util.TreeMap[java.lang.Long, Int]()
    def add(h: Long): Unit = {
      val f = ((h % buckets) + buckets) % buckets
      counts.merge(java.lang.Long.valueOf(f), 1, (a, b) => a + b)
    }
    var i = 0
    while (i < n) {
      add(XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      add(XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String
          .concat(arr.getUTF8String(i), FeatSep, arr.getUTF8String(i + 1)),
        42L))
      i += 1
    }
    counts
  }

  /** Map-side multinomial naive-Bayes classification (the q66 apply path):
    * one compiled call scores a document against every class of a
    * COLLECTED model (≤ classes × buckets rows, a reference object) and
    * returns the argmax class — fastText-style domain tagging as a pure
    * projection, the same train-distributed / apply-map-side split as
    * [[DsirScore]].
    *
    * Engine-exact by construction: model weights and priors are rounded
    * to 6 decimals BEFORE scoring (Java `log` and DuckDB `ln` differ by
    * 1 ulp on ~1 % of inputs — rounding first makes the weights
    * engine-identical, the q49 rule), scores fold ascending by feature
    * from the prior, and ties break to the lexicographically first class
    * (strict `>` over the ascending class array).
    */
  case class NBClassify(
      child: Expression,
      classes: Array[String],
      priors: Array[Double],
      weights: Map[Long, Array[Double]],
      zeroWeights: Array[Double],
      buckets: Int)
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    private lazy val classUtf8 =
      classes.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    def compute(arr: ArrayData): Any = {
      val counts = Expressions.ngramFeatureCounts(arr, buckets)
      var best   = 0
      var bestV  = Double.NegativeInfinity
      var ci     = 0
      while (ci < classes.length) {
        var score = priors(ci)
        val it    = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val w = weights.get(e.getKey.longValue()) match {
            case Some(ws) => ws(ci)
            case None     => zeroWeights(ci)
          }
          score += e.getValue.toDouble * w
        }
        if (score > bestV) { best = ci; bestV = score }
        ci += 1
      }
      classUtf8(best)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nbClassify", this, classOf[NBClassify].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.compute($c);")
    }
    // Default Expression.toString would dump the whole collected model
    // (classes × buckets weights) into every explain/plan-guard string.
    override def toString: String =
      s"nb_classify($child, classes=${classes.length}, features=${weights.size}, buckets=$buckets)"
    override protected def withNewChildInternal(c: Expression): NBClassify = copy(child = c)
  }

  /** Map-side DSIR scoring (the q57 apply path): hashed 1/2-gram features
    * + per-feature counts + the ascending-feature weighted fold, all in
    * ONE compiled call against the collected ≤B-row model (a reference
    * object — the batch form of E11's literal-map broadcast). Replaces the
    * corpus×features (doc, f) shuffle + model join + collect_list + in-row
    * sort-fold: scoring becomes a pure projection, which is the shape a
    * 100 TB apply pass needs (the model aggregate still runs distributed —
    * once, at construction).
    *
    * Arithmetic parity with the join formulation (and the oracle): feature
    * f = `pmod(xxhash64(token | tok·' '·tok), B)` via the same
    * `XXH64.hashUTF8String`; a TreeMap iterates distinct features
    * ASCENDING, adding `count · lr` per feature — the exact term order of
    * `aggregate(array_sort(fws), 0D, (a, x) -> a + x.w)`. Features absent
    * from the model contribute 0 (impossible when the model was trained on
    * a corpus containing the doc; the E11 rule otherwise).
    */
  case class DsirScore(child: Expression, model: Map[Long, Double], buckets: Int)
      extends UnaryExpression {
    import org.apache.spark.sql.types.{StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("n_feat", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    def compute(arr: ArrayData): Any = {
      val counts = Expressions.ngramFeatureCounts(arr, buckets)
      var total  = 0L
      var score  = 0.0
      val it     = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        total += e.getValue.toLong
        score += e.getValue.toDouble * model.getOrElse(e.getKey.longValue(), 0.0)
      }
      org.apache.spark.sql.catalyst.InternalRow(total, score)
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($c);")
    }
    // Same rationale as NBClassify.toString: keep the ≤B-entry model out of
    // explain output.
    override def toString: String =
      s"dsir_score($child, features=${model.size}, buckets=$buckets)"
    override protected def withNewChildInternal(c: Expression): DsirScore = copy(child = c)
  }

  /** Map-side bigram-LM cross-entropy scoring (the q68 apply path): the
    * KenLM-style quality signal — average surprisal of a document under a
    * corpus-trained hashed bigram language model — as ONE compiled call
    * against the two COLLECTED count maps (≤ buckets rows each, reference
    * objects). Same train-distributed / apply-map-side split as
    * [[DsirScore]]: at 100 TB the apply pass is a pure projection.
    *
    * Per adjacent token pair (t_i, t_{i+1}), left to right:
    * `term = r6(ln((C_bigram(f2) + 1) / (C_unigram(f1) + buckets)))` with
    * `f1 = pmod(xxhash64(t_i), buckets)`,
    * `f2 = pmod(xxhash64(t_i ⊔ ' ' ⊔ t_{i+1}), buckets)` (add-one
    * smoothing over the bucket vocabulary); output is
    * `(n_pairs, r6(−Σterms / n_pairs))`, cross-entropy in nats — lower is
    * more fluent. Terms round to 6 decimals BEFORE summing (the q49/q57
    * ln-ulp rule) and fold in position order, so the DuckDB oracle is
    * bit-exact. A document with < 2 tokens has no pairs → (0, NULL).
    */
  case class LmXent(
      child: Expression,
      bigram: Map[Long, Long],
      unigram: Map[Long, Long],
      buckets: Int)
      extends UnaryExpression {
    import org.apache.spark.sql.types.{StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("n_pairs", LongType, nullable = false),
      StructField("lm_xent", DoubleType, nullable = true)))
    private def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    private def bucketOf(h: Long): Long = ((h % buckets) + buckets) % buckets
    def compute(arr: ArrayData): Any = {
      val n  = arr.numElements()
      val np = math.max(n - 1, 0).toLong
      if (np == 0L)
        return org.apache.spark.sql.catalyst.InternalRow(0L, null)
      var sum = 0.0
      var i   = 0
      while (i < n - 1) {
        val f1 = bucketOf(XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
        val f2 = bucketOf(XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String
            .concat(arr.getUTF8String(i), FeatSep, arr.getUTF8String(i + 1)),
          42L))
        val cb = bigram.getOrElse(f2, 0L)
        val cu = unigram.getOrElse(f1, 0L)
        sum += r6(StrictMath.log((cb + 1).toDouble / (cu + buckets).toDouble))
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(np, r6(-sum / np.toDouble))
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("lmXent", this, classOf[LmXent].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($c);")
    }
    // keep the ≤2×buckets-entry model out of explain output (NBClassify rule)
    override def toString: String =
      s"lm_xent($child, bigrams=${bigram.size}, unigrams=${unigram.size}, buckets=$buckets)"
    override protected def withNewChildInternal(c: Expression): LmXent = copy(child = c)
  }

  /** Text normalization (the q93 hot path): Unicode NFC composition +
    * control-char→space replacement + space-run collapse + trim, ONE
    * compiled pass per document. Returns (clean, n_ctrl, changed_nfc).
    *
    * Op order is load-bearing for cross-engine exactness: controls
    * (`< 0x20` and DEL) become ' ' FIRST, so the collapse step only ever
    * sees runs of ASCII spaces — sidestepping the Java-`\s`-vs-RE2-`\s`
    * class divergence (\x0B is whitespace to Java, not to RE2). The
    * DuckDB oracle is `nfc_normalize` + the same two regex steps; NFC
    * itself is UAX #15, deterministic and engine-identical.
    */
  case class NormalizeText(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("clean", StringType, nullable = false),
      StructField("n_ctrl", LongType, nullable = false),
      StructField("changed_nfc", BooleanType, nullable = false)))
    def compute(input: Any): Any = {
      val raw = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
      var nCtrl = 0L
      val sb = new java.lang.StringBuilder(nfc.length)
      var pendingSpace = false
      var i = 0
      while (i < nfc.length) {
        var c = nfc.charAt(i)
        if (c < ' ' || c == '\u007f') { nCtrl += 1; c = ' ' }
        if (c == ' ') {
          if (sb.length > 0) pendingSpace = true // collapses runs, trims both ends
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
        nCtrl,
        nfc != raw)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("normalizeText", this, classOf[NormalizeText].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
  }

  /** One symbol per UTF-16 code unit — the shared base segmentation for BPE
    * training (TokenizerOps' driver loop over the ≤V-word dictionary) and
    * apply ([[BpeEncode]]'s per-row path). One definition so the two sides
    * cannot diverge; equals DuckDB's `regexp_extract_all(w, '.')` on the
    * BMP text the corpus carries.
    */
  private[graft] def charSymbols(w: String): Array[String] = {
    val out = new Array[String](w.length)
    var i   = 0
    while (i < w.length) { out(i) = String.valueOf(w.charAt(i)); i += 1 }
    out
  }

  /** One greedy left-to-right merge pass: at each site where `l` is
    * immediately followed by `r`, emit the merged symbol and skip both.
    * One pass is exhaustive for the pair: a residual adjacent (l,r) would
    * need its `l` consumed as a previous site's `r`, and the merged symbol
    * (textually l+r, r non-empty) can never equal `l` — so applying ranks
    * 1..K sequentially reproduces exhaustive-per-rank BPE segmentation.
    */
  private[graft] def bpeGreedyMerge(ss: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](ss.length)
    var i   = 0
    while (i < ss.length) {
      if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.toArray
  }

  /** Corpus-scale BPE apply (the q91 hot path): segments every word of the
    * input token array with the learned merge table and returns
    * `[n_words, n_raw_syms, n_bpe_toks]`. The merge table rides along as a
    * reference object (the NBClassify/DsirScore model-collection rule), so
    * the 100 TB pass is a pure codegen'd projection — training (q90) ran
    * its one corpus aggregate already; apply never shuffles.
    *
    * Semantics match TokenizerOps' driver loop exactly: per word, start
    * from [[Expressions.charSymbols]] and apply merges in rank order via
    * [[Expressions.bpeGreedyMerge]]. Zero-length tokens (split artifacts
    * of empty text) are skipped on both sides.
    */
  case class BpeEncode(child: Expression, lefts: Array[String], rights: Array[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(arr: ArrayData): Any = {
      var nWords = 0L
      var nRaw   = 0L
      var nBpe   = 0L
      var i      = 0
      while (i < arr.numElements()) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          nWords += 1
          var ss = charSymbols(w)
          nRaw += ss.length
          var r = 0
          while (r < lefts.length) {
            ss = bpeGreedyMerge(ss, lefts(r), rights(r))
            r += 1
          }
          nBpe += ss.length
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(nWords, nRaw, nBpe))
    }
    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
    }
    // keep the merge table out of explain output (NBClassify rule)
    override def toString: String = s"bpe_encode($child, merges=${lefts.length})"
    override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
  }

  /** Dot product of two array<double> columns, left-to-right accumulation —
    * the SAME summation order as `aggregate(zip_with(a, b, (x,y) -> x*y),
    * 0D, (acc,x) -> acc+x)`, which it replaces: Spark's higher-order
    * functions evaluate their lambdas interpreted (per element, per row),
    * while this stays inside whole-stage codegen. Identical IEEE result,
    * so the DuckDB oracles' list_reduce folds still match bit-for-bit.
    * Length mismatch folds over the common prefix.
    */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      java.lang.Double.valueOf(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i, n = ctx.freshName("v")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
           |}
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** L2 norm of an array<double> column; same fold order as
    * `sqrt(aggregate(v, 0D, (acc,x) -> acc + x*x))`.
    */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
      java.lang.Double.valueOf(math.sqrt(s))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i, s, v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  double $v = $c.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
  }

  /** Content-defined chunks of a text column (q189's kernel) as ONE
    * compiled call per row, replacing a doubly-nested higher-order
    * formulation whose lambdas Spark evaluates INTERPRETED per codepoint
    * (the same motivation as [[WinnowFps]]). Semantics are bit-identical
    * to the DuckDB oracle: over the CODEPOINT array, boundary at 1-based
    * position i ≥ 8 where `mix(Σ_{j<8} cp[i−j]·31ʲ)` has bits 20–25 zero
    * (`mix(s) = (s mod 2²⁰)·2654435761 mod 2³²`), chunks are the
    * codepoint slices between consecutive cuts 0, b₁, …, n. Exact 64-bit
    * integer arithmetic; ~64-codepoint mean chunks at the 1-in-64 rate.
    */
  case class CdcChunks(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val cp = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString.codePoints().toArray
      val n    = cp.length
      val cuts = new Array[Int](n + 2)
      var m    = 0
      cuts(m) = 0; m += 1
      var i = 8
      while (i <= n) {
        var h = 0L
        var p = 1L
        var j = 0
        while (j < 8) { h += cp(i - 1 - j).toLong * p; p *= 31L; j += 1 }
        val mix = ((h % 1048576L) * 2654435761L) % 4294967296L
        if ((mix / 1048576L) % 64L == 0L) { cuts(m) = i; m += 1 }
        i += 1
      }
      if (cuts(m - 1) != n) { cuts(m) = n; m += 1 }
      val out = new Array[org.apache.spark.unsafe.types.UTF8String](m - 1)
      var k = 0
      while (k + 1 < m) {
        out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(
          new String(cp, cuts(k), cuts(k + 1) - cuts(k)))
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        out.asInstanceOf[Array[AnyRef]])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val cp, n, cuts, m, i, h, p, j, mix, out, k = ctx.freshName("v")
        val u8 = "org.apache.spark.unsafe.types.UTF8String"
        s"""
           |int[] $cp = $c.toString().codePoints().toArray();
           |int $n = $cp.length;
           |int[] $cuts = new int[$n + 2];
           |int $m = 0;
           |$cuts[$m++] = 0;
           |for (int $i = 8; $i <= $n; $i++) {
           |  long $h = 0L; long $p = 1L;
           |  for (int $j = 0; $j < 8; $j++) { $h += (long) $cp[$i - 1 - $j] * $p; $p *= 31L; }
           |  long $mix = (($h % 1048576L) * 2654435761L) % 4294967296L;
           |  if (($mix / 1048576L) % 64L == 0L) $cuts[$m++] = $i;
           |}
           |if ($cuts[$m - 1] != $n) $cuts[$m++] = $n;
           |$u8[] $out = new $u8[$m - 1];
           |for (int $k = 0; $k + 1 < $m; $k++) {
           |  $out[$k] = $u8.fromString(new String($cp, $cuts[$k], $cuts[$k + 1] - $cuts[$k]));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): CdcChunks = copy(c)
  }

  // Column-facing wrappers
  import GraftColumnBridge.{toColumn, toExpression}

  def cdc_chunks(c: Column): Column = toColumn(CdcChunks(toExpression(c)))

  /** Bounded-heap top-k aggregate (Spark's internal `CollectTopK`,
    * surfaced as a Column): keeps the k LARGEST values of the child under
    * its type's ordering (struct children compare field by field). This is
    * an ObjectHashAggregate with PARTIAL aggregation — each map task keeps
    * ≤ k rows per group before the shuffle — which is the scale-correct
    * replacement for `row_number().over(window) <= k`: the window plan
    * shuffles the WHOLE table and sorts every partition; this shuffles at
    * most k·groups rows per map task and never sorts the corpus.
    */
  def collect_topk(c: Column, k: Int): Column =
    toColumn(
      org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
        .collectTopK(toExpression(c), k))
  def poly_fingerprint(c: Column): Column = toColumn(PolyFingerprint(toExpression(c)))
  def simhash64(c: Column): Column        = toColumn(SimHash64(toExpression(c)))
  def hyperplane_bucket(c: Column, table: Int, planes: Int): Column =
    toColumn(HyperplaneBucket(toExpression(c), table, planes))
  def rademacher_project(c: Column, table: Int, outDims: Int): Column =
    toColumn(RademacherProject(toExpression(c), table, outDims))
  def nearest_centroids(c: Column, centroids: Array[Array[Double]], n: Int): Column =
    toColumn(NearestCentroids(toExpression(c), centroids, n))
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
  def l2_norm(c: Column): Column = toColumn(L2Norm(toExpression(c)))
  def minhash_signatures(c: Column, k: Int): Column =
    toColumn(MinHashSignatures(toExpression(c), k))
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    toColumn(WinnowFps(toExpression(c), k, w))
  def top2gram_count(c: Column): Column   = toColumn(Top2GramCount(toExpression(c)))
  def int8_quant_summary(c: Column): Column = toColumn(Int8QuantSummary(toExpression(c)))
  def dsir_score(c: Column, model: Map[Long, Double], buckets: Int): Column =
    toColumn(DsirScore(toExpression(c), model, buckets))
  def lm_xent(c: Column, bigram: Map[Long, Long], unigram: Map[Long, Long], buckets: Int): Column =
    toColumn(LmXent(toExpression(c), bigram, unigram, buckets))
  def hashed_ngram_feats(c: Column, buckets: Int): Column =
    toColumn(HashedNgramFeats(toExpression(c), buckets))
  def multi_gram_hashes(c: Column, ns: Seq[Int]): Column =
    toColumn(MultiGramHashes(toExpression(c), ns))
  def hashed_grams(c: Column, n: Int): Column = toColumn(HashedGrams(toExpression(c), n))
  def window_gram_hashes(c: Column, n: Int): Column =
    toColumn(WindowGramHashes(toExpression(c), n))
  def nb_classify(
      c: Column,
      classes: Array[String],
      priors: Array[Double],
      weights: Map[Long, Array[Double]],
      zeroWeights: Array[Double],
      buckets: Int): Column =
    toColumn(NBClassify(toExpression(c), classes, priors, weights, zeroWeights, buckets))
  def bpe_encode(c: Column, lefts: Array[String], rights: Array[String]): Column =
    toColumn(BpeEncode(toExpression(c), lefts, rights))
  def normalize_text(c: Column): Column = toColumn(NormalizeText(toExpression(c)))
}
