package graft.operators

import org.apache.spark.mllib.linalg.{DenseMatrix, Matrix, Vectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra for the array module's linalg family
  * (SURVEY §2.11): tall-skinny QR (`dask/array/linalg.py:60` `tsqr`), SVD
  * (`:874`), and gram/covariance products — mapped onto Spark ML's
  * `RowMatrix`, whose `tallSkinnyQR` IS the tsqr algorithm (tree of
  * local QRs) and whose `computeSVD` runs the same
  * gramian-eigendecomposition the reference's `svd_compressed` family
  * approximates. Generic ndarray slicing/rechunk/fft stay descoped
  * (SURVEY §7.4).
  *
  * Input: a DataFrame with an `Array[Float|Double]` vector column — the
  * same shape as the `embeddings` fixture — so the linalg surface
  * composes with the similarity/dedup pipeline (PCA-whitening before ANN,
  * etc.).
  */
object Linalg {

  /** Rows of `vecCol` as an mllib RowMatrix (row order is not tracked —
    * matches dask arrays, where row blocks are unordered across chunks
    * for these reductions).
    */
  def rowMatrix(df: DataFrame, vecCol: String): RowMatrix = {
    val rows: RDD[org.apache.spark.mllib.linalg.Vector] = df
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .rdd.map(r => Vectors.dense(r.getSeq[Double](0).toArray))
    new RowMatrix(rows)
  }

  /** Tall-skinny QR: returns R (k×k, driver-side) — `tsqr`'s reduced
    * factor. Q is distributed; R is the small dense triangle.
    */
  def tsqrR(df: DataFrame, vecCol: String): Matrix =
    rowMatrix(df, vecCol).tallSkinnyQR(computeQ = false).R

  /** Top-k singular values (driver-side k-vector). */
  def singularValues(df: DataFrame, vecCol: String, k: Int): Array[Double] =
    rowMatrix(df, vecCol).computeSVD(k, computeU = false).s.toArray

  /** Gramian Aᵀ·A (k×k) — one distributed pass; the building block of
    * covariance and of the reference's `da.dot(x.T, x)` pattern.
    */
  def gramian(df: DataFrame, vecCol: String): Matrix =
    rowMatrix(df, vecCol).computeGramianMatrix()

  /** Principal components (k×p, driver-side) — dimensionality reduction
    * for the embedding pipeline.
    */
  def principalComponents(df: DataFrame, vecCol: String, k: Int): DenseMatrix =
    rowMatrix(df, vecCol).computePrincipalComponents(k).asInstanceOf[DenseMatrix]

  /** Randomized (compressed) SVD — the reference's `svd_compressed`
    * (`dask/array/linalg.py:746`, Halko/Martinsson/Tropp 2011): project A
    * (n×p) onto a random range sketch, orthonormalize, and take the SVD
    * of the small projected factor.
    *
    * Distributed shape (all driver-side matrices are ≤ p×(k+oversample)):
    *   1. Ω (p×l, l = k+oversample) — deterministic seeded gaussian from
    *      `Hashing.mix64`, generated identically on every executor (no
    *      broadcast of randomness needed, mirrors RandomData's portable
    *      generator);
    *   2. Y = A·Ω via `RowMatrix.multiply` — one narrow map over rows;
    *   3. R = tsqr(Y) (tree of local QRs), B = (Y·R⁻¹)ᵀA computed as a
    *      single gramian-style pass: Bᵀ = AᵀY·R⁻ᵀ, where AᵀY (p×l) is one
    *      `treeAggregate` outer-product pass;
    *   4. SVD of the l×p matrix Bᵀ on the driver (tiny), singular values
    *      of B ≈ top singular values of A.
    *
    * Two distributed passes total, each narrow; nothing larger than p×l
    * ever leaves the executors.  Power iterations (`q`) re-multiply
    * through A twice per iteration to sharpen the spectrum, exactly as
    * the reference's `power_iteration_algorithm='power'` path does.
    */
  def svdCompressed(df: DataFrame, vecCol: String, k: Int,
                    oversample: Int = 10, powerIters: Int = 0,
                    seed: Long = 42L): Array[Double] = {
    import graft.functions.Hashing.mix64
    val mat = rowMatrix(df, vecCol)
    mat.rows.cache()
    try {
      val p = mat.numCols().toInt
      val l = math.min(k + oversample, p)
      // deterministic gaussian sketch: Box–Muller over mix64 uniforms
      def gauss(i: Int, j: Int): Double = {
        val h1 = mix64(seed ^ (i.toLong << 32) ^ j.toLong)
        val h2 = mix64(h1 ^ 0x9e3779b97f4a7c15L)
        val u1 = ((h1 >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        val u2 = ((h2 >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
      val omega = new DenseMatrix(p, l,
        Array.tabulate(p * l) { idx => gauss(idx % p, idx / p) }) // column-major
      var y = mat.multiply(omega) // n×l, narrow map
      // power iterations: Y ← A·(Aᵀ·Y), each Aᵀ·Y a treeAggregate pass.
      // Re-orthonormalize Y between iterations (Q of its tsqr): without
      // it, components along trailing singular directions shrink by
      // (σᵢ/σ₁)^(2q) and drop below double precision for ill-conditioned
      // inputs — the same per-iteration QR sklearn's randomized_svd and
      // the reference's compression_matrix insert.
      // rank-deficient input makes R singular and tallSkinnyQR's inv(R)
      // throw; stop iterating there and let the collapsed-pivot truncation
      // below absorb the deficiency — the same graceful degradation the
      // powerIters = 0 path already has on identical input.
      var degenerate = false
      for (_ <- 0 until powerIters if !degenerate) {
        try {
          val q = y.tallSkinnyQR(computeQ = true).Q
          val aty = atB(mat, q, l) // p×l driver-side
          y = mat.multiply(new DenseMatrix(p, l, aty))
        } catch {
          case _: breeze.linalg.MatrixSingularException => degenerate = true
        }
      }
      // orthonormalize the sketch: Q·R = Y; then B = Qᵀ·A and
      // svd(B).s ≈ svd(A).s[0..l). Compute Bᵀ = (AᵀY)·R⁻ᵀ (p×l, driver).
      val r = y.tallSkinnyQR(computeQ = false).R.toArray // l×l col-major
      // rank-truncate: a rank-deficient sketch (input rank < l) leaves
      // near-zero trailing R diagonal entries; solving through them would
      // amplify fp noise into spurious singular values. With a random Ω
      // the leading columns are generically well-conditioned, so cut at
      // the first collapsed pivot.
      val maxDiag = (0 until l).map(j => math.abs(r(j * l + j))).max
      // an all-zero sketch means A itself is (numerically) zero: its
      // spectrum is zero — solving through a zero pivot would yield NaNs
      if (maxDiag == 0.0) return Array.fill(k)(0.0)
      val leff0 = (0 until l).indexWhere(j => math.abs(r(j * l + j)) <= maxDiag * 1e-12)
      val leff = if (leff0 < 0) l else math.max(leff0, 1)
      val atYArr = atB(mat, y, l) // p×l col-major
      val bt = solveRt(atYArr, r, p, l, leff) // Bᵀ = AᵀY · R⁻¹ (right-solve)
      // singular values of Bᵀ (p×leff) == singular values of B
      val btm = breeze.linalg.DenseMatrix.create(p, leff, bt.take(p * leff))
      val svs = breeze.linalg.svd(btm).S.toArray
      (svs ++ Array.fill(math.max(0, k - svs.length))(0.0)).take(k)
    } finally { mat.rows.unpersist(false) }
  }

  /** Cholesky factor L (p×p, lower-triangular, driver-side) of the
    * distributed gramian AᵀA — the reference's `cholesky`
    * (`dask/array/linalg.py:1295`) in the shape a tall-skinny engine
    * meets: the distributed pass is the gramian; the factorization of
    * the small p×p result is driver arithmetic.
    */
  def choleskyGram(df: DataFrame, vecCol: String): breeze.linalg.DenseMatrix[Double] = {
    val g = gramian(df, vecCol)
    val m = breeze.linalg.DenseMatrix.create(g.numRows, g.numCols, g.toArray)
    breeze.linalg.cholesky(m)
  }

  /** Solve (AᵀA)·x = b for a driver-side right-hand side — the
    * reference's `solve` (`dask/array/linalg.py:1114`) on the normal
    * matrix: one distributed gramian pass + a p×p driver solve.
    */
  def solveGram(df: DataFrame, vecCol: String, b: Array[Double]): Array[Double] = {
    val g = gramian(df, vecCol)
    require(b.length == g.numCols, s"rhs length ${b.length} != ${g.numCols}")
    val m = breeze.linalg.DenseMatrix.create(g.numRows, g.numCols, g.toArray)
    (m \ breeze.linalg.DenseVector(b)).toArray
  }

  /** Distributed ordinary least squares — the reference's `lstsq`/`solve`
    * family (`dask/array/linalg.py:1114-1476`) for the tall-skinny case
    * that a query engine actually meets: A is n×p with p small (features),
    * n huge (rows).
    *
    * One `treeAggregate` pass accumulates the normal equations AᵀA (p×p)
    * and Aᵀy (p); the driver solves the p×p system with a breeze
    * Cholesky/LU (`\`), falling back to the pseudo-inverse (min-norm
    * solution, the numpy/dask lstsq contract) when the design is
    * rank-deficient.  Nothing proportional to n ever reaches the driver,
    * and the single pass is narrow — the same shape dask's lstsq lowers
    * to (tsqr + small solve).  `intercept=true` appends a constant
    * feature and returns it FIRST in the coefficient array.
    *
    * Rows with a null y, a null vector, or any null element are DROPPED
    * (pandas-dropna semantics) — both physical paths agree; without the
    * filter, independent per-aggregate null-skipping would build AᵀA and
    * Aᵀy over different row subsets.  NaN propagates (NaN in → NaN β).
    *
    * `exactIntegral=true` (small-p path only): features and y are
    * integer-valued, so every normal-equation term is an exact integer —
    * accumulate them as BIGINTs.  Long sums are order-independent: any
    * partitioning or combine order yields bit-identical AᵀA/Aᵀy, which is
    * what makes β reproducible at any scale (float sums drift with n).
    * Caller contract: per-row products must stay within 2⁵³ (they are
    * formed as doubles before the cast) and totals within 2⁶³.
    */
  def lstsq(df: DataFrame, vecCol: String, yCol: String,
            intercept: Boolean = true,
            exactIntegral: Boolean = false): Array[Double] = {
    // dimension probe must skip null vectors (a null in the first row is
    // data, not an error) — the null-aware filter below drops them anyway
    val probe = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head(1)
    require(probe.nonEmpty, "lstsq: no non-null vectors in input")
    val p0 = probe(0).getInt(0)
    val p = if (intercept) p0 + 1 else p0
    val clean = df.filter(
      col(yCol).isNotNull && col(vecCol).isNotNull &&
        !exists(col(vecCol), _.isNull))
    // fixed-dim contract: every vector must match the probed length —
    // element_at past the end is NULL (silently skipped per-aggregate) and
    // the wide path would index out of bounds; fail fast instead. The
    // check rides the same single pass (two extra agg slots / one require
    // in the row map), so it costs no additional job.
    def jaggedMsg(sz: Any): String =
      s"lstsq: vector length $sz != probed dimension $p0 (fixed-dim contract)"
    val (ataArr, atyArr) =
      if (p <= 24) {
        // small-p fast path: the normal equations are p(p+1)/2 + p plain
        // sum() aggregates over element_at terms — fully codegen'd, fuses
        // into the scan (one partial→final agg, no Row deserialization)
        def feat(i: Int): Column =
          if (intercept && i == 0) lit(1.0)
          else element_at(col(vecCol), i + (if (intercept) 0 else 1)).cast("double")
        val y = col(yCol).cast("double")
        def s(term: Column): Column =
          if (exactIntegral) sum(term.cast("long")) else sum(term)
        val upper = for (j <- 0 until p; i <- 0 to j)
          yield s(feat(i) * feat(j)).as(s"g_${i}_$j")
        val rhs = (0 until p).map(i => s(feat(i) * y).as(s"b_$i"))
        val guards = Seq(count(lit(1)).as("__n"),
          min(size(col(vecCol))).as("__mn"), max(size(col(vecCol))).as("__mx"))
        val cols = upper ++ rhs ++ guards
        val row = clean.agg(cols.head, cols.tail: _*).first()
        val nIdx = upper.size + rhs.size
        require(row.getLong(nIdx) > 0,
          "lstsq: no rows remain after dropping null y/vector rows")
        if (row.getInt(nIdx + 1) != p0 || row.getInt(nIdx + 2) != p0)
          throw new IllegalArgumentException(
            jaggedMsg(s"[${row.getInt(nIdx + 1)}..${row.getInt(nIdx + 2)}]"))
        def v(i: Int): Double = row.get(i).asInstanceOf[Number].doubleValue()
        val ata = new Array[Double](p * p)
        var idx = 0
        for (j <- 0 until p; i <- 0 to j) {
          ata(j * p + i) = v(idx); ata(i * p + j) = v(idx)
          idx += 1
        }
        (ata, (0 until p).map(i => v(idx + i)).toArray)
      } else {
        // wide-feature path: one treeAggregate of per-row outer products
        val rows = clean
          .select(transform(col(vecCol), _.cast("double")).as("v"),
            col(yCol).cast("double").as("y"))
          .rdd.map { r =>
            val v = r.getSeq[Double](0)
            if (v.length != p0) throw new IllegalArgumentException(jaggedMsg(v.length))
            (v.toArray, r.getDouble(1))
          }
        // acc layout: [AᵀA p×p col-major | Aᵀy p | row count]
        val acc = rows.treeAggregate(new Array[Double](p * p + p + 1))(
          seqOp = { (a, row) =>
            val x = if (intercept) 1.0 +: row._1 else row._1
            var j = 0
            while (j < p) {
              val xj = x(j); var i = 0
              while (i < p) { a(j * p + i) += x(i) * xj; i += 1 }
              a(p * p + j) += xj * row._2
              j += 1
            }
            a(p * p + p) += 1.0
            a
          },
          combOp = { (a, b) =>
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
        require(acc(p * p + p) > 0,
          "lstsq: no rows remain after dropping null y/vector rows")
        (acc.take(p * p), acc.slice(p * p, p * p + p))
      }
    val ata = breeze.linalg.DenseMatrix.create(p, p, ataArr)
    val aty = breeze.linalg.DenseVector(atyArr)
    // Solve via a truncated-SVD pseudo-inverse unconditionally:
    // rank-deficient designs (constant column + intercept, collinear
    // features) make AᵀA singular, and LU "succeeds" with garbage there —
    // fp elimination leaves a ~1e-15 pivot instead of a detectable zero
    // (breeze pinv's default tolerance keeps that junk value too).
    // Singular directions below 1e-12·σmax are fp noise on AᵀA (junk sits
    // at ~eps·σmax ≈ 1e-16); dropping them yields the min-norm solution,
    // the np.linalg.lstsq contract.  SVD of p×p is driver-trivial.
    val dec = breeze.linalg.svd(ata)
    val smax = if (dec.S.length == 0) 0.0 else breeze.linalg.max(dec.S)
    val tol = smax * 1e-12
    val utb = dec.U.t * aty
    val coef = breeze.linalg.DenseVector.tabulate(p)(i =>
      if (dec.S(i) > tol) utb(i) / dec.S(i) else 0.0)
    (dec.Vt.t * coef).toArray
  }

  /** AᵀY as one treeAggregate of per-row outer products (p×l col-major). */
  private def atB(a: RowMatrix, y: RowMatrix, l: Int): Array[Double] = {
    val p = a.numCols().toInt
    val zipped = a.rows.zip(y.rows)
    zipped.treeAggregate(new Array[Double](p * l))(
      seqOp = { (acc, rowPair) =>
        val av = rowPair._1.toArray; val yv = rowPair._2.toArray
        var j = 0
        while (j < l) {
          val yj = yv(j); var i = 0
          while (i < p) { acc(j * p + i) += av(i) * yj; i += 1 }
          j += 1
        }
        acc
      },
      combOp = { (x, z) => var i = 0; while (i < x.length) { x(i) += z(i); i += 1 }; x })
  }

  /** X · R⁻¹ for upper-triangular R (l×l), X is p×l col-major; only the
    * leading `leff` columns are solved (rank truncation).
    */
  private def solveRt(x: Array[Double], rColMajor: Array[Double],
                      p: Int, l: Int, leff: Int): Array[Double] = {
    val out = x.clone()
    // forward column sweep: col j of X·R⁻¹ = (X_j − Σ_{m<j} out_m·R(m,j)) / R(j,j)
    var j = 0
    while (j < leff) {
      var m = 0
      while (m < j) {
        val rmj = rColMajor(j * l + m)
        if (rmj != 0.0) {
          var i = 0
          while (i < p) { out(j * p + i) -= out(m * p + i) * rmj; i += 1 }
        }
        m += 1
      }
      val rjj = rColMajor(j * l + j)
      var i = 0
      while (i < p) { out(j * p + i) /= rjj; i += 1 }
      j += 1
    }
    out
  }
}
