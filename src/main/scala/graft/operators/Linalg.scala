package graft.operators

import org.apache.spark.mllib.linalg.{DenseMatrix, Matrix, Vectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
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
}
