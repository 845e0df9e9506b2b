package graft.sources

import org.apache.spark.sql.SparkSession

import graft.operators.{ABlock, GArr, Multimodal}

/** dask `array/image.py` imread: a sorted glob of image files becomes one
  * chunked array with a new leading file axis — one block per file, decoded
  * executor-side.
  *
  * Shape discovery mirrors the reference (image.py:50-57: `sorted(glob(…))`
  * then a driver-side sample decode of the FIRST file for dtype/shape); the
  * driver never touches the other files' pixel bytes. Per-file decode runs
  * in the tasks, `npartitions ≈ nfiles` exactly like the reference's
  * one-delayed-per-file graph.
  *
  * The in-container codec is the 24-bit BMP parser ([[Multimodal
  * .decodeBmp24]] — the real, tested byte-level decoder this repo's
  * multimodal tier uses; PNG/JPEG libs are not available here, so BMP is
  * the format the pipeline standardizes on). Output shape: (nfiles, h, w,
  * 3), values 0–255.
  */
object Images {

  def imreadBmp(s: SparkSession, pattern: String): GArr = {
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    val pat = new org.apache.hadoop.fs.Path(pattern)
    val fs = pat.getFileSystem(conf)
    val statuses = Option(fs.globStatus(pat)).getOrElse(Array.empty)
    require(statuses.nonEmpty, s"imread: no files match $pattern")
    val paths = statuses.map(_.getPath.toString).sorted.toSeq
    // one driver-side sample decode for the grid metadata (dask reads the
    // first file the same way; O(1 file), not O(n))
    val (w, h, _) = Multimodal.decodeBmp24(readAll(fs, paths.head))
    val n = paths.length
    val kvs = IO.hadoopConfKVs(s)
    val blocks = s.createDataset(paths.zipWithIndex).repartition(
      math.min(n, s.sparkContext.defaultParallelism)).mapPartitions { it =>
      val c = IO.rebuildConf(kvs)
      it.map { case (path, i) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val pfs = p.getFileSystem(c)
        val len = pfs.getFileStatus(p).getLen.toInt
        val bytes = new Array[Byte](len)
        val in = pfs.open(p)
        try in.readFully(0, bytes) finally in.close()
        val (fw, fh, rgb) = Multimodal.decodeBmp24(bytes)
        require(fw == w && fh == h,
          s"imread: $path is ${fw}x$fh, expected ${w}x$h (stack must be uniform)")
        val data = new Array[Double](rgb.length)
        var j = 0
        while (j < rgb.length) { data(j) = (rgb(j) & 0xff).toDouble; j += 1 }
        ABlock(Seq(i, 0, 0, 0), data)
      }
    }
    GArr(Seq(n.toLong, h.toLong, w.toLong, 3L),
      Seq(Seq.fill(n)(1), Seq(h), Seq(w), Seq(3)), blocks)
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
                      path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }
}
