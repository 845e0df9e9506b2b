package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One chunk of a distributed ndarray: `bid` is the block coordinate in the
  * chunk grid (one entry per dimension), `data` the block's values
  * flattened in C (row-major) order.
  */
final case class ABlock(bid: Seq[Int], data: Array[Double])

/** Scatter piece shuffled between chunk grids: `offs(i)` is the C-order
  * local offset inside destination block `bid` where `vals(i)` lands.
  */
final case class ScatterPiece(key: String, bid: Seq[Int],
                              offs: Array[Int], vals: Array[Double])

/** Distributed chunked ndarray — the dask.array collection re-expressed on
  * Spark (reference: `dask/array/core.py:551` map_blocks,
  * `array/blockwise.py:17`, `array/slicing.py`, `array/rechunk.py:270`,
  * `array/reshape.py`, `array/_shuffle.py`).
  *
  * Representation: a `Dataset[ABlock]` plus driver-side metadata (`shape`,
  * and dask-style `chunks` = the list of chunk sizes along each dimension).
  * The metadata is O(grid size), never O(elements): exactly dask's split
  * between the driver-held chunk structure and worker-held block payloads.
  *
  * Movement between chunk grids (slice/rechunk/reshape/shuffle) is ONE
  * shuffle of [[ScatterPiece]] rows keyed by destination block — never a
  * driver collect, never more than one exchange per operation — so every
  * op here survives a 1000-executor scale-up: block payloads are bounded
  * by the chunk size regardless of total array length.
  */
final case class GArr(shape: Seq[Long], chunks: Seq[Seq[Int]], blocks: Dataset[ABlock]) {
  import GArr._

  def ndim: Int = shape.length
  def grid: Seq[Int] = chunks.map(_.length)
  def numElements: Long = shape.product

  private def spark: SparkSession = blocks.sparkSession

  /** dask `map_blocks` (array/core.py:551): per-block kernel, narrow (no
    * shuffle). The kernel must preserve the block's element count.
    */
  def mapBlocks(f: (Seq[Int], Array[Double]) => Array[Double]): GArr = {
    val s = spark
    import s.implicits._
    copy(blocks = blocks.map { b =>
      val out = f(b.bid, b.data)
      require(out.length == b.data.length,
        s"mapBlocks kernel changed block size ${b.data.length} -> ${out.length}")
      ABlock(b.bid, out)
    })
  }

  /** Elementwise unary map (ufunc over blocks). */
  def scalarMap(f: Double => Double): GArr =
    mapBlocks((_, d) => { val o = new Array[Double](d.length)
      var i = 0; while (i < d.length) { o(i) = f(d(i)); i += 1 }; o })

  /** dask `blockwise` in its elementwise-binary form (array/blockwise.py:17
    * with identical index strings): zip equal chunk grids block-by-block.
    * One shuffle (the block-id equi-join); with co-partitioned inputs AQE
    * keeps both sides local.
    */
  def elemwise(other: GArr)(op: (Double, Double) => Double): GArr = {
    require(shape == other.shape && chunks == other.chunks,
      s"elemwise requires identical chunk grids: $shape/$chunks vs ${other.shape}/${other.chunks}")
    val s = spark
    import s.implicits._
    val l = blocks.map(b => (keyOf(b.bid), b.bid, b.data))
    val r = other.blocks.map(b => (keyOf(b.bid), b.data))
    val joined = l.joinWith(r, l("_1") === r("_1"))
    copy(blocks = joined.map { case ((_, bid, a), (_, c)) =>
      require(a.length == c.length)
      val o = new Array[Double](a.length)
      var i = 0; while (i < a.length) { o(i) = op(a(i), c(i)); i += 1 }
      ABlock(bid, o)
    })
  }

  /** Full reduction: per-block partial (map-side), then a driver combine of
    * one scalar per block — the dask tree-reduce collapsed to two levels,
    * which is exactly what `reductions.py:70` does for `split_every=None`.
    */
  def reduceAll(zero: Double)(seqOp: (Double, Double) => Double,
                              combOp: (Double, Double) => Double): Double = {
    val s = spark
    import s.implicits._
    val partials = blocks.map { b =>
      var acc = zero; var i = 0
      while (i < b.data.length) { acc = seqOp(acc, b.data(i)); i += 1 }
      acc
    }
    partials.rdd.fold(zero)(combOp)
  }

  def sumAll: Double = reduceAll(0.0)(_ + _, _ + _)

  /** Per-block sums keyed by linear block index (C-order over the grid) —
    * the blockwise-reduction shape used by the oracle queries.
    */
  def blockSums: DataFrame = {
    val g = grid
    val s = spark
    import s.implicits._
    blocks.map { b =>
      var acc = 0.0; var i = 0
      while (i < b.data.length) { acc += b.data(i); i += 1 }
      (linearBid(b.bid, g), acc)
    }.toDF("block", "s")
  }

  /** Explode to (global C-order flat index, value) rows. */
  def toIndexedDF: DataFrame = {
    val sh = shape
    val st = chunks.map(startsOf)
    val s = spark
    import s.implicits._
    blocks.flatMap { b =>
      val nd = sh.length
      val dims = Array.tabulate(nd)(d => chunkDim(st(d), b.bid(d)))
      val gstart = Array.tabulate(nd)(d => st(d)(b.bid(d)))
      val strides = cStrides(sh)
      val out = new Array[(Long, Double)](b.data.length)
      val loc = new Array[Int](nd)
      var i = 0
      while (i < b.data.length) {
        var f = 0L
        var d = 0
        while (d < nd) { f += (gstart(d) + loc(d)) * strides(d); d += 1 }
        out(i) = (f, b.data(i))
        incOdo(loc, dims)
        i += 1
      }
      out
    }.toDF("idx", "value")
  }

  /** numpy basic slicing `[start:stop:step, ...]` (reference
    * `array/slicing.py:1-2117`, the `slice_array` path). One scatter
    * shuffle; destination chunking is rebalanced to `targetChunk` elements
    * per output dimension-chunk.
    */
  def slice(specs: Seq[(Long, Long, Long)], targetChunk: Int = 65536): GArr = {
    require(specs.length == ndim)
    val outLens = specs.zip(shape).map { case ((start, stop0, step), len) =>
      val stop = math.min(stop0, len)
      require(start >= 0 && step > 0 && start <= len, s"bad slice ($start,$stop0,$step) on dim $len")
      math.max(0L, (stop - start + step - 1) / step)
    }
    val perDimChunk = chooseChunks(outLens, targetChunk)
    regrid(specs, outLens, perDimChunk)
  }

  /** dask `rechunk` (array/rechunk.py:270): same elements, new chunk
    * boundaries. Pieces are (old-block ∩ new-block) intersections — the
    * same intermediate dask plans — moved in one shuffle.
    */
  def rechunk(newChunkSizes: Seq[Int]): GArr = {
    require(newChunkSizes.length == ndim)
    val specs = shape.map(len => (0L, len, 1L))
    val newChunks = shape.zip(newChunkSizes).map { case (l, c) => evenChunks(l, c) }
    regrid(specs, shape, newChunks)
  }

  /** Shared engine for slice+rechunk: per-dimension piece tables are built
    * on the driver (O(grid), not O(elements)), broadcast, and each source
    * block emits the cartesian product of its per-dim entries as packed
    * value pieces; one groupByKey assembles destination blocks.
    */
  private def regrid(specs: Seq[(Long, Long, Long)], outLens: Seq[Long],
                     newChunks: Seq[Seq[Int]]): GArr = {
    val s = spark
    import s.implicits._
    val nd = ndim
    val srcStarts = chunks.map(startsOf)
    val dstStarts = newChunks.map(startsOf)
    // per dim: src block -> entries (dst block, src local start, step, dst local start, count)
    val tables: Array[Map[Int, Array[DimEntry]]] = Array.tabulate(nd) { d =>
      val (start, _, step) = specs(d)
      val S = srcStarts(d); val T = dstStarts(d)
      val entries = scala.collection.mutable.ArrayBuffer[DimEntry]()
      var jb = 0
      while (jb < newChunks(d).length) {
        var ib = 0
        while (ib < chunks(d).length) {
          // output positions j whose source index start+j*step falls in src block ib
          val jLo1 = ceilDiv(S(ib) - start, step)
          val jHi1 = ceilDiv(S(ib + 1) - start, step)
          val jLo = math.max(math.max(T(jb), jLo1), 0L)
          val jHi = math.min(math.min(T(jb + 1), jHi1), outLens(d))
          if (jLo < jHi)
            entries += DimEntry(ib, jb, (start + jLo * step - S(ib)).toInt, step,
              (jLo - T(jb)).toInt, (jHi - jLo).toInt)
          ib += 1
        }
        jb += 1
      }
      entries.toArray.groupBy(_.ib)
    }
    val bc = s.sparkContext.broadcast(tables)
    val srcChunksB = chunks.map(_.toArray)
    val newChunksB = newChunks.map(_.toArray)
    val pieces: Dataset[ScatterPiece] = blocks.flatMap { b =>
      val tabs = bc.value
      val perDim: Array[Array[DimEntry]] =
        Array.tabulate(nd)(d => tabs(d).getOrElse(b.bid(d), Array.empty[DimEntry]))
      if (perDim.exists(_.isEmpty)) Iterator.empty
      else {
        val sdims = Array.tabulate(nd)(d => srcChunksB(d)(b.bid(d)))
        val sstr = cStridesI(sdims)
        val sel = new Array[Int](nd) // odometer over entry choices per dim
        val out = scala.collection.mutable.ArrayBuffer[ScatterPiece]()
        var more = true
        while (more) {
          val es = Array.tabulate(nd)(d => perDim(d)(sel(d)))
          val dstBid = es.map(_.jb).toSeq
          val ddims = Array.tabulate(nd)(d => newChunksB(d)(dstBid(d)))
          val dstr = cStridesI(ddims)
          val cnts = es.map(_.cnt)
          val total = cnts.product
          val offs = new Array[Int](total)
          val vals = new Array[Double](total)
          val t = new Array[Int](nd)
          var i = 0
          while (i < total) {
            var so = 0; var dofs = 0; var d = 0
            while (d < nd) {
              so += (es(d).src0 + t(d) * es(d).step.toInt) * sstr(d)
              dofs += (es(d).dst0 + t(d)) * dstr(d)
              d += 1
            }
            offs(i) = dofs
            vals(i) = b.data(so)
            incOdo(t, cnts)
            i += 1
          }
          out += ScatterPiece(keyOf(dstBid), dstBid, offs, vals)
          more = incOdo(sel, perDim.map(_.length))
        }
        out
      }
    }
    GArr(outLens, newChunks, assemble(pieces, newChunks))
  }

  /** C-order `reshape` (reference `array/reshape.py`): every element keeps
    * its global flat index; source blocks walk their rows (each row is
    * flat-contiguous globally) and scatter values to the destination grid
    * in one shuffle. O(1) state per element, nothing driver-side.
    */
  def reshape(newShape: Seq[Long], newChunkSizes: Seq[Int]): GArr = {
    require(newShape.product == numElements,
      s"reshape $shape -> $newShape changes element count")
    val s = spark
    import s.implicits._
    val newChunks = newShape.zip(newChunkSizes).map { case (l, c) => evenChunks(l, c) }
    val srcStarts = chunks.map(startsOf)
    val srcShape = shape
    val dstShape = newShape.toArray
    val dstStartsB = newChunks.map(startsOf).toArray
    val ndS = ndim
    val pieces: Dataset[ScatterPiece] = blocks.flatMap { b =>
      val dims = Array.tabulate(ndS)(d => chunkDim(srcStarts(d), b.bid(d)))
      val gstart = Array.tabulate(ndS)(d => srcStarts(d)(b.bid(d)))
      val sstrides = cStrides(srcShape)
      // destination walker state (advanced once per element, in flat order
      // per contiguous run)
      val walker = new FlatWalker(dstShape, dstStartsB)
      val bufs = scala.collection.mutable.LinkedHashMap[String, PieceBuf]()
      val loc = new Array[Int](ndS)
      val rowLen = if (ndS == 0) 1 else dims(ndS - 1)
      val nRows = dims.product / math.max(rowLen, 1)
      var r = 0
      var iFlatSrcRow = 0
      while (r < nRows) {
        // global flat index of the row start
        var f0 = 0L
        var d = 0
        while (d < ndS) { f0 += (gstart(d) + loc(d)) * sstrides(d); d += 1 }
        walker.seek(f0)
        var t = 0
        while (t < rowLen) {
          val buf = bufs.getOrElseUpdate(walker.bidKey,
            new PieceBuf(walker.bidSnapshot))
          buf.add(walker.localOff, b.data(iFlatSrcRow * rowLen + t))
          walker.advance()
          t += 1
        }
        // advance src odometer by one row (skip last dim)
        if (ndS >= 2) incOdo(loc, dims, ndS - 2) else loc(0) = 0
        r += 1
        iFlatSrcRow += 1
      }
      bufs.valuesIterator.map(_.toPiece)
    }
    GArr(newShape, newChunks, assemble(pieces, newChunks))
  }

  /** `transpose`/`swapaxes` (reference `array/routines.py:170-196`):
    * pure narrow map — each source block maps to exactly one destination
    * block with locally permuted data. Zero shuffle at any scale.
    */
  def transpose(perm: Seq[Int]): GArr = {
    require(perm.sorted == (0 until ndim), s"bad permutation $perm")
    val s = spark
    import s.implicits._
    val nd = ndim
    val srcStarts = chunks.map(startsOf)
    val permL = perm.toArray
    val out = blocks.map { b =>
      val sdims = Array.tabulate(nd)(d => chunkDim(srcStarts(d), b.bid(d)))
      val sstr = cStridesI(sdims)
      val ddims = Array.tabulate(nd)(j => sdims(permL(j)))
      val total = b.data.length
      val o = new Array[Double](total)
      val t = new Array[Int](nd)
      var i = 0
      while (i < total) {
        var so = 0; var j = 0
        while (j < nd) { so += t(j) * sstr(permL(j)); j += 1 }
        o(i) = b.data(so)
        incOdo(t, ddims)
        i += 1
      }
      ABlock(permL.toSeq.map(b.bid), o)
    }
    GArr(perm.map(shape), perm.map(chunks), out)
  }

  /** Reduce one axis away (sum) — the axis-reduction shape of
    * `reductions.py` specialized to sum: per-block partial along `axis`
    * (map-side), then one shuffle keyed by the remaining block coords.
    */
  def sumAxis(axis: Int): GArr = {
    require(ndim >= 1 && axis >= 0 && axis < ndim)
    val s = spark
    import s.implicits._
    val nd = ndim
    val srcStarts = chunks.map(startsOf)
    val partials = blocks.map { b =>
      val sdims = Array.tabulate(nd)(d => chunkDim(srcStarts(d), b.bid(d)))
      val restDims = Array.tabulate(nd - 1)(j => sdims(if (j < axis) j else j + 1))
      val restTotal = if (restDims.isEmpty) 1 else restDims.product
      val acc = new Array[Double](restTotal)
      val t = new Array[Int](nd)
      val rstr = cStridesI(restDims)
      var i = 0
      while (i < b.data.length) {
        var ro = 0; var j = 0; var k = 0
        while (j < nd) { if (j != axis) { ro += t(j) * rstr(k); k += 1 }; j += 1 }
        acc(ro) += b.data(i)
        incOdo(t, sdims)
        i += 1
      }
      val restBid = (0 until nd).filter(_ != axis).map(b.bid)
      (keyOf(restBid), restBid, acc)
    }
    val reduced = partials.groupByKey(_._1).mapGroups { (_, it) =>
      val first = it.next()
      val acc = first._3.clone()
      it.foreach { p => var i = 0; while (i < acc.length) { acc(i) += p._3(i); i += 1 } }
      ABlock(first._2, acc)
    }
    GArr((0 until nd).filter(_ != axis).map(shape),
      (0 until nd).filter(_ != axis).map(chunks), reduced)
  }

  /** dask array shuffle (`array/_shuffle.py:1-328`): regroup indices along
    * `axis` into new chunks given explicit index groups (the indexer is
    * driver-provided, exactly as in the reference API). Elements route to
    * (group chunk, position-in-group) in one scatter shuffle; duplicate
    * source indices are allowed (take semantics), omitted ones drop.
    */
  def shuffleAxis(axis: Int, groups: Seq[Seq[Long]]): GArr = {
    val s = spark
    import s.implicits._
    val nd = ndim
    val srcStarts = chunks.map(startsOf)
    // srcIdx -> targets (dstChunk, dstOffset)
    val routing: Map[Long, Array[(Int, Int)]] = {
      val m = scala.collection.mutable.HashMap[Long, List[(Int, Int)]]()
      groups.zipWithIndex.foreach { case (g, gi) =>
        g.zipWithIndex.foreach { case (src, off) =>
          m(src) = (gi, off) :: m.getOrElse(src, Nil)
        }
      }
      m.map { case (k, v) => (k, v.toArray) }.toMap
    }
    val bc = s.sparkContext.broadcast(routing)
    val newAxisChunks = groups.map(_.size)
    val newChunks = chunks.updated(axis, newAxisChunks)
    val newShape = shape.updated(axis, groups.map(_.size.toLong).sum)
    val dstStartsB = newChunks.map(startsOf)
    val pieces: Dataset[ScatterPiece] = blocks.flatMap { b =>
      val route = bc.value
      val sdims = Array.tabulate(nd)(d => chunkDim(srcStarts(d), b.bid(d)))
      val gstartAxis = srcStarts(axis)(b.bid(axis))
      val bufs = scala.collection.mutable.LinkedHashMap[String, PieceBuf]()
      val t = new Array[Int](nd)
      var i = 0
      while (i < b.data.length) {
        val srcAxisIdx = gstartAxis + t(axis)
        route.get(srcAxisIdx) match {
          case Some(targets) =>
            var ti = 0
            while (ti < targets.length) {
              val (gi, off) = targets(ti)
              val dstBid = b.bid.updated(axis, gi)
              val ddims = Array.tabulate(nd)(d =>
                if (d == axis) newAxisChunks(gi) else sdims(d))
              val dstr = cStridesI(ddims)
              var dofs = 0; var d = 0
              while (d < nd) { dofs += (if (d == axis) off else t(d)) * dstr(d); d += 1 }
              bufs.getOrElseUpdate(keyOf(dstBid), new PieceBuf(dstBid))
                .add(dofs, b.data(i))
              ti += 1
            }
          case None =>
        }
        incOdo(t, sdims)
        i += 1
      }
      bufs.valuesIterator.map(_.toPiece)
    }
    GArr(newShape, newChunks, assemble(pieces, newChunks))
  }

  /** `apply_gufunc` with signature `(i)->(j)` over the last axis
    * (reference `array/gufunc.py:819`): the core dimension must be
    * single-chunk (dask has the same constraint — core dims cannot be
    * chunked), loop dims stay chunked and parallel. Narrow, no shuffle.
    */
  def applyGufunc(coreOut: Int)(f: Array[Double] => Array[Double]): GArr = {
    require(chunks.last.length == 1, "gufunc core dimension must be single-chunk")
    val s = spark
    import s.implicits._
    val coreIn = shape.last.toInt
    val out = blocks.map { b =>
      val nRows = b.data.length / coreIn
      val o = new Array[Double](nRows * coreOut)
      val row = new Array[Double](coreIn)
      var r = 0
      while (r < nRows) {
        System.arraycopy(b.data, r * coreIn, row, 0, coreIn)
        val res = f(row)
        require(res.length == coreOut, s"gufunc kernel returned ${res.length}, declared $coreOut")
        System.arraycopy(res, 0, o, r * coreOut, coreOut)
        r += 1
      }
      ABlock(b.bid, o)
    }
    GArr(shape.init :+ coreOut.toLong, chunks.init :+ Seq(coreOut), out)
  }

  /** Assemble scatter pieces into destination blocks (the single shuffle
    * of every grid-changing op). Destination cells not covered by any
    * piece are 0.0 — slice/rechunk/reshape cover every cell by
    * construction, shuffleAxis covers every cell of every group.
    */
  private def assemble(pieces: Dataset[ScatterPiece],
                       newChunks: Seq[Seq[Int]]): Dataset[ABlock] = {
    val s = spark
    import s.implicits._
    val ncB = newChunks.map(_.toArray)
    pieces.groupByKey(_.key).mapGroups { (_, it) =>
      val first = it.next()
      val bid = first.bid
      val dims = Array.tabulate(bid.length)(d => ncB(d)(bid(d)))
      val buf = new Array[Double](math.max(dims.product, 1))
      def put(p: ScatterPiece): Unit = {
        var i = 0
        while (i < p.offs.length) { buf(p.offs(i)) = p.vals(i); i += 1 }
      }
      put(first); it.foreach(put)
      ABlock(bid, buf)
    }
  }
}

object GArr {
  private[operators] final case class DimEntry(ib: Int, jb: Int, src0: Int,
                                               step: Long, dst0: Int, cnt: Int)

  /** Growable per-destination-block scatter buffer. */
  private[operators] final class PieceBuf(val bid: Seq[Int]) {
    private val offs = scala.collection.mutable.ArrayBuilder.make[Int]
    private val vals = scala.collection.mutable.ArrayBuilder.make[Double]
    def add(off: Int, v: Double): Unit = { offs += off; vals += v }
    def toPiece: ScatterPiece = ScatterPiece(keyOf(bid), bid, offs.result(), vals.result())
  }

  /** Incremental C-order walker over a chunked grid: tracks, for a global
    * flat index advanced one element at a time, the destination block id
    * and the local offset inside it — O(1) amortized per step, O(ndim) on
    * row/chunk carries. Used by reshape's scatter side.
    */
  private[operators] final class FlatWalker(shape: Array[Long],
                                            starts: Array[Array[Long]]) {
    private val nd = shape.length
    private val coord = new Array[Long](nd)
    private val chunkIdx = new Array[Int](nd)
    private val local = new Array[Int](nd)
    private var key: String = _
    private var bid: Seq[Int] = _
    private var dirty = true

    def seek(flat: Long): Unit = {
      var rem = flat
      var d = nd - 1
      while (d >= 0) {
        coord(d) = rem % shape(d); rem /= shape(d)
        val ci = chunkOf(starts(d), coord(d))
        chunkIdx(d) = ci
        local(d) = (coord(d) - starts(d)(ci)).toInt
        d -= 1
      }
      dirty = true
    }

    def advance(): Unit = {
      var d = nd - 1
      var carry = true
      while (carry && d >= 0) {
        coord(d) += 1
        if (coord(d) == shape(d)) {
          coord(d) = 0; chunkIdx(d) = 0; local(d) = 0
          d -= 1
        } else {
          local(d) += 1
          if (starts(d)(chunkIdx(d) + 1) == coord(d)) {
            chunkIdx(d) += 1; local(d) = 0; dirty = true
          }
          carry = false
        }
      }
      if (d != nd - 1) dirty = true // crossed a row boundary: bid may change
    }

    private def refresh(): Unit = {
      bid = chunkIdx.toSeq
      key = keyOf(bid)
      dirty = false
    }
    def bidKey: String = { if (dirty) refresh(); key }
    def bidSnapshot: Seq[Int] = { if (dirty) refresh(); bid }
    def localOff: Int = {
      var o = 0; var d = 0
      while (d < nd) {
        val dim = (starts(d)(chunkIdx(d) + 1) - starts(d)(chunkIdx(d))).toInt
        o = o * dim + local(d)
        d += 1
      }
      o
    }
  }

  private[operators] def keyOf(bid: Seq[Int]): String = bid.mkString(",")

  private[operators] def linearBid(bid: Seq[Int], grid: Seq[Int]): Int = {
    var o = 0; var d = 0
    while (d < bid.length) { o = o * grid(d) + bid(d); d += 1 }
    o
  }

  private[operators] def startsOf(cs: Seq[Int]): Array[Long] =
    cs.scanLeft(0L)(_ + _).toArray

  private[operators] def chunkDim(starts: Array[Long], i: Int): Int =
    (starts(i + 1) - starts(i)).toInt

  private[operators] def chunkOf(starts: Array[Long], coord: Long): Int = {
    var lo = 0; var hi = starts.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= coord) lo = mid else hi = mid - 1
    }
    lo
  }

  private[operators] def cStrides(shape: Seq[Long]): Array[Long] = {
    val nd = shape.length
    val st = new Array[Long](nd)
    var acc = 1L
    var d = nd - 1
    while (d >= 0) { st(d) = acc; acc *= shape(d); d -= 1 }
    st
  }

  private[operators] def cStridesI(dims: Array[Int]): Array[Int] = {
    val nd = dims.length
    val st = new Array[Int](nd)
    var acc = 1
    var d = nd - 1
    while (d >= 0) { st(d) = acc; acc *= dims(d); d -= 1 }
    st
  }

  /** Advance a C-order odometer over `dims(0..maxDim)`; returns false on
    * wrap-around (= iteration complete).
    */
  private[operators] def incOdo(t: Array[Int], dims: Array[Int],
                                maxDim: Int = -1): Boolean = {
    var d = if (maxDim >= 0) maxDim else t.length - 1
    while (d >= 0) {
      t(d) += 1
      if (t(d) < dims(d)) return true
      t(d) = 0
      d -= 1
    }
    false
  }

  private[operators] def ceilDiv(a: Long, b: Long): Long =
    if (a >= 0) (a + b - 1) / b else -((-a) / b)

  def evenChunks(len: Long, chunk: Int): Seq[Int] = {
    require(len >= 0 && chunk > 0)
    if (len == 0) Seq(0)
    else {
      val n = ((len + chunk - 1) / chunk).toInt
      (0 until n).map(i => math.min(chunk.toLong, len - i.toLong * chunk).toInt)
    }
  }

  private def chooseChunks(lens: Seq[Long], targetChunk: Int): Seq[Seq[Int]] =
    lens.map(l => evenChunks(l, math.max(1, targetChunk)))

  /** 1-D array from a DataFrame column in a caller-defined total order —
    * the `from_dask_dataframe`/`Series.values` bridge. Distributed sort +
    * zipWithIndex (no single-partition window), then one groupBy to pack
    * blocks; the separate metadata `count()` is a parquet-metadata read.
    */
  def fromColumn(df: DataFrame, valueCol: String, orderBy: Seq[String],
                 chunk: Int): GArr = {
    import org.apache.spark.sql.functions.col
    val s = df.sparkSession
    import s.implicits._
    val n = df.count()
    val cs = evenChunks(n, chunk)
    val sorted = df
      .select((orderBy :+ valueCol).map(col): _*)
      .sort(orderBy.map(col): _*)
      .select(col(valueCol).cast("double"))
    val sizes = s.sparkContext.broadcast(cs.toArray)
    val packed = sorted.rdd.map(_.getDouble(0)).zipWithIndex()
      .map { case (v, i) => ((i / chunk).toInt, ((i % chunk).toInt, v)) }
      .groupByKey()
      .map { case (b, it) =>
        val a = new Array[Double](sizes.value(b))
        it.foreach { case (o, v) => a(o) = v }
        ABlock(Seq(b), a)
      }
    GArr(Seq(n), Seq(cs), s.createDataset(packed))
  }

  /** Build from a coordinate function — `fromfunction`/`arange`-style
    * construction (reference `array/creation.py:306`), parallel over the
    * block grid.
    */
  def fromFunction(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int])
                  (f: Array[Long] => Double): GArr = {
    import s.implicits._
    val chunks = shape.zip(chunkSizes).map { case (l, c) => evenChunks(l, c) }
    val grid = chunks.map(_.length)
    val nb = grid.map(_.toLong).product
    val starts = chunks.map(startsOf)
    val nd = shape.length
    val ds = s.range(nb).map { flat: java.lang.Long =>
      val bid = new Array[Int](nd)
      var rem = flat.longValue
      var d = nd - 1
      while (d >= 0) { bid(d) = (rem % grid(d)).toInt; rem /= grid(d); d -= 1 }
      val dims = Array.tabulate(nd)(d => chunkDim(starts(d), bid(d)))
      val gstart = Array.tabulate(nd)(d => starts(d)(bid(d)))
      val total = dims.product
      val data = new Array[Double](total)
      val t = new Array[Int](nd)
      val g = new Array[Long](nd)
      var i = 0
      while (i < total) {
        var d2 = 0
        while (d2 < nd) { g(d2) = gstart(d2) + t(d2); d2 += 1 }
        data(i) = f(g)
        incOdo(t, dims)
        i += 1
      }
      ABlock(bid.toSeq, data)
    }
    GArr(shape, chunks, ds)
  }

}
