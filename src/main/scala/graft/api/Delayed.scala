package graft.api

import java.util.concurrent.{CompletableFuture, Executor, ForkJoinPool}
import java.util.function.Supplier

/** dask `delayed` (reference `dask/delayed.py:414,673`) — a lazy
  * driver-side task DAG.  In dask, `delayed(f)(x, y)` wraps an arbitrary
  * function call as a graph node; `compute()` topologically evaluates the
  * graph, sharing each node's result across all consumers and running
  * independent nodes in parallel.
  *
  * On Spark the DATA-parallel half of that contract is already covered:
  * anything shaped like "one thunk per partition" goes through
  * `IO.fromDelayed` and runs on executors.  What remained descoped was the
  * general driver-side composition layer — stitching together *actions*
  * (counts, collected aggregates, metadata reads, writes) whose results
  * feed further local computation.  That is exactly dask's non-collection
  * `Delayed` use, and it is driver orchestration by nature: the payloads
  * are small, the parallelism worth extracting is across independent
  * Spark jobs / IO calls, and Spark's own scheduler runs concurrent jobs
  * from concurrent driver threads (FAIR/FIFO pools) — so evaluating
  * independent nodes on a thread pool gives the same overlap dask's
  * threaded scheduler provides for these graphs.
  *
  * Semantics mirrored from the reference:
  *   - laziness: nothing runs until `compute()`;
  *   - sharing: a node reachable along several paths (diamond DAG)
  *     evaluates exactly ONCE per compute() (dask keys dedupe);
  *   - parallelism: nodes with no dependency relation run concurrently;
  *   - `Delayed.computeAll(a, b, …)` evaluates several roots over the
  *     SHARED graph in one pass — the `dask.compute(a, b)` form.
  *
  * Results are NOT cached across compute() calls (matching dask, where
  * each compute re-executes unless a distributed cluster caches).
  */
sealed abstract class Delayed[+T] {

  /** dask `delayed(f)(this)` — unary derived node. */
  def map[U](f: T => U): Delayed[U] =
    Delayed.Node(Seq(this), xs => f(xs.head.asInstanceOf[T]))

  /** Pairing — the binary-function building block (`delayed(f)(a, b)`
    * is `a.zip(b).map(f.tupled)` or `Delayed.map2`).
    */
  def zip[U](other: Delayed[U]): Delayed[(T, U)] =
    Delayed.Node(Seq(this, other),
      xs => (xs(0).asInstanceOf[T], xs(1).asInstanceOf[U]))

  /** dask `.compute()` on a single root. */
  def compute(): T = Delayed.computeAll(this).head.asInstanceOf[T]
}

object Delayed {

  /** Literal leaf (dask wraps plain arguments the same way). */
  private[api] final case class Pure[T](value: T) extends Delayed[T]

  /** Function node: `fn` applied to the evaluated `deps`, in order. */
  private[api] final case class Node[T](deps: Seq[Delayed[_]],
                                        fn: Seq[Any] => T) extends Delayed[T]

  /** An already-available value — `dask.delayed` on a literal. */
  def value[T](v: T): Delayed[T] = Pure(v)

  /** A deferred computation with no dependencies — `delayed(f)()`. */
  def apply[T](f: => T): Delayed[T] = Node(Nil, _ => f)

  /** `delayed(f)(a, b)` for binary f. */
  def map2[A, B, T](a: Delayed[A], b: Delayed[B])(f: (A, B) => T): Delayed[T] =
    Node(Seq(a, b), xs => f(xs(0).asInstanceOf[A], xs(1).asInstanceOf[B]))

  /** List-of-delayed → delayed-list (dask passes lists of Delayed into
    * `delayed` functions; this is the explicit Scala form).
    */
  def sequence[T](ds: Seq[Delayed[T]]): Delayed[Seq[T]] =
    Node(ds, xs => xs.map(_.asInstanceOf[T]))

  /** Evaluate several roots over the shared graph — `dask.compute(a, b)`.
    *
    * One CompletableFuture per distinct node, memoized by node identity:
    * each future completes after its deps' futures, on a work-stealing
    * pool, so sharing and parallelism fall out of the future graph.  The
    * first node failure propagates (completes the root exceptionally)
    * without waiting for unrelated branches — dask's error contract.
    */
  def computeAll(roots: Delayed[_]*): Seq[Any] = {
    val pool: Executor = ForkJoinPool.commonPool()
    val memo = new java.util.IdentityHashMap[Delayed[_], CompletableFuture[Any]]()
    def future(d: Delayed[_]): CompletableFuture[Any] = {
      val hit = memo.get(d)
      if (hit != null) hit
      else {
        val f: CompletableFuture[Any] = d match {
          case Pure(v) => CompletableFuture.completedFuture(v: Any)
          case Node(deps, fn) =>
            val depFs = deps.map(future)
            if (depFs.isEmpty)
              CompletableFuture.supplyAsync(
                new Supplier[Any] { def get(): Any = fn(Nil) }, pool)
            else
              CompletableFuture.allOf(depFs: _*).thenApplyAsync(
                (_: Void) => fn(depFs.map(_.join())): Any, pool)
        }
        memo.put(d, f)
        f
      }
    }
    // memoization is per-compute() (a fresh map each call), so repeated
    // computes re-execute — the dask contract for the local scheduler
    val rootFs = roots.map(future)
    try rootFs.map(_.join())
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }
  }
}
