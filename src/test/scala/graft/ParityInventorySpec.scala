package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parity-inventory drift guard: walks the reference's PUBLIC API export
  * lists — `dask/array/__init__.py` module exports, the
  * `dask_expr/_collection.py` DataFrame/Series/FrameBase method surface,
  * and `dask/bag` (core.py Bag methods + package exports + random.py) —
  * and asserts every name appears in the committed manifest
  * (`src/test/resources/parity_manifest.tsv`) as either an implemented
  * symbol (kind `map`/`class`, REFLECTION-CHECKED against the compiled
  * classes so a rename breaks the build), a Spark-native mechanism with a
  * recipe (`builtin`), or an explicit descope with a reason (`descope`).
  * The reverse direction is enforced too: a manifest row whose name no
  * longer exists in the reference fails as stale. SURVEY §2 is
  * hand-maintained; this is the mechanical version of it (the
  * EntryContractSpec lesson from round 8 applied to API surface).
  *
  * Cancels (does not fail) when /root/reference is not present.
  */
class ParityInventorySpec extends AnyFunSuite {

  private val refRoot = "/root/reference/dask"

  private def stripComment(l: String): String = {
    val i = l.indexOf('#'); if (i >= 0) l.substring(0, i) else l
  }

  /** Public names imported at module top level from `pkgPrefix`-rooted
    * modules (`from dask.array.core import (a, b as c, ...)`), handling
    * multi-line parenthesized import lists — the same set Python's ast
    * ImportFrom walk yields for these files.
    */
  private def modulePublics(path: String, pkgPrefix: String): Set[String] = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.map(stripComment).toVector
    val out = scala.collection.mutable.Set[String]()
    val start = raw"\s*from\s+(\S+)\s+import\s+(.*)".r
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case start(mod, rest0) if mod == pkgPrefix || mod.startsWith(pkgPrefix + ".") =>
          var buf = rest0
          // multi-line: accumulate until parens balance (or trailing \)
          while ((buf.count(_ == '(') > buf.count(_ == ')')) ||
                 buf.trim.endsWith("\\")) {
            i += 1
            buf = buf.stripSuffix("\\") + " " + lines(i)
          }
          val cleaned = buf.replace("(", " ").replace(")", " ")
          cleaned.split(",").foreach { tok =>
            val parts = tok.trim.split(raw"\s+as\s+")
            val name = parts.last.trim
            if (name.nonEmpty && name != "*" && !name.startsWith("_") &&
                name.forall(c => c.isLetterOrDigit || c == '_'))
              out += name
          }
        case _ =>
      }
      i += 1
    }
    out.toSet
  }

  /** Public `def` members of the given top-level classes (4-space indent,
    * direct children — the ast ClassDef walk for these files).
    */
  private def classMethods(path: String, classes: Set[String]): Set[String] = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.map(_.stripTrailing()).toVector
    val clsRe = raw"class\s+(\w+)\b.*".r
    val defRe = raw"    (?:async\s+)?def\s+(\w+)\s*\(.*".r
    val out = scala.collection.mutable.Set[String]()
    // Only CLASS lines flip the state: a col-0 docstring fragment inside a
    // class body (e.g. a bare "{data}" continuation) must not end it, and
    // 4-space `def`s cannot occur at module level — validated equal to the
    // Python-ast ClassDef walk on the three reference files.
    var inTarget = false
    lines.foreach {
      case l @ clsRe(name) if !l.startsWith(" ") => inTarget = classes.contains(name)
      case defRe(m) if inTarget && !m.startsWith("_") => out += m
      case _ =>
    }
    out.toSet
  }

  /** Public top-level `def`s of a module. */
  private def moduleDefs(path: String): Set[String] = {
    val defRe = raw"(?:async\s+)?def\s+(\w+)\s*\(.*".r
    Files.readAllLines(Paths.get(path)).asScala.collect {
      case l if !l.startsWith(" ") => l match {
        case defRe(m) if !m.startsWith("_") => Some(m)
        case _ => None
      }
    }.flatten.toSet
  }

  /** Names in a module's `__all__` list (the ast literal_eval of the
    * assignment) — the reference's own export declaration where present.
    */
  private def allList(path: String): Set[String] = {
    val txt = Files.readString(Paths.get(path))
    raw"(?s)__all__\s*=\s*\[(.*?)\]".r.findFirstMatchIn(txt)
      .map(_.group(1).split(",").iterator.map(_.trim
          .stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'"))
        .filter(n => n.nonEmpty && !n.startsWith("_")).toSet)
      .getOrElse(Set.empty)
  }

  /** Top-level `name = rhs(...)` assignment exports (dask/array/fft.py
    * materializes its transforms as `fft = fft_wrap(np.fft.fft)`).
    */
  private def assignExports(path: String, rhs: String): Set[String] = {
    val re = (raw"(\w+)\s*=\s*" + rhs + raw"\(.*").r
    Files.readAllLines(Paths.get(path)).asScala.collect {
      case re(n) if !n.startsWith("_") => n
    }.toSet
  }

  /** Names in a class-level `_accessor_methods`/`_accessor_properties`
    * tuple — dask generates the .str/.dt/.cat member surfaces from these
    * explicit lists (`dask_expr/_accessor.py:40-45`).
    */
  private def accessorNames(path: String): Set[String] = {
    val txt = Files.readString(Paths.get(path))
    raw"(?s)_accessor_(?:methods|properties)\s*=\s*\((.*?)\)".r
      .findAllMatchIn(txt)
      .flatMap(_.group(1).split(",").iterator.map(_.trim
        .stripPrefix("\"").stripSuffix("\"")))
      .filter(n => n.nonEmpty && !n.startsWith("_") &&
        n.forall(c => c.isLetterOrDigit || c == '_'))
      .toSet
  }

  private lazy val extracted: Map[String, Set[String]] = Map(
    "array" -> modulePublics(s"$refRoot/array/__init__.py", "dask.array"),
    "dataframe" -> classMethods(
      s"$refRoot/dataframe/dask_expr/_collection.py",
      Set("DataFrame", "Series", "FrameBase")),
    "bag" -> (classMethods(s"$refRoot/bag/core.py", Set("Bag")) ++
      modulePublics(s"$refRoot/bag/__init__.py", "dask.bag") ++
      moduleDefs(s"$refRoot/bag/random.py")),
    // round-11 widening: module-level function surfaces + the top-level
    // dask namespace + the array submodules accessed as da.ma/fft/linalg
    "dataframe_mod" -> allList(s"$refRoot/dataframe/__init__.py"),
    "delayed" -> allList(s"$refRoot/delayed.py"),
    "dask_top" -> modulePublics(s"$refRoot/__init__.py", "dask"),
    "array_ma" -> moduleDefs(s"$refRoot/array/ma.py"),
    "array_fft" -> (moduleDefs(s"$refRoot/array/fft.py") ++
      assignExports(s"$refRoot/array/fft.py", "fft_wrap")),
    "array_linalg" -> moduleDefs(s"$refRoot/array/linalg.py"),
    // round-11b widening: the .str/.dt/.cat accessor surfaces — dask
    // binds these from explicit name tuples plus a few real defs
    "str_accessor" -> (accessorNames(s"$refRoot/dataframe/dask_expr/_str_accessor.py") ++
      classMethods(s"$refRoot/dataframe/dask_expr/_str_accessor.py", Set("StringAccessor"))),
    "dt_accessor" -> (accessorNames(s"$refRoot/dataframe/dask_expr/_datetime.py") ++
      classMethods(s"$refRoot/dataframe/dask_expr/_datetime.py", Set("DatetimeAccessor"))),
    "cat_accessor" -> (accessorNames(s"$refRoot/dataframe/dask_expr/_categorical.py") ++
      classMethods(s"$refRoot/dataframe/dask_expr/_categorical.py", Set("CategoricalAccessor"))),
    // the grouped/windowed collection classes users actually hold
    "groupby_api" -> classMethods(s"$refRoot/dataframe/dask_expr/_groupby.py",
      Set("GroupBy", "SeriesGroupBy")),
    "rolling_api" -> classMethods(s"$refRoot/dataframe/dask_expr/_rolling.py",
      Set("Rolling")),
    "resample_api" -> classMethods(s"$refRoot/dataframe/tseries/resample.py",
      Set("Resampler")),
    // the seeded random distribution table (RandomState + Generator)
    "array_random" -> (classMethods(s"$refRoot/array/random.py",
      Set("RandomState", "Generator")) ++ moduleDefs(s"$refRoot/array/random.py")),
    // round-12 widening: the `class Array` member surface itself (the
    // blind spot vindex/blocks/partitions hid in — VERDICT r11) and the
    // Index collection class
    "array_cls" -> classMethods(s"$refRoot/array/core.py", Set("Array")),
    "index_api" -> classMethods(
      s"$refRoot/dataframe/dask_expr/_collection.py", Set("Index")))

  private lazy val manifest: Map[(String, String), (String, String)] = {
    val url = getClass.getClassLoader.getResource("parity_manifest.tsv")
    assert(url != null, "parity_manifest.tsv missing from test resources")
    scala.io.Source.fromURL(url).getLines()
      .filterNot(l => l.startsWith("#") || l.isBlank)
      .map { l =>
        val f = l.split('\t')
        assert(f.length == 4, s"bad manifest row: $l")
        (f(0), f(1)) -> (f(2), f(3))
      }.toMap
  }

  test("every reference public name is mapped, builtin, or explicitly descoped") {
    assume(Files.isDirectory(Paths.get(refRoot)), "reference checkout not present")
    val missing = for {
      (section, names) <- extracted.toSeq
      n <- names.toSeq.sorted if !manifest.contains((section, n))
    } yield s"$section/$n"
    assert(missing.isEmpty,
      s"reference exports with no manifest entry (new upstream API? map or descope it): ${missing.mkString(", ")}")
  }

  test("no stale manifest rows (names the reference no longer exports)") {
    assume(Files.isDirectory(Paths.get(refRoot)), "reference checkout not present")
    val stale = manifest.keys.toSeq.filterNot { case (s, n) =>
      extracted.getOrElse(s, Set.empty).contains(n)
    }.map { case (s, n) => s"$s/$n" }.sorted
    assert(stale.isEmpty, s"manifest rows not in the reference exports: ${stale.mkString(", ")}")
  }

  test("every `map`/`class` manifest target resolves against the compiled classes") {
    def classExists(fqcn: String): Boolean =
      try { Class.forName(fqcn); true }
      catch {
        case _: ClassNotFoundException =>
          try { Class.forName(fqcn + "$"); true }
          catch { case _: ClassNotFoundException => false }
      }
    def memberExists(target: String): Boolean = {
      val Array(cls, member) = target.split('#')
      def has(c: String): Boolean =
        try Class.forName(c).getMethods.exists(_.getName == member)
        catch { case _: ClassNotFoundException => false }
      has(cls) || has(cls + "$") || has(cls.stripSuffix("$"))
    }
    val broken = manifest.toSeq.collect {
      case ((s, n), ("map", t)) if !memberExists(t) => s"$s/$n -> $t"
      case ((s, n), ("class", t)) if !classExists(t) => s"$s/$n -> $t"
    }.sorted
    assert(broken.isEmpty, s"manifest targets that do not resolve: ${broken.mkString(", ")}")
  }

  test("descope list stays small and every descope carries a reason") {
    val descopes = manifest.collect { case ((s, n), ("descope", r)) => (s, n, r) }
    descopes.foreach { case (s, n, r) =>
      assert(r.trim.length > 10, s"descope $s/$n needs a real reason")
    }
    // the descope budget: raising it is a deliberate act, not drift.
    // round 11 widened the walk to dask.dataframe/__init__, dask/__init__,
    // dask.delayed and the array ma/fft/linalg submodules, adding 17
    // machinery descopes (backend dispatch, task-graph layer, svd_compressed
    // internals) — budget raised 32 -> 48 to cover them; the round-11b
    // accessor walk (.str/.dt/.cat) adds 10 metadata/object-dtype descopes
    // (freq/tz/tzinfo attributes, python-object materializers, the
    // known/ordered dtype flags) — 48 -> 58; the random-table walk adds 3
    // (the mutable seed API, a deprecated relic, binding machinery) — 61;
    // the round-12 Array-class walk adds 10 (dtype/astype/view are
    // representation choices in a float64-backed engine, name/format_index/
    // to_svg are graph/repr helpers, to_backend is dispatch machinery,
    // compute_chunk_sizes is unknown-chunk machinery, to_hdf5/to_tiledb
    // mirror the existing io descopes) — 71.
    assert(descopes.size <= 71, s"descope list grew to ${descopes.size} — implement or justify")
  }
}
