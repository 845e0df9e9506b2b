package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `.str.*` accessor surface (reference: 55 methods enumerated at
  * `dask_expr/_str_accessor.py:23-120`), re-expressed as codegen'd Spark
  * Column functions.  Methods with no Spark builtin (casefold, wrap,
  * is-predicates) are composed from regexp/expr forms — still no UDFs.
  */
object StrFunctions {

  def capitalize(c: Column): Column = concat(upper(substring(c, 1, 1)), lower(expr_substr(c, 2)))
  private def expr_substr(c: Column, from: Int): Column = c.substr(lit(from), length(c))

  def casefold(c: Column): Column = lower(c) // full Unicode casefold ≈ lower for BMP text
  def center(c: Column, width: Int, fill: String = " "): Column = {
    // CPython: left margin = marg/2 + (marg & width & 1) — the extra char
    // goes LEFT when both margin and width are odd
    val marg = lit(width) - length(c)
    val padLeft = (floor(marg / 2) + (marg.bitwiseAND(lit(width)).bitwiseAND(lit(1)))).cast("int")
    // strings already >= width are returned unchanged (lpad/rpad truncate)
    when(length(c) >= width, c)
      .otherwise(rpad(lpad(c, length(c) + padLeft, lit(fill)), width, fill))
  }
  def contains(c: Column, pat: String, regex: Boolean = false): Column =
    if (regex) regexp_like(c, lit(pat)) else c.contains(pat)
  def count(c: Column, pat: String): Column = regexp_count(c, lit(pat))
  def endswith(c: Column, s: String): Column = c.endsWith(s)
  def extract(c: Column, pat: String, group: Int = 1): Column = regexp_extract(c, pat, group)
  def extractall(c: Column, pat: String): Column = regexp_extract_all(c, lit(pat))
  // pandas findall = re.findall per row: with no capture group every
  // non-overlapping whole match (group 0); with exactly ONE capture
  // group re.findall returns that group's text instead; with >=2 groups
  // a list of TUPLES (one string per group, '' for a non-participating
  // group) — returned here as array<array<string>>.  The 0/1-group
  // paths stay on the codegen'd regexp_extract_all builtin; only the
  // tuple path (rare, and with a per-pattern result type no builtin can
  // produce) pays for a UDF.
  def findall(c: Column, pat: String): Column = {
    val compiled = java.util.regex.Pattern.compile(pat)
    val g = compiled.matcher("").groupCount()
    if (g >= 2) {
      val f = udf { (s: String) =>
        if (s == null) null
        else {
          val m = compiled.matcher(s)
          val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
          while (m.find())
            out += (1 to g).map(i => Option(m.group(i)).getOrElse(""))
          out.toSeq
        }
      }
      f(c)
    } else regexp_extract_all(c, lit(pat), lit(if (g == 1) 1 else 0))
  }
  def find(c: Column, sub: String): Column = instr(c, sub) - 1 // pandas is 0-based, -1 missing
  def fullmatch(c: Column, pat: String): Column = regexp_like(c, lit(s"^(?:$pat)$$"))
  def get(c: Column, i: Int): Column = substring(c, i + 1, 1)
  def isalnum(c: Column): Column = regexp_like(c, lit("^[\\p{L}\\p{N}]+$"))
  def isalpha(c: Column): Column = regexp_like(c, lit("^\\p{L}+$"))
  def isdecimal(c: Column): Column = regexp_like(c, lit("^\\p{Nd}+$"))
  def isdigit(c: Column): Column = regexp_like(c, lit("^\\p{Nd}+$"))
  def islower(c: Column): Column = (c === lower(c)) && regexp_like(c, lit("\\p{L}"))
  def isnumeric(c: Column): Column = regexp_like(c, lit("^\\p{N}+$"))
  def isspace(c: Column): Column = regexp_like(c, lit("^\\s+$"))
  def istitle(c: Column): Column = c === initcap(lower(c))
  def isupper(c: Column): Column = (c === upper(c)) && regexp_like(c, lit("\\p{L}"))
  def joinArr(c: Column, sep: String): Column = array_join(c, sep)
  def len(c: Column): Column = length(c)
  def ljust(c: Column, width: Int, fill: String = " "): Column = rpad(c, width, fill)
  def lower_(c: Column): Column = lower(c)
  def lstrip(c: Column): Column = ltrim(c)
  def matchPrefix(c: Column, pat: String): Column = regexp_like(c, lit(s"^(?:$pat)"))
  private val normUdf = udf((s: String, form: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
  /** Unicode normalization (pandas `str.normalize`): NFC/NFD/NFKC/NFKD. */
  def normalize(c: Column, form: String = "NFC"): Column = normUdf(c, lit(form))
  def pad(c: Column, width: Int, side: String, fill: String = " "): Column = side match {
    case "left"  => lpad(c, width, fill)
    case "right" => rpad(c, width, fill)
    case "both"  => center(c, width, fill)
  }
  def partition(c: Column, sep: String): Column = {
    val idx = instr(c, sep)
    struct(
      when(idx > 0, c.substr(lit(1), idx - 1)).otherwise(c).as("head"),
      when(idx > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(idx > 0, c.substr(idx + sep.length, length(c))).otherwise(lit("")).as("tail"))
  }
  def removeprefix(c: Column, p: String): Column =
    when(c.startsWith(p), c.substr(lit(p.length + 1), length(c))).otherwise(c)
  def removesuffix(c: Column, s: String): Column =
    when(c.endsWith(s), c.substr(lit(1), length(c) - s.length)).otherwise(c)
  def repeat(c: Column, n: Int): Column = org.apache.spark.sql.functions.repeat(c, n)
  def replace(c: Column, pat: String, rep: String, regex: Boolean = true): Column =
    if (regex) regexp_replace(c, pat, rep)
    else org.apache.spark.sql.functions.replace(c, lit(pat), lit(rep))
  def rfind(c: Column, sub: String): Column =
    // pandas returns -1 when absent; substring_index then yields the whole
    // string, which would otherwise leak -sub.length
    when(instr(c, sub) === 0, lit(-1))
      .otherwise(length(c) - length(substring_index(c, sub, -1)) - lit(sub.length) + lit(1) - 1)
  def rjust(c: Column, width: Int, fill: String = " "): Column = lpad(c, width, fill)
  def rstrip(c: Column): Column = rtrim(c)
  def slice(c: Column, start: Int, stop: Int): Column = substring(c, start + 1, stop - start)
  def sliceReplace(c: Column, start: Int, stop: Int, rep: String): Column =
    concat(substring(c, 1, start), lit(rep), c.substr(lit(stop + 1), length(c)))
  def split(c: Column, sep: String): Column = org.apache.spark.sql.functions.split(c, sep)
  /** pandas `rsplit(sep)` WITHOUT maxsplit equals `split(sep)` — elements
    * stay in left-to-right order (the two differ only when a maxsplit
    * limit decides which END the unsplit remainder attaches to).
    */
  def rsplit(c: Column, sep: String): Column = org.apache.spark.sql.functions.split(c, sep)
  def startswith(c: Column, s: String): Column = c.startsWith(s)
  def strip(c: Column): Column = trim(c)
  def swapcase(c: Column): Column =
    // no builtin: compose via translate of ASCII ranges
    translate(c,
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
  def title(c: Column): Column = initcap(c)
  def translateStr(c: Column, from: String, to: String): Column = translate(c, from, to)
  def upper_(c: Column): Column = upper(c)
  def wrap(c: Column, width: Int): Column =
    // second alternative breaks words longer than `width` (pandas
    // break_long_words=True default) — without it their leading chunks
    // would simply be DROPPED (unmatched by the break-at-space form)
    array_join(regexp_extract_all(c, lit(s".{1,$width}(\\s+|$$)|.{1,$width}"), lit(0)), "\n")
  def zfill(c: Column, width: Int): Column =
    // pandas leaves strings longer than `width` unchanged; lpad would truncate
    when(length(c) >= width, c).otherwise(lpad(c, width, "0"))
  def cat(c: Column, sep: String): Column = array_join(collect_list(c), sep) // concat-reduce

  /** pandas `str.encode` / `str.decode`: bytes ↔ string through a named
    * charset — Spark's codegen'd encode/decode builtins.
    */
  def encodeStr(c: Column, charset: String = "UTF-8"): Column =
    org.apache.spark.sql.functions.encode(c, charset)
  def decodeStr(c: Column, charset: String = "UTF-8"): Column =
    org.apache.spark.sql.functions.decode(c, charset)

  /** pandas `str.index` / `str.rindex` — find/rfind that RAISE when the
    * substring is absent (pandas ValueError → Spark raise_error, surfaced
    * as a task failure; guard with `contains` when absence is expected).
    */
  def index(c: Column, sub: String): Column =
    when(instr(c, sub) === 0,
      raise_error(concat(lit(s"substring '$sub' not found in: "), c)).cast("int"))
      .otherwise(instr(c, sub) - 1)
  def rindex(c: Column, sub: String): Column =
    when(instr(c, sub) === 0,
      raise_error(concat(lit(s"substring '$sub' not found in: "), c)).cast("int"))
      .otherwise(rfind(c, sub))

  /** pandas `str.rpartition`: split on the LAST occurrence; when the
    * separator is absent the value lands in the TAIL (mirror of
    * `partition`, which keeps it in the head).
    */
  def rpartition(c: Column, sep: String): Column = {
    val idx1 = rfind(c, sep) + 1 // 1-based start of the last occurrence; 0 if absent
    struct(
      when(idx1 > 0, c.substr(lit(1), idx1 - 1)).otherwise(lit("")).as("head"),
      when(idx1 > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(idx1 > 0, c.substr(idx1 + sep.length, length(c))).otherwise(c).as("tail"))
  }
}
