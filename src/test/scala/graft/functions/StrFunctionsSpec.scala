package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column

/** .str accessor semantics vs pandas (SURVEY §2.9). */
class StrFunctionsSpec extends SparkTestBase {

  import spark.implicits._

  private def eval1(c: String => Column, in: String): Any = {
    val df = Seq(in).toDF("s")
    df.select(c("s").as("out")).collect().head.get(0)
  }
  private def s(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c

  test("center pads both sides (CPython left-bias rule), unchanged when width <= len") {
    import org.apache.spark.sql.functions.col
    // CPython: 'ab'.center(5,'*') == '**ab*' (odd margin & odd width → extra LEFT)
    assert(eval1(n => StrFunctions.center(col(n), 5, "*"), "ab") == "**ab*")
    assert(eval1(n => StrFunctions.center(col(n), 4, "*"), "ab") == "*ab*")
    assert(eval1(n => StrFunctions.center(col(n), 5, "*"), "abc") == "*abc*")
    assert(eval1(n => StrFunctions.center(col(n), 6, "*"), "abc") == "*abc**")
    assert(eval1(n => StrFunctions.center(col(n), 3, "*"), "abcdef") == "abcdef")
  }

  test("rfind: last index, -1 when absent (pandas 0-based)") {
    import org.apache.spark.sql.functions.col
    assert(eval1(n => StrFunctions.rfind(col(n), "l"), "hello") == 3)
    assert(eval1(n => StrFunctions.rfind(col(n), "z"), "hello") == -1)
  }

  test("capitalize / swapcase / zfill / removeprefix / removesuffix") {
    import org.apache.spark.sql.functions.col
    assert(eval1(n => StrFunctions.capitalize(col(n)), "hELLO world") == "Hello world")
    assert(eval1(n => StrFunctions.swapcase(col(n)), "AbC1") == "aBc1")
    assert(eval1(n => StrFunctions.zfill(col(n), 5), "42") == "00042")
    assert(eval1(n => StrFunctions.zfill(col(n), 3), "123456") == "123456")
    assert(eval1(n => StrFunctions.rfind(col(n), "xyz"), "hello").toString == "-1")
    // NFD decomposes é into e + combining acute (5 chars); NFC recomposes
    assert(eval1(n => StrFunctions.normalize(StrFunctions.normalize(col(n), "NFD"), "NFC"),
      "café") == "café")
    assert(eval1(n => StrFunctions.normalize(col(n), "NFD"), "café").asInstanceOf[String].length == 5)
    assert(eval1(n => StrFunctions.removeprefix(col(n), "un"), "unhappy") == "happy")
    assert(eval1(n => StrFunctions.removeprefix(col(n), "un"), "happy") == "happy")
    assert(eval1(n => StrFunctions.removesuffix(col(n), "ly"), "quickly") == "quick")
  }

  test("partition returns head/sep/tail struct; no-sep keeps whole in head") {
    import org.apache.spark.sql.functions.col
    val r = Seq("a-b-c").toDF("s")
      .select(StrFunctions.partition(col("s"), "-").as("p"))
      .select("p.head", "p.sep", "p.tail").collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("a", "-", "b-c"))
    val r2 = Seq("abc").toDF("s")
      .select(StrFunctions.partition(col("s"), "-").as("p"))
      .select("p.head", "p.sep", "p.tail").collect().head
    assert((r2.getString(0), r2.getString(1), r2.getString(2)) == ("abc", "", ""))
  }

  test("slice / sliceReplace / find / get (0-based pandas semantics)") {
    import org.apache.spark.sql.functions.col
    assert(eval1(n => StrFunctions.slice(col(n), 1, 4), "abcdef") == "bcd")
    assert(eval1(n => StrFunctions.sliceReplace(col(n), 1, 4, "XY"), "abcdef") == "aXYef")
    assert(eval1(n => StrFunctions.find(col(n), "cd"), "abcdef") == 2)
    assert(eval1(n => StrFunctions.get(col(n), 2), "abcdef") == "c")
  }

  test("encode/decode roundtrip, index/rindex, rpartition (CPython semantics)") {
    import org.apache.spark.sql.functions.col
    assert(eval1(n => StrFunctions.decodeStr(StrFunctions.encodeStr(col(n))), "héllo") == "héllo")
    // encode returns BYTES: multi-byte char widens the octet length
    assert(eval1(n => org.apache.spark.sql.functions.length(
      StrFunctions.encodeStr(col(n))), "héllo") == 6)
    assert(eval1(n => StrFunctions.index(col(n), "c"), "abcabc") == 2)
    assert(eval1(n => StrFunctions.rindex(col(n), "c"), "abcabc") == 5)
    // absent substring raises (pandas ValueError), unlike find/rfind
    intercept[Exception] { eval1(n => StrFunctions.index(col(n), "z"), "abc") }
    intercept[Exception] { eval1(n => StrFunctions.rindex(col(n), "z"), "abc") }
    val rp = eval1(n => StrFunctions.rpartition(col(n), " "), "a b c")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(rp.getString(0) == "a b" && rp.getString(1) == " " && rp.getString(2) == "c")
    // missing separator: value lands in the TAIL ('', '', whole)
    val rpMiss = eval1(n => StrFunctions.rpartition(col(n), "|"), "abc")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(rpMiss.getString(0) == "" && rpMiss.getString(1) == "" && rpMiss.getString(2) == "abc")
  }

  test("is-predicates and fullmatch") {
    import org.apache.spark.sql.functions.col
    assert(eval1(n => StrFunctions.isalpha(col(n)), "abc") == true)
    assert(eval1(n => StrFunctions.isalpha(col(n)), "ab1") == false)
    assert(eval1(n => StrFunctions.isdigit(col(n)), "123") == true)
    assert(eval1(n => StrFunctions.isspace(col(n)), "  \t") == true)
    assert(eval1(n => StrFunctions.isupper(col(n)), "ABC1") == true)
    assert(eval1(n => StrFunctions.islower(col(n)), "abc1") == true)
    assert(eval1(n => StrFunctions.fullmatch(col(n), "a+b"), "aab") == true)
    assert(eval1(n => StrFunctions.fullmatch(col(n), "a+b"), "aabc") == false)
  }

  test("findall returns every whole-pattern match, unlike extractall's group") {
    import org.apache.spark.sql.functions.col
    // pandas: Series(['a1 b22 c3']).str.findall(r'[a-z]\d+') -> [a1, b22, c3]
    assert(eval1(n => StrFunctions.findall(col(n), "[a-z]\\d+"), "a1 b22 c3")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a1", "b22", "c3"))
    assert(eval1(n => StrFunctions.findall(col(n), "\\d+"), "none")
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("findall with one capture group returns that group; >=2 groups returns re.findall tuples") {
    import org.apache.spark.sql.functions.col
    // pandas: Series(['a1 b22']).str.findall(r'([a-z])\d+') -> [a, b]
    assert(eval1(n => StrFunctions.findall(col(n), "([a-z])\\d+"), "a1 b22")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b"))
    // pandas: re.findall(r'([a-z])(\d+)', 'a1 b22') -> [('a','1'), ('b','22')]
    val tuples = eval1(n => StrFunctions.findall(col(n), "([a-z])(\\d+)"), "a1 b22")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq
    assert(tuples == Seq(Seq("a", "1"), Seq("b", "22")))
    // a non-participating optional group comes back '' (re.findall rule)
    val opt = eval1(n => StrFunctions.findall(col(n), "(a)(x)?"), "a ax")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq
    assert(opt == Seq(Seq("a", ""), Seq("a", "x")))
  }
}
