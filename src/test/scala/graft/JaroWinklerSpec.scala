package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** Native Jaro-Winkler expression: textbook vectors, the edge semantics
  * pinned to DuckDB (empty → 0, integer-floored transposition halving,
  * 0.7 boost gate), null handling, and the SQL registration path.
  */
class JaroWinklerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def jwCol(a: String, b: String) =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(col(a)), GraftBridge.expression(col(b))))

  test("textbook vectors match the published values") {
    assert(math.abs(JaroWinkler.compute("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.compute("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(JaroWinkler.compute("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(JaroWinkler.compute("abc", "abc") === 1.0)
  }

  test("edge semantics pinned to DuckDB") {
    assert(JaroWinkler.compute("", "") === 0.0)
    assert(JaroWinkler.compute("abc", "") === 0.0)
    assert(JaroWinkler.compute("a", "b") === 0.0)
    // odd raw transpositions floor before halving: abcdef/bcadef = 0.9444…
    assert(math.abs(JaroWinkler.compute("abcdef", "bcadef") - 0.9444444444444445) < 1e-12)
    // boost gate: jaro 0.5 with a 2-char common prefix stays 0.5
    assert(JaroWinkler.compute("abcdefgh", "abzzzzzz") === 0.5)
  }

  test("column path (codegen) agrees with the static function, nulls are null") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("crate", "trace"), (null, "x"))
      .toDF("a", "b")
    val rows = df.select(jwCol("a", "b").as("jw")).collect()
    assert(math.abs(rows(0).getDouble(0) - JaroWinkler.compute("martha", "marhta")) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - JaroWinkler.compute("crate", "trace")) < 1e-12)
    assert(rows(2).isNullAt(0))
  }

  test("registered in SQL as jaro_winkler via GraftExtensions") {
    val r = spark.sql("SELECT jaro_winkler('dwayne', 'duane') AS jw").collect()
    assert(math.abs(r(0).getDouble(0) - 0.84) < 1e-10)
  }
}
