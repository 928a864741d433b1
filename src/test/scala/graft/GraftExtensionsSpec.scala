package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("float_dot is callable from SQL via SparkSessionExtensions") {
    // getOrCreate reuses the suite-wide default session (which has no
    // extensions), so clear the default first: a new SparkSession is then
    // built over the SAME SparkContext with the extensions applied.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        "SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d")
        .collect().head.getDouble(0)
      assert(r === 11.0)
      // the whole native-expression family is SQL-callable
      val sh = s.sql(
        "SELECT shingle_hashes('a b c d', 3) AS h").collect().head.getSeq[Long](0)
      assert(sh.length === 2) // 'a b c' and 'b c d'
      val mh = s.sql(
        "SELECT minhash_words(array('a','b','c','d'), 3, 8) AS m")
        .collect().head.getSeq[String](0)
      assert(mh.length === 8 && mh.forall(_.length == 32))
      val bs = s.sql(
        s"SELECT bit_sketch(array(${Seq.fill(64)("cast(0.5 as float)").mkString(",")}), 256, 64) AS b")
        .collect().head.getSeq[Long](0)
      assert(bs.length === 4) // 256 bits packed into 4 longs
      // non-literal geometry arguments are rejected loudly
      val err = intercept[Exception] {
        s.sql("SELECT shingle_hashes('a b c', cast(3 as int) + 0)").collect()
      }
      assert(err.getMessage.contains("INTEGER literal"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
