package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration: custom expressions usable
  * from plain SQL in an extended session.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val extended: SparkSession = SparkSession
    .builder()
    .master("local[2]")
    .appName("ExtensionsSpec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("word_shingles and minhash_signature are SQL-callable") {
    val row = extended
      .sql("""SELECT word_shingles('a b c d', 3) AS sh,
              |       minhash_signature(word_shingles('a b c d', 3), 4) AS sig
              |""".stripMargin)
      .head()
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    val sig = row.getSeq[String](1)
    assert(sig.length == 4 && sig.forall(_.matches("[0-9a-f]{32}")))
  }

  test("rolling_stats is SQL-callable as a window aggregate") {
    val rows = extended
      .sql("""SELECT st.n, st.mean, st.median FROM (
              |  SELECT rolling_stats(x) OVER (ORDER BY x ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS st
              |  FROM VALUES (1.0), (2.0), (3.0) t(x)
              |) ORDER BY st.n""".stripMargin)
      .collect()
    assert(rows.length == 3)
    assert(rows.last.getLong(0) == 3 && rows.last.getDouble(1) == 2.0 &&
      rows.last.getDouble(2) == 2.0)
  }

  test("SQL minhash matches the DataFrame operator result") {
    val viaSql = extended
      .sql("""SELECT minhash_signature(word_shingles('the quick brown fox jumps', 3), 16) AS sig""")
      .head()
      .getSeq[String](0)
    // reference formulation with built-ins on the same shingles
    val builtin = extended
      .sql("""SELECT transform(sequence(0, 15),
              |  i -> array_min(transform(word_shingles('the quick brown fox jumps', 3),
              |       s -> md5(concat(cast(i AS string), '|', s))))) AS sig""".stripMargin)
      .head()
      .getSeq[String](0)
    assert(viaSql == builtin)
  }
}
