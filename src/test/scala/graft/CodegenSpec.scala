package graft

import graft.functions.TextExprs
import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** Proof that the custom expressions really COMPILE under whole-stage
  * codegen — Spark silently falls back to interpreted eval when
  * generated code fails to build, so a green oracle gate alone can't
  * distinguish "codegen'd" from "quietly interpreted". These tests pin
  * both halves: (1) with `spark.sql.codegen.fallback=false` a broken
  * doGenCode throws instead of hiding; (2) the executed plan keeps the
  * expressions inside a fused (`*`-starred) WholeStageCodegen project.
  */
class CodegenSpec extends SparkSpec {

  private def withNoFallback[A](body: => A): A = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // CODEGEN_ONLY would fail on genuinely interpreted-only built-ins
    // elsewhere; fallback=false is the per-plan guard for these tests
    try body
    finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("text expressions evaluate under codegen with fallback disabled") {
    val session = spark
    import session.implicits._
    withNoFallback {
      val df = Seq("the quick brown fox jumps over the lazy dog",
                   "  Mixed   CASE  and   runs of	whitespace ", "",
                   "élève 😀 non-ascii")
        .toDF("text")
      val out = df.select(
        TextExprs.wordShingles(col("text"), 3).as("sh"),
        TextExprs.simhash64(col("text")).as("sim"),
        TextExprs.polyHash(col("text")).as("ph"),
        TextExprs.tokenCounts(col("text")).as("tc"),
        TextExprs.winnowFingerprints(col("text"), 5, 4).as("wf"))
      val rows = out.collect()
      assert(rows.length == 4)
      // and the INTERPRETED path agrees — direct Expression.eval on a
      // literal child, no Spark plan and no codegen anywhere, so a
      // doGenCode/unboxing bug cannot cancel out of the comparison
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      val texts = Seq("the quick brown fox jumps over the lazy dog",
                      "  Mixed   CASE  and   runs of	whitespace ", "",
                      "élève 😀 non-ascii")
      val byEval = texts.map { t =>
        graft.functions.SimHashExpr(Literal.create(UTF8String.fromString(t),
                                                   org.apache.spark.sql.types.StringType))
          .eval(null).asInstanceOf[UTF8String].toString
      }
      assert(byEval == rows.map(_.getAs[String]("sim")).toSeq)
      val phEval = texts.map { t =>
        graft.functions.PolyHashExpr(Literal.create(
          UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType)).eval(null)
          .asInstanceOf[Long]
      }
      assert(phEval == rows.map(_.getAs[Long]("ph")).toSeq)
    }
  }

  test("minhash + hamming + vector expressions under codegen") {
    val session = spark
    import session.implicits._
    withNoFallback {
      val df = Seq((Seq("a b c", "b c d"), Seq(1.0f, 2.0f, 3.0f),
                    Seq(0.5f, 0.5f, 0.5f))).toDF("sh", "va", "vb")
      val out = df.select(
        TextExprs.minhashSignature(col("sh"), 8).as("mh"),
        TextExprs.hammingHex(lit("00ff"), lit("0f0f")).as("hd"),
        VectorExprs.vecDot(col("va"), col("vb")).as("dot"),
        VectorExprs.vecNorm(col("va")).as("nrm"),
        VectorExprs.vecDist2(col("va"), col("vb")).as("d2"))
      val r = out.head()
      assert(r.getAs[scala.collection.Seq[Long]]("mh").length == 8)
      assert(r.getAs[Long]("hd") == 8L)
      assert(math.abs(r.getAs[Double]("dot") - 3.0) < 1e-12)
    }
  }

  test("expression project stays inside a fused WholeStageCodegen span") {
    val df = Tables.documents(spark, sf("sf0.001"))
      .select(TextExprs.polyHash(col("text")).as("h"),
              TextExprs.simhash64(col("text")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star marks a fused codegen stage; a CodegenFallback
    // expression would leave the Project unstarred
    assert(plan.contains("*(1) Project"), s"no fused project in:\n$plan")
  }

  test("null propagation survives the codegen path") {
    val session = spark
    import session.implicits._
    withNoFallback {
      val df = Seq(Some("abc"), None).toDF("text")
      val rows = df.select(TextExprs.polyHash(col("text")).as("h")).collect()
      assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    }
  }
}
