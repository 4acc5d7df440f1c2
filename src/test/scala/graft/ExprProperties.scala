package graft

import graft.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the algebraic laws of the custom expression
  * kernels (SURVEY §5 test strategy (b)) — evaluated directly against
  * the Catalyst `eval` path, no SparkSession needed.
  */
object ExprProperties extends Properties("graft.expressions") {

  private def strArr(xs: Seq[String]): Literal =
    Literal.create(xs, ArrayType(StringType))

  private def dblArr(xs: Seq[Double]): Literal =
    Literal.create(xs, ArrayType(DoubleType))

  private def evalLongs(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Long] =
    e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val words: Gen[List[String]] = Gen.nonEmptyListOf(word)

  property("minhash is invariant under shingle permutation") =
    forAll(words, Gen.long) { (ws, seed) =>
      val perm = new scala.util.Random(seed).shuffle(ws)
      evalLongs(MinHashSigExpr(strArr(ws), 8)) ==
        evalLongs(MinHashSigExpr(strArr(perm), 8))
    }

  property("adding a shingle never raises any minhash component") =
    forAll(words, word) { (ws, extra) =>
      val base = evalLongs(MinHashSigExpr(strArr(ws), 8))
      val more = evalLongs(MinHashSigExpr(strArr(ws :+ extra), 8))
      base.zip(more).forall { case (b, m) => m <= b }
    }

  property("poly_hash stays in [0, 1e9+7) and is deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h1 = PolyHashExpr(Literal(UTF8String.fromString(s), StringType)).eval(null)
      val h2 = PolyHashExpr(Literal(UTF8String.fromString(s), StringType)).eval(null)
      val v = h1.asInstanceOf[Long]
      h1 == h2 && v >= 0L && v < 1000000007L
    }

  property("simhash of identical text is identical; hamming(h,h)=0") =
    forAll(words) { ws =>
      val text = ws.mkString(" ")
      val lit = Literal(UTF8String.fromString(text), StringType)
      val h1 = SimHashExpr(lit).eval(null).asInstanceOf[UTF8String]
      val h2 = SimHashExpr(lit).eval(null).asInstanceOf[UTF8String]
      val d = HammingHexExpr(Literal(h1, StringType), Literal(h2, StringType))
        .eval(null).asInstanceOf[Long]
      h1 == h2 && d == 0L
    }

  property("hamming_hex is symmetric and bounded by 4 bits per nibble") =
    forAll(Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq)),
           Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq))) { (a, b) =>
      val (sa, sb) = (a.mkString, b.mkString)
      def ham(x: String, y: String): Long =
        HammingHexExpr(Literal(UTF8String.fromString(x), StringType),
                       Literal(UTF8String.fromString(y), StringType))
          .eval(null).asInstanceOf[Long]
      ham(sa, sb) == ham(sb, sa) && ham(sa, sb) <= 64L
    }

  property("winnowing: shared substring of length ≥ k+w−1 shares a fingerprint") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr,
           Gen.listOfN(15, Gen.alphaLowerChar)) { (p1, p2, commonCs) =>
      val common = commonCs.mkString // 15 ≥ k+w−1 = 11
      def fps(s: String): Set[Long] =
        evalLongs(WinnowFingerprintExpr(
          Literal(UTF8String.fromString(s), StringType), 8, 4)).toSet
      fps(p1 + common + p2).intersect(fps(p2 + common + p1)).nonEmpty
    }

  property("token_counts total equals token count; case/space invariant") =
    forAll(words) { ws =>
      val spaced = ws.mkString("  ")
      val upper = ws.map(_.toUpperCase).mkString(" ")
      def counts(s: String): Map[String, Long] =
        TokenCountsExpr(Literal(UTF8String.fromString(s), StringType))
          .eval(null).asInstanceOf[ArrayData]
          .toArray[org.apache.spark.sql.catalyst.InternalRow](
            new StructType().add("token", StringType).add("tf", LongType))
          .map(r => r.getString(0) -> r.getLong(1))
          .toMap
      val c = counts(spaced)
      c.values.sum == ws.length && c == counts(upper)
    }

  property("with_size preserves elements and reports the true length") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { xs =>
      val st = new StructType().add("x", DoubleType).add("n", IntegerType)
      val rows = WithSizeExpr(dblArr(xs)).eval(null).asInstanceOf[ArrayData]
        .toArray[org.apache.spark.sql.catalyst.InternalRow](st)
      rows.length == xs.length &&
        rows.zip(xs).forall { case (r, x) => r.getDouble(0) == x } &&
        rows.forall(_.getInt(1) == xs.length)
    }

  property("vec kernels: sqrt(dot(a,a)) == norm(a), dist2(a,a) == 0") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))) { xs =>
      val a = dblArr(xs)
      val dot = VecDotExpr(a, a).eval(null).asInstanceOf[Double]
      val nrm = VecNormExpr(a).eval(null).asInstanceOf[Double]
      val d2 = VecDist2Expr(a, a).eval(null).asInstanceOf[Double]
      math.sqrt(dot) == nrm && d2 == 0.0
    }

  /** Reference code-point fold — the contract PolyHashExpr must match
    * (what the SQL oracles compute via per-character ascii()).
    */
  private def refPolyHash(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 257L + cp) % 1000000007L)
    h
  }

  private val anyUnicodeStr: Gen[String] = Gen
    .listOf(Gen.frequency(
      8 -> Gen.asciiPrintableChar.map(_.toString),
      2 -> Gen.choose(0x10000, 0x10FFFF).map(cp => new String(Character.toChars(cp)))
    ))
    .map(_.mkString)

  property("poly_hash folds CODE POINTS — non-BMP text matches the oracle fold") =
    forAll(anyUnicodeStr) { s =>
      PolyHashExpr(Literal(UTF8String.fromString(s), StringType))
        .eval(null) == refPolyHash(s)
    }

  property("winnowing treats a surrogate pair as ONE character position") =
    forAll(Gen.choose(0x10000, 0x10FFFF), Gen.choose(0x10000, 0x10FFFF)) {
      (cpA, cpB) =>
        // two strings of 12 code points each (24 UTF-16 units): same
        // k=8,w=4 fingerprint COUNT as a 12-char ASCII string iff
        // positions are counted in code points
        def mk(cp: Int) = new String(Character.toChars(cp)) * 12
        val ascii = "abcdefghijkl"
        def nFps(s: String) =
          WinnowFingerprintExpr(Literal(UTF8String.fromString(s), StringType), 8, 4)
            .eval(null).asInstanceOf[ArrayData].numElements()
        nFps(mk(cpA)) == nFps(ascii) && nFps(mk(cpB)) == nFps(ascii)
    }

  property("vec_dot is exactly symmetric (same fold order, commuted products)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)),
           Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))) { (xs, ys) =>
      VecDotExpr(dblArr(xs), dblArr(ys)).eval(null) ==
        VecDotExpr(dblArr(ys), dblArr(xs)).eval(null)
    }
}
