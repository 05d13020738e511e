package graft

import graft.engine.{DateParse, SchemaMatch, Transforms}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3): idempotence / invariants on the pure
  * driver-side pieces, plus Spark-level invariants on small generated
  * frames. (scalacheck driven directly — the scalatestplus bridge isn't a
  * dependency.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  val word: Gen[String] = Gen.alphaNumStr.map(_.take(12))

  test("SchemaMatch.ratio is symmetric-in-score-range, reflexive, bounded") {
    check(Prop.forAll(word, word) { (a, b) =>
      val r = SchemaMatch.ratio(a, b)
      r >= 0.0 && r <= 1.0 && SchemaMatch.ratio(a, a) == 1.0
    })
  }

  test("DateParse output is canonical: reparsing a parsed date is identity") {
    val dateGen = for {
      y <- Gen.choose(1900, 2099); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield f"$d%02d/$m%02d/$y%04d"
    check(Prop.forAll(dateGen) { s =>
      val once = DateParse.parseDate(s)
      once != null && DateParse.parseDate(once) == once
    })
  }

  test("DateParse never throws on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      DateParse.parseDate(s); true
    })
  }

  test("month-name formats agree with the equivalent numeric form") {
    val gen = for {
      y <- Gen.choose(1900, 2099); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield (y, m, d)
    val months = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    check(Prop.forAll(gen) { case (y, m, d) =>
      val expect = f"$y%04d-$m%02d-$d%02d"
      DateParse.parseDate(s"${months(m - 1)} $d, $y") == expect &&
        DateParse.parseDate(s"$d ${months(m - 1)} $y") == expect &&
        DateParse.parseDate(s"${months(m - 1)} $d, $y 10:30:00") == expect
    })
  }
}

/** Spark-level invariants on small generated frames. */
class SparkPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randomDf(n: Int) = {
    val rows = Seq.fill(n)((rng.nextInt(5).toLong,
      if (rng.nextBoolean()) s"  v${rng.nextInt(3)}  " else null,
      if (rng.nextBoolean()) rng.nextInt(100).toDouble else Double.NaN))
      .map { case (a, b, c) => (a, b, if (c.isNaN) None else Some(c)) }
    rows.toDF("k", "s", "x")
  }

  test("T1 idempotent and row-subset on random frames") {
    (1 to 3).foreach { _ =>
      val df = randomDf(50)
      val once = Transforms.removeDuplicates(df)
      assert(Transforms.removeDuplicates(once).count() == once.count())
      assert(once.count() <= df.count())
      assert(once.exceptAll(df).count() == 0) // no invented rows
    }
  }

  test("T4 idempotent; T2 then T2 is T2") {
    val df = randomDf(50)
    val t4 = Transforms.trimWhitespace(df)
    assert(rows(Transforms.trimWhitespace(t4)) == rows(t4))
    val t2 = Transforms.removeNullRows(df)
    assert(rows(Transforms.removeNullRows(t2)) == rows(t2))
  }

  test("incremental-load invariant on generated monotone batches") {
    val dir = java.nio.file.Files.createTempDirectory("prop").toString
    val all = (1L to 60L).map(i => (i, s"r$i")).toDF("id", "v")
    val cuts = Seq(10L, 25L, 25L, 47L, 60L) // includes a no-progress batch
    cuts.foreach { c =>
      graft.engine.Extraction.incrementalLoad(
        spark, all.filter($"id" <= c), dir, "t")
    }
    val got = spark.read.parquet(s"$dir/t.parquet")
    assert(got.count() == 60)
    assert(rows(got) == rows(all))
  }
}
