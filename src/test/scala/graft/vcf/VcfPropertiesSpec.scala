package graft.vcf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import VcfFunctions._

/** Property tests for the parser semantics (SURVEY.md §5: the reference
  * has none — these guard the trickiest invariants). Uses ScalaCheck
  * generators with a deterministic hand-rolled sampler (the
  * scalatest-scalacheck bridge isn't a declared dependency).
  */
class VcfPropertiesSpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach { i =>
      gen.apply(params, Seed(i.toLong)).foreach(f)
    }
  }

  test("truncateAt never increases the value and is idempotent") {
    val g = for {
      x <- Gen.chooseNum(-1e6, 1e6)
      p <- Gen.chooseNum(0, 6)
    } yield (x, p)
    forAllN(g) { case (x, p) =>
      val t = truncateAt(x, p)
      assert(t <= x + 1e-9)
      assert(math.abs(x - t) < math.pow(10, -p) + 1e-9)
      assert(truncateAt(t, p) == t)
    }
  }

  test("gqBand is monotone and lands on a declared edge") {
    val edges = Set(0, 20, 25, 30, 35, 40, 45, 50, 70, 90, 99)
    forAllN(Gen.chooseNum(0, 300)) { gq =>
      assert(edges.contains(gqBand(gq)))
      assert(gqBand(gq) <= gq || gq < 20)
      assert(gqBand(gq) <= gqBand(gq + 1))
    }
  }

  test("splitMultiallelic emits at most 2 rows, each alt from the list") {
    val g = for {
      nAlt <- Gen.chooseNum(1, 3)
      alts <- Gen.listOfN(nAlt, Gen.oneOf("A", "C", "G", "T", "AT"))
      a <- Gen.chooseNum(0, 3)
      b <- Gen.chooseNum(0, 3)
      sep <- Gen.oneOf("/", "|")
    } yield (alts.mkString(","), s"$a$sep$b")
    forAllN(g) { case (alt, gt) =>
      val out = splitMultiallelic(alt + ",<NON_REF>", gt)
      val alts = alt.split(",")
      assert(out.length <= 2)
      assert(out.forall(s => alts.contains(s.alt)))
      assert(out.forall(s => Set("0/0", "0/1", "1/1").contains(s.gt)))
      assert(out.map(_.genoTypeNumber).distinct.length == out.length)
    }
  }

  test("cohort freq of any genotype mix stays in [0,1]") {
    val g = Gen.nonEmptyListOf(Gen.oneOf("0/0", "0/1", "1/1"))
    forAllN(g) { l =>
      val alt = l.map { case "1/1" => 2; case "0/1" => 1; case _ => 0 }.sum
      val f = alt.toDouble / (2 * l.size)
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("infoToMap round-trips arbitrary k=v pairs") {
    val kv = for {
      k <- Gen.identifier.map(_.take(8))
      v <- Gen.alphaNumStr.map(_.take(8))
    } yield (k, v)
    forAllN(Gen.mapOf(kv), n = 100) { m =>
      val info = m.map { case (k, v) => s"$k=$v" }.mkString(";")
      val parsed = infoToMap(info)
      m.foreach { case (k, v) => assert(parsed(k) == v) }
    }
  }
}
