package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the pure kernels behind the dedup/similarity operators. */
object LlmProperties extends Properties("llm") {

  private val wordGen = Gen.oneOf(
    "spark", "query", "join", "filter", "table", "row", "scan", "agg",
    "merge", "sort", "hash", "batch", "stream", "key", "value")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val u = a.union(b).size
    if (u == 0) 0d else a.intersect(b).size.toDouble / u
  }

  property("jaccard bounds and identity") = forAll(textGen, textGen) { (a, b) =>
    val sa = a.split("\\s+").filter(_.nonEmpty).toSet
    val sb = b.split("\\s+").filter(_.nonEmpty).toSet
    val j = jaccard(sa, sb)
    j >= 0d && j <= 1d && (sa.isEmpty || jaccard(sa, sa) == 1d)
  }

  property("mix constants are distinct bijection keys") = {
    val mixes = Dedup.mixConstants(256)
    org.scalacheck.Prop(mixes.distinct.length == 256)
  }

  property("xor permutation preserves distinctness") =
    forAll(Gen.listOf(Gen.long), Gen.long) { (hs, k) =>
      val d = hs.distinct
      d.map(_ ^ k).distinct.length == d.length
    }

  property("cosine of a vector with itself is 1") =
    forAll(Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10d, 10d)))) { xs =>
      val norm = math.sqrt(xs.map(x => x * x).sum)
      norm == 0d || {
        val dot = xs.map(x => x * x).sum
        math.abs(dot / (norm * norm) - 1d) < 1e-9
      }
    }
}
