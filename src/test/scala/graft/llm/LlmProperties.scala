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

  // ---- fuzzy deletion-blocking completeness (Fuzzy.keyPairs relies on
  // this: any pair within levenshtein 1 MUST share a del1 variant, or the
  // blocked join silently loses it) ----

  private val shortStr: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)

  private def mutate(s: String): Gen[String] = {
    val sub = for {
      i <- Gen.chooseNum(0, s.length - 1); c <- Gen.alphaNumChar
    } yield s.substring(0, i) + c + s.substring(i + 1)
    val ins = for {
      i <- Gen.chooseNum(0, s.length); c <- Gen.alphaNumChar
    } yield s.substring(0, i) + c + s.substring(i)
    val del = Gen.chooseNum(0, s.length - 1)
      .map(i => s.substring(0, i) + s.substring(i + 1))
    Gen.oneOf(sub, ins, del)
  }

  property("del1 neighborhoods intersect for every distance<=1 mutation") =
    forAll(shortStr.flatMap(s => mutate(s).map((s, _)))) { case (a, b) =>
      Fuzzy.del1(a).toSet.intersect(Fuzzy.del1(b).toSet).nonEmpty
    }

  property("del1 emits the string plus at most len deletions, each 1 shorter") =
    forAll(shortStr) { s =>
      val d = Fuzzy.del1(s)
      d.contains(s) && d.length <= s.length + 1 &&
        d.filterNot(_ == s).forall(_.length == s.length - 1)
    }

  // ---- normalization canonicality ----

  private val messyText: Gen[String] = {
    val piece = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(" ", "\t", "\n", "  ", "Café", "CAFÉ", "ﬁ", "ＡＢ"))
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
  }

  property("normalize is idempotent") = forAll(messyText) { s =>
    val once = Normalize.normalize(s)
    Normalize.normalize(once) == once
  }

  property("normalize output has no edge/doubled whitespace or uppercase") =
    forAll(messyText) { s =>
      val n = Normalize.normalize(s)
      n == n.trim && !n.contains("  ") && !n.exists(c => c.isUpper) &&
        !n.exists(c => c == '\t' || c == '\n')
    }

  // random text over an alphabet rich in boundary cases: markers,
  // marker-substring words ("sand" contains "and"), punctuation glued to
  // markers, digits, CJK, tabs/newlines, empty runs
  private val fuzzTokenGen = Gen.oneOf(
    "the", "and", "of", "el", "la", "de", "es", "und", "der", "le", "est",
    "sand", "theory", "android", "hand", "lathe", "the,", "(the)", "the.",
    "x", "42", "a_b", "the_", "_the", "的", "是了", "word", "", "  ")
  private val fuzzTextGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, fuzzTokenGen))
      .flatMap(ws => Gen.oneOf(" ", "  ", "\t", "\n").map(sep => ws.mkString(sep)))

  property("countMarkers == java.util.regex marker count (all languages)") =
    forAll(fuzzTextGen) { text =>
      val lower = text.toLowerCase
      TextStats.LangMarkers.forall { case (_, words) =>
        val ascii = words.forall(_.forall(c => c.isLetterOrDigit && c < 128))
        val pattern = java.util.regex.Pattern.compile(TextStats.markerPattern(words))
        val m = pattern.matcher(lower)
        var regexCount = 0
        while (m.find()) regexCount += 1
        TextStats.countMarkers(lower, words.toArray, boundaries = ascii) == regexCount
      }
    }

  property("quantization round-trips within half a step") =
    forAll(Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)))) { xs =>
      var amax = 0d
      xs.foreach(x => amax = math.max(amax, math.abs(x.toDouble)))
      val scale = if (amax == 0) 1d else amax / 127d
      xs.forall { x =>
        val r = math.min(127L, math.round(math.abs(x.toDouble) / scale))
        val q = if (x < 0) -r else r
        math.abs(x.toDouble - q * scale) <= scale / 2 + 1e-12
      }
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
