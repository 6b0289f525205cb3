package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-string properties of the BPE merge-application loop —
  * `TextAnalysis.bpeApply`'s algebra replicated exactly as the engines
  * evaluate it: ' A B ' → ' AB ' literal replaces, 3 passes per merge,
  * `java.lang.String.replace` left-to-right continue-after-match (the
  * semantics TextEvalSpec pins equal across Spark, DuckDB and the
  * driver replay). These are the invariants both cross-engine hash
  * equality and the tokenizer's fitness rest on: because every merge
  * pattern carries BOTH delimiting spaces, a match always aligns to
  * whole-symbol boundaries, so a merge can only delete the one space
  * between its two symbols — tokenization is LOSSLESS (characters are
  * never created, dropped or reordered) and MONOTONE (the symbol
  * count never grows), for ANY merge list, not just learned ones.
  */
object BpeProps extends Properties("BpeApply") {

  private def init(tok: String): String = tok.toCharArray.mkString(" ", " ", " ")

  private def applyMerge(st: String, pr: (String, String)): String = {
    val pat = " " + pr._1 + " " + pr._2 + " "
    val rep = " " + pr._1 + pr._2 + " "
    (1 to 3).foldLeft(st)((e, _) => e.replace(pat, rep))
  }

  private val sym: Gen[String] = for {
    n  <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')) // tiny alphabet → dense matches
  } yield cs.mkString

  private val tok: Gen[String] = for {
    n  <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val merges: Gen[List[(String, String)]] =
    Gen.listOf(Gen.zip(sym, sym)).map(_.take(12))

  property("lossless: stripping spaces recovers the token exactly") =
    Prop.forAll(tok, merges) { (t, ms) =>
      ms.foldLeft(init(t))(applyMerge).replace(" ", "") == t
    }

  property("monotone: no merge step ever increases the symbol count; at least one symbol survives") =
    Prop.forAll(tok, merges) { (t, ms) =>
      val counts = ms.scanLeft(init(t))(applyMerge).map(_.trim.split(" ").length)
      counts.last >= 1 && counts.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _         => true
      }
    }

  property("boundary-aligned: the state is always space-wrapped single-spaced symbols") =
    Prop.forAll(tok, merges) { (t, ms) =>
      val st = ms.foldLeft(init(t))(applyMerge)
      st.startsWith(" ") && st.endsWith(" ") && !st.contains("  ")
    }
}
