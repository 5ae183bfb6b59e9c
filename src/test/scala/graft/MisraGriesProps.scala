package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.MisraGries

/** Property-based checks (pure JVM — no Spark session) for the
  * Misra–Gries heavy-hitters summary. sbt runs ScalaCheck Properties
  * natively through the test interface.
  */
object MisraGriesProps extends Properties("MisraGries") {

  private val k = 10

  private val streamGen: Gen[List[String]] = for {
    // skewed vocabulary: few hot items + long tail
    hot  <- Gen.listOfN(3, Gen.alphaLowerStr.suchThat(_.nonEmpty))
    n    <- Gen.choose(50, 500)
    toks <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf(if (hot.nonEmpty) hot else List("h")),
      4 -> Gen.alphaLowerStr.suchThat(_.nonEmpty)))
  } yield toks

  private def sketch(toks: List[String]): Map[String, Long] = {
    val mg = new MisraGries(k)
    toks.foldLeft(mg.zero)(mg.reduce)
  }

  property("every item with freq > n/k survives") = Prop.forAll(streamGen) { toks =>
    val s = sketch(toks)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.filter(_._2 > toks.size.toLong / k).keySet.subsetOf(s.keySet)
  }

  property("sketch counts never exceed true counts") = Prop.forAll(streamGen) { toks =>
    val s = sketch(toks)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    s.forall { case (t, c) => c <= exact.getOrElse(t, 0L) }
  }

  property("undercount is bounded by n/k") = Prop.forAll(streamGen) { toks =>
    val s = sketch(toks)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.forall { case (t, c) => c - s.getOrElse(t, 0L) <= toks.size.toLong / k + 1 }
  }

  property("buffer never exceeds k entries") = Prop.forAll(streamGen) { toks =>
    sketch(toks).size <= k
  }

  property("mutable hot-path step is identical to the immutable fold") =
    Prop.forAll(streamGen) { toks =>
      val imm = toks.foldLeft(Map.empty[String, Long])(
        (b, t) => MisraGries.addCount(b, t, 1L, k))
      val m = scala.collection.mutable.Map.empty[String, Long]
      toks.foreach(t => MisraGries.addCountMutable(m, t, 1L, k))
      m.toMap == imm
    }

  property("merge of split streams preserves the heavy-hitter guarantee") =
    Prop.forAll(streamGen, Gen.choose(0.0, 1.0)) { (toks, frac) =>
      val cut = (toks.size * frac).toInt
      val (a, b) = toks.splitAt(cut)
      val mg = new MisraGries(k)
      val merged = mg.merge(sketch(a), sketch(b))
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // merged summaries keep the (2·)n/k guarantee: anything above
      // 2n/k must survive a two-way merge
      exact.filter(_._2 > 2L * toks.size / k).keySet.subsetOf(merged.keySet)
    }
}
