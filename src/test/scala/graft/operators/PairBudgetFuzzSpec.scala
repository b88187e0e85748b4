package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property fuzz for the [[PairBudget]] gate: random corpora across the
  * sparse↔saturated spectrum, random budgets — the gate's every decision
  * is replayed INDEPENDENTLY in plain Scala over the collected df
  * histogram ([[Dedup.pairMassHistogramForTest]]), so a wrong cumulative
  * window, a rounding slip in the decimal 2·mass arithmetic, or an
  * off-by-one in the "largest fitting cap" choice fails loudly on shapes
  * the hand-written [[DedupBudgetSpec]] cases never drew.
  */
class PairBudgetFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(rnd: scala.util.Random): DataFrame = {
    val vocab = 4 + rnd.nextInt(17) // 4..20 words: saturated..sparse-ish
    val docs = 100 + rnd.nextInt(250)
    val words = Array.tabulate(vocab)(i => s"w$i")
    (0L until docs.toLong).map { i =>
      val len = 8 + rnd.nextInt(8)
      (i, Seq.fill(len)(words(rnd.nextInt(vocab))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Exact Σ n·c·(c−1)/2 over histogram rows with 2 ≤ c ≤ cap. */
  private def massUnder(hist: Seq[(Long, Long)], cap: Int): BigInt =
    hist.collect { case (c, n) if c >= 2 && c <= cap =>
      BigInt(n) * BigInt(c) * BigInt(c - 1) / 2
    }.sum

  /** The gate's contract, replayed: largest cap whose mass fits, ≥ 1. */
  private def expectedFit(hist: Seq[(Long, Long)], configured: Int,
      budget: Long): Int = {
    val caps = hist.collect { case (c, _) if c >= 2 && c <= configured => c }
      .sorted.reverse
    caps.find(c => massUnder(hist, c.toInt) <= BigInt(budget))
      .map(_.toInt).getOrElse(1)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("random corpora × random budgets: gate decisions match the independent replay") {
    val rnd = new scala.util.Random(1204)
    val configured = 1000
    for (round <- 0 until 6) {
      val c = corpus(rnd)
      val hist = Dedup.pairMassHistogramForTest(c, "doc_id", "text")
        .as[(Long, Long)].collect().toSeq
      val mass = massUnder(hist, configured)
      // budgets drawn around the measured mass: clearly under, near, over
      val budget = (mass.toLong.max(1) * (rnd.nextInt(3) match {
        case 0 => 0.1
        case 1 => 0.9
        case _ => 2.0
      })).toLong.max(1)

      // Refuse: fires iff mass > budget, with the exact mass and the
      // maximal fitting cap in the report; otherwise identical to Off
      if (mass > BigInt(budget)) {
        val e = intercept[PairBudgetExceededException] {
          Dedup.ngramJaccardPairs(c, "doc_id", "text",
            budget = PairBudget.Refuse(budget)).count()
        }
        assert(e.pairMass == mass,
          s"round $round: reported mass ${e.pairMass} != replayed $mass")
        assert(e.fittingCap == expectedFit(hist, configured, budget),
          s"round $round: fittingCap ${e.fittingCap} != " +
            s"replayed ${expectedFit(hist, configured, budget)}")
      } else {
        assert(pairSet(Dedup.ngramJaccardPairs(c, "doc_id", "text",
            budget = PairBudget.Refuse(budget))) ==
          pairSet(Dedup.ngramJaccardPairs(c, "doc_id", "text")),
          s"round $round: under-budget Refuse must equal Off")
      }

      // AutoTighten: equals the plain run at the replayed effective cap
      val cap = if (mass <= BigInt(budget)) configured
                else expectedFit(hist, configured, budget)
      val tightened = pairSet(Dedup.ngramJaccardPairs(c, "doc_id", "text",
        budget = PairBudget.AutoTighten(budget)))
      val direct = pairSet(Dedup.ngramJaccardPairs(c, "doc_id", "text",
        maxShingleDf = cap))
      assert(tightened == direct,
        s"round $round: AutoTighten($budget) [mass=$mass] must equal " +
          s"maxShingleDf=$cap: ${(tightened diff direct).take(3)} extra, " +
          s"${(direct diff tightened).take(3)} missing")
      // and the tightened run's own mass fits the budget
      assert(massUnder(hist, cap) <= BigInt(budget) || cap == 1,
        s"round $round: cap $cap mass ${massUnder(hist, cap)} > $budget")
    }
  }
}
