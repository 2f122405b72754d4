package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.recipes.Prep

/** W2 prep pipeline invariants: structural shape of the synthesized
  * recipes, split coverage/determinism, truncation bookkeeping. */
class PrepSpec extends AnyFunSuite {
  import TestSpark._

  test("recipe synthesis partitions every document's tokens") {
    val r = Prep.recipes(spark, Sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getString(1).split(" ").length == 3) // title
      assert(row.getSeq[String](2).length <= 7)       // ingredients
    }
  }

  test("formatted targets carry the Title/Ingredients/Directions template") {
    val f = Prep.formatted(spark, Sf0001).collect()
    f.foreach { row =>
      val target = row.getString(2)
      assert(target.startsWith("Title: "))
      assert(target.contains("\nIngredients:\n- "))
      assert(target.contains("\nDirections:\n"))
      assert(row.getString(1).startsWith("Generate a structured recipe for: "))
    }
  }

  test("splits cover every recipe exactly once, deterministically, within truncation caps") {
    def run() = SparkEntry.queries("q65_recipe_splits")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))).toSeq
    val a = run()
    assert(a == run())
    assert(a.map(_._2).sum == Prep.formatted(spark, Sf0001).count())
    a.foreach { case (_, _, _, _, p128, t256) =>
      assert(p128 <= 128 && t256 <= 256)
    }
  }
}
