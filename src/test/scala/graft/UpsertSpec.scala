package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.operators.Upsert

/** K8/K7 upsert semantics (README.md:571-575): property — applying a random
  * CDC op sequence through the merge operator equals sequentially applying
  * the ops to a map, for any interleaving of keys, duplicates, and deletes.
  */
case class Change(id: Long, payload: String, op: String, seq: Long)

class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def sequentialApply(target: Map[Long, String], changes: Seq[Change]): Map[Long, String] =
    changes.sortBy(_.seq).foldLeft(target) { (m, c) =>
      if (c.op == "D") m - c.id else m + (c.id -> c.payload)
    }

  test("applyChanges == sequential apply for random CDC sequences (property)") {
    val genChange = for {
      id <- Gen.choose(0L, 8L)
      payload <- Gen.alphaStr.map(_.take(6))
      op <- Gen.frequency(4 -> Gen.const("U"), 2 -> Gen.const("I"), 1 -> Gen.const("D"))
    } yield (id, payload, op)
    val genCase = for {
      targetIds <- Gen.someOf(0L to 8L)
      n <- Gen.choose(0, 25)
      ops <- Gen.listOfN(n, genChange)
    } yield (targetIds.toSeq, ops)

    val prop = Prop.forAllNoShrink(genCase) { case (targetIds, ops) =>
      val changes = ops.zipWithIndex.map { case ((id, p, op), i) =>
        Change(id, p, op, i.toLong)
      }
      val targetMap = targetIds.map(id => id -> s"t$id").toMap
      val expected = sequentialApply(targetMap, changes)

      val target = targetMap.toSeq.map { case (id, p) => (id, p) }.toDF("id", "payload")
      val changesDf = changes.toDF()
      val got = Upsert.applyChanges(target, changesDf.select($"id", $"payload", $"op", $"seq"),
        "id", "op", "seq")
        .select($"id", $"payload").as[(Long, String)].collect().toMap
      got == expected
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("latestPerKey keeps exactly one row per key, the max-seq one") {
    val df = Seq((1L, "a", 1L), (1L, "b", 3L), (1L, "c", 2L), (2L, "x", 9L))
      .toDF("id", "v", "seq")
    val got = Upsert.latestPerKey(df, $"id", $"seq")
      .select($"id", $"v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "x"))
  }

  test("30-digit sequence numbers order correctly as zero-padded strings") {
    val lo = "0" * 10 + "396279487123456789012345678901".take(20)
    val hi = "0" * 9 + "1396279487123456789012345678901".take(21)
    val df = Seq((1L, "old", lo), (1L, "new", hi)).toDF("id", "v", "seq")
    val got = Upsert.latestPerKey(df, $"id", $"seq").select($"v").as[String].head()
    assert(got == "new") // lexical order on equal-width strings == numeric
  }
}
