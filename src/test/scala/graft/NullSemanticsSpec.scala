package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{AsofJoin, Salting, SimHash, Upsert}

/** Null-handling contracts across the operator library — three-valued
  * logic must never silently lose, duplicate, or mis-attribute rows.
  */
class NullSemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("CDC upsert treats NULL as one merge key: replaced, not duplicated") {
    val target = Seq((Option.empty[Long], "old"), (Some(1L), "a"))
      .toDF("id", "payload")
    val changes = Seq((Option.empty[Long], "new", "U", 1L))
      .toDF("id", "payload", "op", "seq")
    val out = Upsert.applyChanges(target, changes, "id", "op", "seq")
      .select($"id", $"payload").collect().map(r => Option(r.get(0)) -> r.getString(1))
    assert(out.count(_._1.isEmpty) == 1, s"exactly one null-key row: ${out.toSeq}")
    assert(out.find(_._1.isEmpty).get._2 == "new")
  }

  test("CDC upsert: a NULL op upserts — a malformed record must never silently delete") {
    val target = Seq((1L, "a")).toDF("id", "payload")
    val changes = Seq((1L, "b", Option.empty[String], 2L)).toDF("id", "payload", "op", "seq")
    val out = Upsert.applyChanges(target, changes, "id", "op", "seq")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "b"))
  }

  test("as-of join never matches NULL keys to each other") {
    val left = Seq((Option.empty[Long], ts("12:00"), 1L), (Some(7L), ts("12:00"), 2L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((Option.empty[Long], ts("10:00"), 99.0), (Some(7L), ts("10:00"), 42.0))
      .toDF("user_id", "ts", "v")
    val out = AsofJoin.backward(left, right, "user_id", "ts", "ts", Seq("v"))
      .select($"event_id", $"v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).contains(42.0), "real key matches its version")
    assert(out(1L).isEmpty, "null-key event must get NULL, not another null-key row's value")
  }

  test("salting spreads NULL keys across buckets instead of one reducer") {
    val df = (1 to 100).map(i => (Option.empty[String], i.toLong)).toDF("k", "tb")
    val salted = Salting.withSaltedKey(df, $"k", $"tb", buckets = 8)
    val distinctSalted = salted.select($"salted_key").distinct().count()
    assert(distinctSalted > 1, s"null keys must salt into many sub-keys, got $distinctSalted")
    assert(salted.where($"salted_key".isNull).count() == 0)
  }

  test("SimHash is total: token-less docs get fingerprint 0, pairs referencing them survive") {
    val docs = Seq((1L, "alpha beta gamma words here"), (2L, "!!! ???"), (3L, null: String))
      .toDF("doc_id", "text")
    val fps = SimHash.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fps.keySet == Set(1L, 2L, 3L), s"every doc fingerprinted: $fps")
    assert(fps(2L) == 0L && fps(3L) == 0L)
    val bits = SimHash.fingerprintBits(docs, "doc_id", "text")
    val dist = SimHash.hammingOnPairs(Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), bits)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(dist.keySet == Set((1L, 2L), (2L, 3L)), "no requested pair may vanish")
    assert(dist((2L, 3L)) == 0L, "two empty docs are identical")
  }

  test("langId of NULL text is 'und', never a concrete language") {
    val out = Seq((1L, null: String), (2L, "the cat and the dog in the house is it"))
      .toDF("id", "text")
      .select($"id", TextFunctions.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "und" && out(2L) == "en")
  }

  private def ts(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")
}
