package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** T11 salting: multiset preservation, determinism, and two-phase agg
  * equivalence on a synthetically skewed key distribution.
  */
class SaltingSpec extends SparkSuite {
  import spark.implicits._

  // 90% of rows on one hot key
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"key-${i % 7}" else "hot-key", i.toLong, i * 0.5)
  }.toDF("k", "id", "v").cache()

  test("salting spreads the hot key across buckets and preserves the multiset") {
    val salted = Salting.withSaltedKey(skewed, $"k", $"id", 16)
    assert(salted.count() == 10000)
    val hotBuckets = salted.where($"k" === "hot-key")
      .select($"salted_key").distinct().count()
    assert(hotBuckets >= 12, s"hot key only spread over $hotBuckets buckets")
    // deterministic: same input → same salted keys
    val again = Salting.withSaltedKey(skewed, $"k", $"id", 16)
      .select($"id", $"salted_key").as[(Long, String)].collect().toMap
    val first = salted.select($"id", $"salted_key").as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy($"k".as("key"))
      .agg(sum($"v").as("total"), count(lit(1)).as("n"), max($"v").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val salted = Salting.saltedAgg(skewed, $"k", $"id", 16,
      partials = Map("total" -> sum($"v"), "n" -> count(lit(1)), "mx" -> max($"v")),
      finals = Map("total" -> sum($"total"), "n" -> sum($"n").cast("long"), "mx" -> max($"mx")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    // doubles summed in different order: compare with tolerance
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (t, n, mx)) =>
      val (t2, n2, mx2) = salted(k)
      assert(math.abs(t - t2) < 1e-6 && n == n2 && mx == mx2, s"key $k")
    }
  }
}
