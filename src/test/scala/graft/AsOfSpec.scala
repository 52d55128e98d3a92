package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left row") {
    val purchases = Seq(
      (100L, 1L, ts("2024-05-01 10:00:00")),  // two prior clicks -> latest wins
      (101L, 1L, ts("2024-05-01 08:00:00")),  // exact-tie click matches (>= rule)
      (102L, 2L, ts("2024-05-01 09:00:00")),  // no prior click -> null
      (103L, 3L, ts("2024-05-01 12:00:00"))   // later click ignored
    ).toDF("event_id", "user_id", "t")
    val clicks = Seq(
      (200L, 1L, ts("2024-05-01 07:00:00")),
      (201L, 1L, ts("2024-05-01 08:00:00")),
      (202L, 1L, ts("2024-05-01 09:30:00")),
      (203L, 2L, ts("2024-05-01 09:30:00")),
      (204L, 3L, ts("2024-05-01 13:00:00"))
    ).toDF("click_id", "user_id", "ct")

    val out = AsOf.asOfJoin(purchases, clicks, "user_id", "t", "ct")
      .select($"event_id", $"right_click_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(out(100L).contains(202L), "latest of the prior clicks")
    assert(out(101L).contains(201L), "click at exactly the purchase time matches")
    assert(out(102L).isEmpty, "no click at-or-before -> null")
    assert(out(103L).isEmpty, "future clicks never match")
  }

  test("as-of join never matches null keys; null-keyed left rows keep left-join nulls") {
    val left = Seq(
      (1L, Option(5L), ts("2024-05-01 10:00:00")),
      (2L, Option.empty[Long], ts("2024-05-01 10:00:00"))
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, Option(5L), ts("2024-05-01 09:00:00")),
      (11L, Option.empty[Long], ts("2024-05-01 09:00:00")) // must match nothing
    ).toDF("click_id", "user_id", "ct")
    val out = AsOf.asOfJoin(left, right, "user_id", "t", "ct")
      .select($"event_id", $"right_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(10L))
    assert(out(2L).isEmpty,
      "NULL = NULL never matches in equi/as-of semantics; left row still emitted")
  }

  test("as-of join is deterministic when right rows tie on the timestamp") {
    val left = Seq((1L, 7L, ts("2024-05-01 10:00:00"))).toDF("event_id", "user_id", "t")
    val right = Seq(
      (20L, 7L, ts("2024-05-01 09:00:00")),
      (21L, 7L, ts("2024-05-01 09:00:00")) // same key, same timestamp
    ).toDF("click_id", "user_id", "ct")
    def run(parts: Int): Long = AsOf.asOfJoin(
        left, right.repartition(parts), "user_id", "t", "ct")
      .select($"right_click_id").as[Long].collect()(0)
    val picks = (1 to 4).map(run).toSet
    assert(picks.size == 1, s"tie pick must not depend on partitioning: $picks")
  }

  test("forward as-of join picks the earliest right row at-or-after each left row") {
    val clicks = Seq(
      (1L, 7L, ts("2024-05-01 10:00:00")),  // two later purchases -> earliest wins
      (2L, 7L, ts("2024-05-01 12:00:00")),  // exact-tie purchase matches (<= rule)
      (3L, 7L, ts("2024-05-01 15:00:00")),  // nothing after -> null
      (4L, 8L, ts("2024-05-01 10:00:00"))   // earlier purchase ignored
    ).toDF("click_id", "user_id", "t")
    val purchases = Seq(
      (20L, 7L, ts("2024-05-01 11:00:00")),
      (21L, 7L, ts("2024-05-01 12:00:00")),
      (22L, 8L, ts("2024-05-01 09:00:00"))
    ).toDF("purchase_id", "user_id", "pt")
    val out = AsOf.asOfJoinForward(clicks, purchases, "user_id", "t", "pt")
      .select($"click_id", $"right_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(20L), "earliest of the following purchases")
    assert(out(2L).contains(21L), "purchase at exactly the click time matches")
    assert(out(3L).isEmpty, "no purchase at-or-after -> null")
    assert(out(4L).isEmpty, "past purchases never match forward")
  }

  test("range join: inclusive at the window boundary, excludes beyond and cross-key") {
    val events = Seq(
      (1L, 10L, ts("2024-05-01 10:00:00")),
      (2L, 10L, ts("2024-05-01 10:01:00")),  // exactly 60s from #1 -> pair
      (3L, 10L, ts("2024-05-01 10:02:01")),  // 61s from #2 -> no pair with #2
      (4L, 20L, ts("2024-05-01 10:00:30"))   // other user -> never pairs
    ).toDF("event_id", "user_id", "t")
    val pairs = graft.operators.RangeJoin
      .selfPairsWithin(events, "user_id", "event_id", "t", 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected only the boundary-inclusive same-user pair, got $pairs")
  }
}
