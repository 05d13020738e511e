package graft

import graft.plans.AsOfJoin

/** As-of join semantics: latest right row at-or-before each left row. */
class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 15L, "t3")).toDF("acct", "ts", "trade")
  val quotes = Seq(
    (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 18L, 102.0),
    (2L, 99L, 500.0)).toDF("acct_id", "qts", "px")

  test("inner: greatest right ts <= left ts per key; >= tie matches; no prior → dropped") {
    val out = AsOfJoin.asofJoin(trades, quotes,
      "acct", "acct_id", "ts", "qts").collect()
      .map(r => (r.getAs[String]("trade"), r.getAs[Double]("asof_px"))).toSet
    // t0@5: no quote <=5 → dropped; t1@10: quote@10 (tie) → 101;
    // t2@20: quote@18 → 102; t3@15: no acct-2 quote <=15 → dropped
    assert(out == Set(("t1", 101.0), ("t2", 102.0)))
  }

  test("left: unmatched rows kept with null payload; left columns intact") {
    val out = AsOfJoin.asofJoin(trades, quotes,
      "acct", "acct_id", "ts", "qts", joinType = "left")
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("acct", "ts", "trade", "asof_px"))
    val t0 = out.filter($"trade" === "t0").collect()(0)
    assert(t0.isNullAt(t0.fieldIndex("asof_px")))
  }

  test("matches the quadratic reference implementation on a larger frame") {
    val rng = new scala.util.Random(7)
    val left = Seq.fill(200)((rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      .toDF("k", "ts", "lid")
    val right = Seq.fill(80)((rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
      .distinct.map { case (k, ts) => (k, ts, k * 10000 + ts) }
      .toDF("rk", "rts", "payload")
    val fast = AsOfJoin.asofJoin(left, right, "k", "rk", "ts", "rts")
      .select("lid", "asof_payload").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // quadratic oracle: max rts <= ts per key (payload = k*10000+rts is
    // monotone in rts, so max payload == payload of max rts)
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = left.collect().flatMap { lr =>
      val (k, ts, lid) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val cands = rightRows.filter(q => q._1 == k && q._2 <= ts)
      if (cands.isEmpty) None else Some(lid -> cands.maxBy(_._2)._3)
    }.toMap
    assert(fast == slow)
  }
}
