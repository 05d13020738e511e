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

  test("payload is atomic: a matched right row's nulls are NOT backfilled from older rows") {
    // r11 review: per-column ignoreNulls carry stitched price from t=10
    // with qty from t=20 — a row that never existed. The struct carry
    // must emit the matched row verbatim, nulls included.
    val l = Seq((1L, 30L)).toDF("k", "ts")
    val r = Seq((1L, 10L, Some(5.0), 2L), (1L, 20L, None, 3L))
      .toDF("k2", "rts", "price", "qty")
    val out = AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "rts").collect()(0)
    assert(out.isNullAt(out.fieldIndex("asof_price")))
    assert(out.getAs[Long]("asof_qty") == 3L)
  }

  test("null right timestamps and null keys never match (join semantics)") {
    // a null rts sorted first would otherwise match EVERY left row; null
    // keys would pair through partitionBy's null grouping
    val l = Seq((Some(1L), 30L, "a"), (None, 30L, "nullkey"))
      .toDF("k", "ts", "tag")
    val r = Seq((Some(1L), None, 42.0), (None, Some(5L), 99.0))
      .toDF("k2", "rts", "px")
    assert(AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "rts").count() == 0)
    val leftJoin = AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "rts",
      joinType = "left").collect()
    assert(leftJoin.length == 2 &&
      leftJoin.forall(_.isNullAt(3))) // kept, payload null
  }

  test("reserved/colliding column names fail loudly at the API boundary") {
    val l = Seq((1L, 2L, 3.0)).toDF("k", "ts", "asof_px")
    val r = Seq((1L, 1L, 9.0)).toDF("k2", "rts", "px")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, "k", "k2", "ts", "rts")
    }.getMessage.contains("collide"))
    val l2 = Seq((1L, 2L)).toDF("__k", "ts")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l2, r, "__k", "k2", "ts", "rts")
    }.getMessage.contains("reserves"))
    // case-insensitive (Spark resolution is): __TS used to slip past
    // the guard and clobber/ambiguate inside the plan (code-review r14)
    val l3 = Seq((1L, 2L, 5L)).toDF("k", "ts", "__TS")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l3, r, "k", "k2", "ts", "rts")
    }.getMessage.contains("reserves"))
    // __seen is the payload struct's marker field — a right payload
    // column of that name duplicated it (AMBIGUOUS_REFERENCE deep in
    // the plan before the guard covered it)
    val r2 = Seq((1L, 1L, 9.0)).toDF("k2", "rts", "__seen")
    val lOk = Seq((1L, 2L)).toDF("k", "ts")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(lOk, r2, "k", "k2", "ts", "rts")
    }.getMessage.contains("reserves"))
  }

  test("string-vs-numeric ts or key pairs refuse instead of comparing lexicographically") {
    // union widening would coerce to STRING where '99' > '100' — a
    // silently wrong as-of match (code-review r14)
    val l = Seq((1L, "100")).toDF("k", "ts")
    val r = Seq((1L, 99L, 9.0)).toDF("k", "rts", "px")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, "k", "k", "ts", "rts")
    }
    assert(e.getMessage.contains("lexicographically"), e.getMessage)
    val l2 = Seq(("1", 100L)).toDF("k", "ts")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l2, r, "k", "k", "ts", "rts")
    }
    assert(e2.getMessage.contains("lexicographically"), e2.getMessage)
    // the guard's lookup is case-insensitive like Spark's resolution:
    // a case-mismatched name must not crash a join that itself works
    val lc = Seq((1L, 100L)).toDF("k", "Ts")
    val out = AsOfJoin.asofJoin(lc, r, "k", "k", "ts", "rts")
    assert(out.count() == 1)
    // ...and a case-mismatched rightKey/rightTs must not LEAK the
    // key/ts into the prefixed payload (code-review r18)
    val outCols = AsOfJoin.asofJoin(lc,
      r.toDF("k", "Rts", "px"), "k", "k", "ts", "rts").columns.toSeq
    assert(outCols == Seq("k", "Ts", "asof_px"), outCols.toString)
    // integral-vs-floating pairs refuse too (code-review r18): the
    // union widens to double, exact only to 2^53 — epoch-nanos longs
    // collapse adjacent values there and a right row 1ns in the
    // FUTURE could round equal and match "at-or-before"
    val lf = Seq((1L, 100L)).toDF("k", "ts")
    val rf = Seq((1L, 99.0, 9.0)).toDF("k", "rts", "px")
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(lf, rf, "k", "k", "ts", "rts")
    }
    assert(e3.getMessage.contains("2^53"), e3.getMessage)
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
