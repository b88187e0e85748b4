package graft.operators

import graft.SparkTestBase
import graft.model.CdcOp

case class K(id: Int)
case class D(id: Int, v: String)
case class Ev(op: String, ts: Long, seq: Long, key: K, oldKey: Option[K], data: Option[D])

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(evs: Seq[Ev]): (Set[Int], Map[Int, String]) = {
    val batch = Compaction.compact(evs.toDF())
    val dels = batch.deletes.collect().map(_.getInt(0)).toSet
    val ups = batch.upserts.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    (dels, ups)
  }

  private def ins(seq: Long, id: Int, v: String) =
    Ev(CdcOp.Insert, seq, seq, K(id), None, Some(D(id, v)))
  private def upd(seq: Long, id: Int, v: String, oldId: Option[Int] = None) =
    Ev(CdcOp.Update, seq, seq, K(id), oldId.map(K), Some(D(id, v)))
  private def del(seq: Long, id: Int) =
    Ev(CdcOp.Delete, seq, seq, K(id), None, None)

  test("M1: later insert for same key overwrites") {
    val (d, u) = run(Seq(ins(1, 1, "a"), ins(2, 1, "b")))
    assert(d.isEmpty && u == Map(1 -> "b"))
  }

  test("M2: delete cancels pending insert") {
    val (d, u) = run(Seq(ins(1, 1, "a"), del(2, 1)))
    assert(d == Set(1) && u.isEmpty)
  }

  test("M4: update = delete+insert; last write wins") {
    val (d, u) = run(Seq(ins(1, 1, "a"), upd(2, 1, "b"), upd(3, 1, "c")))
    assert(d.isEmpty && u == Map(1 -> "c"))
  }

  test("M3: PK-change update deletes old key and upserts new") {
    val (d, u) = run(Seq(ins(1, 1, "a"), upd(2, 2, "a2", oldId = Some(1))))
    assert(d == Set(1) && u == Map(2 -> "a2"))
  }

  test("M3 chain: A→B→C in one batch deletes A and B, keeps C") {
    val (d, u) = run(Seq(
      ins(1, 1, "a"),
      upd(2, 2, "b", oldId = Some(1)),
      upd(3, 3, "c", oldId = Some(2))))
    assert(d == Set(1, 2) && u == Map(3 -> "c"))
  }

  test("M7: delete of never-inserted key stays in delete set") {
    val (d, u) = run(Seq(del(1, 99)))
    assert(d == Set(99) && u.isEmpty)
  }

  test("delete then re-insert nets to insert") {
    val (d, u) = run(Seq(del(1, 4), ins(2, 4, "back")))
    assert(d.isEmpty && u == Map(4 -> "back"))
  }

  test("property: compact+apply == replay one-by-one (seeded random, 60 rounds)") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 60) {
      val keyDomain = 1 + rnd.nextInt(6)
      val n = 1 + rnd.nextInt(25)
      var seq = 0L
      val evs = (1 to n).map { _ =>
        seq += 1
        val id = 1 + rnd.nextInt(keyDomain)
        rnd.nextInt(4) match {
          case 0 => ins(seq, id, s"v$seq")
          case 1 => del(seq, id)
          case 2 => upd(seq, id, s"v$seq")
          case 3 => // maybe PK-change
            val oldId = 1 + rnd.nextInt(keyDomain)
            if (oldId != id) upd(seq, id, s"v$seq", Some(oldId)) else upd(seq, id, s"v$seq")
        }
      }
      // oracle: replay in seq order against an initial snapshot
      val snap0: Map[Int, String] = (1 to keyDomain).filter(_ % 2 == 0)
        .map(i => i -> s"init$i").toMap
      var model = snap0
      evs.sortBy(_.seq).foreach { e =>
        e.op match {
          case CdcOp.Insert => model += (e.key.id -> e.data.get.v)
          case CdcOp.Update =>
            e.oldKey.foreach(ok => model -= ok.id)
            model += (e.key.id -> e.data.get.v)
          case CdcOp.Delete => model -= e.key.id
        }
      }
      // engine: compact once, then deletes-then-upserts (M6)
      val (d, u) = run(rnd.shuffle(evs)) // order-insensitive by construction
      val applied = (snap0 -- d -- u.keys) ++ u
      assert(applied == model, s"round $round diverged: evs=$evs")
    }
  }
}
