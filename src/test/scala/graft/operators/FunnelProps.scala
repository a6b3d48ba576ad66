package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[RelationalQueries.funnelStages]] vs a sequential brute-force scan:
  * the distributed list-algebra staging must equal the obvious one-pass
  * algorithm on ord-sorted events, across random event streams, stage
  * alphabets, window sizes, and adversarial shapes (events sharing no
  * stage type, stages reached exactly at the window boundary, repeated
  * stage types).
  */
class FunnelProps extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  /** Brute force: scan events in ord order, advancing the stage cursor
    * when the next stage's type appears within the window of the last
    * anchor. Equivalent to the anchor-min formulation because events are
    * scanned in ascending ord: the first qualifying event IS the min. */
  private def bruteStage(evs: Seq[(Long, String)], stages: Seq[String],
                         window: Long): Int = {
    var stage = 0
    var anchor = 0L
    for ((ord, typ) <- evs.sortBy(_._1) if stage < stages.length) {
      val need = stages(stage)
      val inWindow = stage == 0 || (ord > anchor && ord <= anchor + window)
      if (typ == need && inWindow) { anchor = ord; stage += 1 }
    }
    stage
  }

  test("matches brute force on seeded random event streams") {
    val rnd = new scala.util.Random(19)
    val types = Seq("a", "b", "c", "d")
    for (trial <- 0 until 6) {
      val stages = rnd.shuffle(types).take(2 + rnd.nextInt(2))
      val window = 3L + rnd.nextInt(12)
      val nUsers = 4 + rnd.nextInt(5)
      val rows = for {
        u <- 0 until nUsers
        _ <- 0 until (3 + rnd.nextInt(20))
      } yield (u.toLong, rnd.nextInt(200).toLong,
        types(rnd.nextInt(types.length)))
      // distinct ords per user — ties would make "first" ambiguous in the
      // brute force while array_min stays deterministic
      val evs = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val want = evs.groupBy(_._1).map { case (u, es) =>
        u -> bruteStage(es.map(e => (e._2, e._3)), stages, window)
      }
      val got = RelationalQueries.funnelStages(
          evs.toDF("uid", "ord", "typ"), "uid", "ord", "typ", stages, window)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"trial $trial stages=$stages window=$window")
    }
  }

  test("a hot-key user's history outside the anchor horizon cannot " +
      "change the result (and the funnel still matches brute force)") {
    // One bot user with 20k stage-typed events spread FAR past the
    // horizon, plus late-arriving stage types that would advance the
    // funnel only if the horizon prune were wrong; uniform users beside
    // it. The r8 form collected all 20k rows into one array cell — the
    // guard must keep the answer identical while only the horizon slice
    // reaches the collect.
    val stages = Seq("view", "click", "purchase")
    val window = 10L
    val bot = (0 until 20000).map { i =>
      val typ = stages(i % 3)
      (99L, 1000L + i * 100L, typ) // 100-apart: every window misses
    }
    // inside the horizon of bot's first view (ord 1000): a click at
    // +5 and a purchase at +9 → bot reaches stage 3
    val inWindow = Seq((99L, 1005L, "click"), (99L, 1009L, "purchase"))
    val uniform = Seq(
      (1L, 1L, "view"), (1L, 5L, "click"),            // stage 2
      (2L, 1L, "click"), (2L, 2L, "purchase"),        // stage 0 (no view)
      (3L, 1L, "view"), (3L, 20L, "click"))           // stage 1 (late click)
    val evs = bot ++ inWindow ++ uniform
    val want = evs.groupBy(_._1).map { case (u, es) =>
      u -> bruteStage(es.map(e => (e._2, e._3)), stages, window)
    }
    val got = RelationalQueries.funnelStages(
        evs.toDF("uid", "ord", "typ"), "uid", "ord", "typ", stages, window)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(got(99L) == 3)  // the in-horizon chain, not the far history
    assert(got(2L) == 0)   // no stage-0 event → re-attached as stage 0
  }

  test("window boundary is inclusive; restart within a user never happens") {
    // view@10, click@20 (exactly +10), purchase@31 (one past +10 from 20)
    val evs = Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 31L, "purchase"))
    val got = RelationalQueries.funnelStages(
        evs.toDF("u", "o", "t"), "u", "o", "t",
        Seq("view", "click", "purchase"), window = 10L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2)) // click lands inclusively; purchase is late
  }

  test("a stage type occurring before its turn does not advance the funnel") {
    // purchase first, then view: purchase must not count for stage 3
    val evs = Seq((1L, 1L, "purchase"), (1L, 2L, "view"), (1L, 3L, "click"))
    val got = RelationalQueries.funnelStages(
        evs.toDF("u", "o", "t"), "u", "o", "t",
        Seq("view", "click", "purchase"), window = 10L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2)) // view@2 → click@3 → no purchase after 3
  }
}
