package graft

/** The ≥2-consumer store contract, made structural (VERDICT r11 #4).
  *
  * The artifact stores exist to share paid-once builds across MANY
  * registered queries — an index serving many workloads. A store entry
  * reachable from only ONE registered query would be a cached query
  * result wearing an artifact's clothes: it makes the bench's serve-path
  * rep time the cache, not the plan. This spec sweeps EVERY registered
  * query at sf0.001 with [[ArtifactStore.currentConsumer]] attribution
  * and fails if any store slot recorded exactly one consumer.
  *
  * The sweep doubles as a whole-registry integration pass: all queries
  * execute in one shared session, in registry order.
  */
class StoreContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("audit helper flags a deliberately-added single-consumer cache") {
    val fake = new ArtifactStore[String]("test.singleConsumer")(_ => ())
    ArtifactStore.currentConsumer.set("lonely_query")
    try fake.getOrBuild("slotX", "fp")("value")
    finally ArtifactStore.currentConsumer.remove()
    val flagged = ArtifactStore.singleConsumerSlots
      .filter(_._1 == "test.singleConsumer")
    assert(flagged.map(f => (f._2, f._3)) === Seq(("slotX", Set("lonely_query"))))
    fake.clear()
    assert(!ArtifactStore.singleConsumerSlots.exists(_._1 == "test.singleConsumer"))
  }

  test("every store slot reached by a registered query has >= 2 query consumers") {
    // fresh attribution state: earlier suites touch stores un-attributed
    ArtifactStore.clearAll()
    GraftExtensions.register(spark)
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      ArtifactStore.currentConsumer.set(name)
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(150)
      }
      finally ArtifactStore.currentConsumer.remove()
    }
    assert(failures.isEmpty, s"queries failed during the sweep: $failures")
    val single = ArtifactStore.singleConsumerSlots
      .filterNot(_._1 == "test.singleConsumer")
    assert(single.isEmpty,
      "single-consumer store slots found:\n" +
        single.map { case (st, slot, cs) => s"  $st  $slot  <- $cs" }
          .mkString("\n"))
  }
}
