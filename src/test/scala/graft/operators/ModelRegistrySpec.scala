package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ModelRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("publish always retrains and overwrites; read-through trains once") {
    val trains = new AtomicInteger(0)
    def train(): Integer = Integer.valueOf(trains.incrementAndGet())
    val k = "spec-model-a"
    assert(ModelRegistry.publish(k)(train()) == 1)
    assert(ModelRegistry.publish(k)(train()) == 2)   // producer retrains
    assert(ModelRegistry.getOrTrain(k)(train()) == 2) // consumer reuses
    assert(trains.get() == 2)
    val k2 = "spec-model-b"
    assert(ModelRegistry.getOrTrain(k2)(train()) == 3) // miss trains
    assert(ModelRegistry.getOrTrain(k2)(train()) == 3) // then caches
  }

  test("table keys are session-scoped and stale-session tables are swept") {
    val live = ModelRegistry.tableKey(spark, "spec-pairs")
    assert(live.contains(spark.sparkContext.applicationId))
    // plant a table under a dead session's key, then publish under the
    // live session — the sweep must remove the dead entry but keep live
    val dead = "tbl:deadapp-0000:spec-pairs"
    ModelRegistry.publishTable(dead)(Seq(1L).toDF("x"))
    val t = ModelRegistry.publishTable(live)(Seq(2L).toDF("x"))
    assert(t.as[Long].collect().toSeq == Seq(2L))
    assert(ModelRegistry.lookupTable(dead).isEmpty, "stale entry survived")
    assert(ModelRegistry.lookupTable(live).isDefined)
    // read-through returns the published table, not a recompute
    val again = ModelRegistry.getOrComputeTable(live)(
      sys.error("must not recompute"))
    assert(again.as[Long].collect().toSeq == Seq(2L))
  }

  test("published tables are materialized (checkpoint survives source mutation)") {
    val key = ModelRegistry.tableKey(spark, "spec-materialized")
    var rows = Seq(10L)
    val t = ModelRegistry.publishTable(key)(rows.toDF("x"))
    rows = Seq(99L) // mutating the source after publish must not matter
    assert(t.as[Long].collect().toSeq == Seq(10L))
  }
}
