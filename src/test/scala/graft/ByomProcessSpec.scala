package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.ml.ByomProcessEngine

/** BYOM out-of-process boundary: the engine runs in a forked JVM with the
  * create/predict contract; killing the child must never take the
  * session down (ml_exec_base.py / process_cache.py semantics). */
class ByomProcessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("byom-spec")

  test("create/predict round-trips through the forked worker") {
    val eng = new ByomProcessEngine
    try {
      // y = 2x + 1, exactly recoverable by OLS
      eng.create(Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0), (3.0, 7.0)))
      assert(eng.isAlive)
      assert(eng.predict(Seq(10.0, -1.0)) === Seq(21.0, -1.0))
      // the engine really is OUT of process
      assert(eng.pid !== ProcessHandle.current().pid())
    } finally eng.close()
  }

  test("killing the child respawns it with trained state; the session survives") {
    val eng = new ByomProcessEngine
    try {
      eng.create(Seq((0.0, 0.0), (1.0, 2.0), (2.0, 4.0))) // y = 2x
      val pid1 = eng.pid
      eng.kill()
      assert(!eng.isAlive)
      // next predict transparently respawns and re-creates the model
      assert(eng.predict(Seq(5.0)) === Seq(10.0))
      assert(eng.isAlive)
      assert(eng.pid !== pid1)
      assert(eng.respawnCount === 1)
      // parent JVM + Spark session untouched by the child's death
      assert(spark.range(3).count() === 3)
    } finally eng.close()
  }

  test("a crash injected mid-protocol recovers on the following call") {
    val eng = new ByomProcessEngine
    try {
      eng.create(Seq((0.0, 1.0), (2.0, 1.0))) // constant model y = 1
      eng.injectCrash()
      assert(!eng.isAlive)
      assert(eng.predict(Seq(7.0)) === Seq(1.0))
      assert(eng.respawnCount >= 1)
    } finally eng.close()
  }

  test("engine errors answer over the pipe without killing the worker") {
    val eng = new ByomProcessEngine
    try {
      val e = intercept[IllegalArgumentException](eng.create(Seq.empty))
      assert(e.getMessage.contains("create failed"))
      assert(eng.isAlive, "a handled engine error must not kill the process")
    } finally eng.close()
  }
}
