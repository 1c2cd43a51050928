package graft.ml

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import graft.server.Json
import Json.{Arr, Num, Obj, Str, Value}

/** BYOM out-of-process execution seam — the reference runs user-supplied
  * engine code in separate processes (integrations/libs/ml_exec_base.py
  * learn_process/predict_process dispatching through
  * process_cache.py), so an engine crash can never take the server
  * down. This is that boundary re-expressed for the JVM: the engine
  * lives in a FORKED java process speaking a line-delimited JSON
  * create/predict protocol over stdin/stdout; the parent session holds
  * only the pipe.
  *
  * Contract per request line:
  *   {"op":"create","rows":[[x,y],…]}           → {"ok":true}
  *   {"op":"predict","rows":[[x],…]}            → {"ok":true,"preds":[…]}
  *   {"op":"ping"}                              → {"ok":true}
  * Any engine failure answers {"ok":false,"error":…} — the process stays
  * up; a killed process is detected on next use and respawned with its
  * trained state re-created from the retained training payload (the
  * reference equivalently re-enqueues onto a fresh worker).
  */
object ByomWorker {
  /** Child main: a tiny OLS engine behind the protocol. Deliberately
    * NO SparkSession — the child is plain JVM, like the reference's
    * spawned learn/predict processes are plain python. */
  def main(args: Array[String]): Unit = {
    val in = new BufferedReader(new InputStreamReader(System.in, "UTF-8"))
    val out = new PrintWriter(new java.io.OutputStreamWriter(System.out, "UTF-8"), true)
    var slope = 0.0
    var intercept = 0.0
    var line = in.readLine()
    while (line != null) {
      val resp: Value =
        try {
          val req = Json.parse(line)
          req("op").asString match {
            case "ping" => Json.obj("ok" -> Json.Bool(true))
            case "create" =>
              val rows = req("rows").asArray.map(_.asArray.map {
                case Num(n, _) => n
                case v => sys.error(s"non-numeric $v")
              })
              require(rows.nonEmpty, "empty training set")
              val n = rows.length.toDouble
              val mx = rows.map(_(0)).sum / n
              val my = rows.map(_(1)).sum / n
              val sxx = rows.map(r => (r(0) - mx) * (r(0) - mx)).sum
              val sxy = rows.map(r => (r(0) - mx) * (r(1) - my)).sum
              slope = if (sxx == 0) 0.0 else sxy / sxx
              intercept = my - slope * mx
              Json.obj("ok" -> Json.Bool(true),
                "slope" -> Json.num(slope), "intercept" -> Json.num(intercept))
            case "predict" =>
              val xs = req("rows").asArray.map(_.asArray.head match {
                case Num(x, _) => x
                case v => sys.error(s"non-numeric $v")
              })
              Json.obj("ok" -> Json.Bool(true),
                "preds" -> Arr(xs.map(x => Json.num(slope * x + intercept))))
            case "embed" =>
              // deterministic embedding model: the md5 hash-projection
              // (component j = first-32-bits-of-md5(s+":"+j) scaled to
              // [-1,1)) — numerically IDENTICAL to the in-JVM stub
              // graft.kb.Kb.embed, so a knowledge base whose chunks
              // embed through this worker stays oracle-reproducible; a
              // real provider replaces this block with its model call
              val md = java.security.MessageDigest.getInstance("MD5")
              val dim = req.get("dim").collect { case Num(n, _) => n.toInt }.getOrElse(8)
              def emb1(s: String): Seq[Value] = (0 until dim).map { j =>
                md.reset()
                val hex = md.digest(s"$s:$j".getBytes("UTF-8"))
                  .map("%02x".format(_)).mkString.substring(0, 8)
                Json.num(java.lang.Long.parseLong(hex, 16) / 2147483648.0 - 1.0)
              }
              val texts = req("texts").asArray.map {
                case Str(s) => s; case v => sys.error(s"non-text $v")
              }
              Json.obj("ok" -> Json.Bool(true),
                "embs" -> Arr(texts.map(t => Arr(emb1(t)))))
            case "crash" => sys.exit(42) // test hook: die hard mid-protocol
            case other =>
              Json.obj("ok" -> Json.Bool(false), "error" -> Str(s"unknown op $other"))
          }
        } catch {
          case e: Throwable => Json.obj("ok" -> Json.Bool(false),
            "error" -> Str(Option(e.getMessage).getOrElse(e.toString)))
        }
      out.println(Json.write(resp))
      line = in.readLine()
    }
  }
}

/** Parent-side handle: forks the worker JVM, speaks the protocol, and
  * transparently respawns (re-creating trained state) when the child has
  * died — the session survives any engine crash. */
final class ByomProcessEngine {
  private var proc: Process = _
  private var toChild: PrintWriter = _
  private var fromChild: BufferedReader = _
  private var trainingPayload: Option[String] = None
  @volatile var respawnCount: Int = 0

  private def spawn(): Unit = {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val pb = new ProcessBuilder(javaBin, "-Xmx256m", "-cp",
      System.getProperty("java.class.path"), "graft.ml.ByomWorker")
    pb.redirectErrorStream(false)
    proc = pb.start()
    toChild = new PrintWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"), true)
    fromChild = new BufferedReader(
      new InputStreamReader(proc.getInputStream, "UTF-8"))
  }

  private def ensureAlive(): Unit = {
    if (proc == null || !proc.isAlive) {
      if (proc != null) respawnCount += 1
      spawn()
      // re-create trained state in the fresh worker, like the reference
      // re-dispatching onto a new process from the model registry
      trainingPayload.foreach { p =>
        toChild.println(p)
        fromChild.readLine()
      }
    }
  }

  private def call(reqJson: String): Value = synchronized {
    ensureAlive()
    toChild.println(reqJson)
    val line = fromChild.readLine()
    if (line == null) { // child died mid-call: one respawn + retry
      ensureAlive()
      toChild.println(reqJson)
      val retry = fromChild.readLine()
      require(retry != null, "BYOM worker died twice in a row")
      Json.parse(retry)
    } else Json.parse(line)
  }

  def pid: Long = proc.pid()
  def isAlive: Boolean = proc != null && proc.isAlive

  def create(rows: Seq[(Double, Double)]): Unit = {
    val req = Json.write(Json.obj("op" -> Str("create"),
      "rows" -> Arr(rows.map { case (x, y) =>
        Arr(Seq(Json.num(x), Json.num(y))) })))
    trainingPayload = Some(req)
    val resp = call(req)
    require(resp("ok") == Json.Bool(true),
      s"create failed: ${resp.get("error").getOrElse(Json.Null)}")
  }

  def predict(xs: Seq[Double]): Seq[Double] = {
    val resp = call(Json.write(Json.obj("op" -> Str("predict"),
      "rows" -> Arr(xs.map(x => Arr(Seq(Json.num(x))))))))
    require(resp("ok") == Json.Bool(true),
      s"predict failed: ${resp.get("error").getOrElse(Json.Null)}")
    resp("preds").asArray.map { case Num(n, _) => n; case v => sys.error(s"$v") }
  }

  /** Embed a batch of texts through the worker — the KB embedding
    * provider seam (`embedding_model = {'provider': 'byom'}`). */
  def embedTexts(texts: Seq[String], dim: Int = 8): Seq[Seq[Double]] = {
    val resp = call(Json.write(Json.obj("op" -> Str("embed"),
      "dim" -> Json.num(dim.toLong),
      "texts" -> Arr(texts.map(Str(_))))))
    require(resp("ok") == Json.Bool(true),
      s"embed failed: ${resp.get("error").getOrElse(Json.Null)}")
    resp("embs").asArray.map(_.asArray.map {
      case Num(n, _) => n; case v => sys.error(s"$v")
    })
  }

  /** Ask the worker to hard-exit mid-protocol (test hook). */
  def injectCrash(): Unit = synchronized {
    ensureAlive()
    toChild.println(Json.write(Json.obj("op" -> Str("crash"))))
    proc.waitFor()
  }

  def kill(): Unit = synchronized {
    if (proc != null) { proc.destroyForcibly(); proc.waitFor() }
  }

  def close(): Unit = synchronized {
    if (proc != null) {
      try toChild.close() catch { case _: Throwable => }
      proc.destroyForcibly()
    }
  }
}

/** A model owned by an UPLOADED BYOM engine (`PUT /api/handlers/byom/
  * <name>` → CREATE MODEL … USING engine='<name>';
  * api/http/namespaces/handlers.py:292-330 + ml_exec_base.py learn/
  * predict dispatch): training and every prediction run in forked
  * worker processes, never in the server JVM — user engine code cannot
  * take the session down.
  *
  * Scale shape: inference is a per-partition sidecar (one forked worker
  * per partition, the [[graft.kb.Kb.embedThroughWorker]] pattern) that
  * replays the retained training payload into each fresh worker and
  * then predicts in batches — the apply distributes with the data and
  * nothing funnels through the driver. The TRAINING payload itself is
  * driver-collected by contract (the reference ships the whole training
  * frame to its learn process the same way), so it is capped: a BYOM
  * model is a user-code seam, not a big-data trainer.
  */
final case class ByomModel(
    name: String,
    featureCols: Seq[String],
    scoreCol: String,
    training: Seq[(Double, Double)]) extends FrameModel {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

  def outputSchema: StructType = StructType(Seq(StructField(scoreCol, DoubleType)))

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val feat = featureCols.head
    val withF = df.withColumn("__byom_x",
      org.apache.spark.sql.functions.col(feat).cast(DoubleType))
    val idx = withF.schema.fieldIndex("__byom_x")
    val train = training // bounded payload, serialized into the closure
    val rdd = withF.rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val eng = new ByomProcessEngine
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => eng.close()))
        eng.create(train)
        it.grouped(512).flatMap { batch =>
          val preds = eng.predict(batch.map(r =>
            if (r.isNullAt(idx)) Double.NaN else r.getDouble(idx)))
          batch.lazyZip(preds).map((r, p) =>
            Row.fromSeq(r.toSeq.dropRight(1) :+ p))
        }
      }
    }
    spark.createDataFrame(rdd, df.schema.add(scoreCol, DoubleType))
  }
}

object ByomModel {
  /** Training-payload cap — fail loudly rather than silently hauling an
    * unbounded frame through the driver (the honest version of the
    * reference's implicit "learn process gets the whole df"). */
  val MaxTrainingRows = 500000
}
