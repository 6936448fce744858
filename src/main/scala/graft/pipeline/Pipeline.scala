package graft.pipeline

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orchestration semantics the reference implements in Airflow (SURVEY.md
  * §2.10 D1-D4), kept as plain Scala around Spark actions:
  *
  *  - D1 per-source fault isolation: a failing source is skipped and the run
  *    proceeds (`raw_to_landing_sparkjob.py:114-128,171-178` logs and
  *    `continue`s on a bad ticker).
  *  - D3 staged dependencies: upload -> transform -> load as sequenced stages
  *    (`transform_open_close_data.py:102`).
  *  - D4 retry policy: per-stage bounded retries
  *    (`transform_open_close_data.py:34` retries=1;
  *    `ingest_data_API.py:172` retries=10).
  */
object Pipeline {

  final case class Stage(name: String, retries: Int = 1)(val run: SparkSession => Unit)

  final case class StageResult(name: String, attempts: Int, error: Option[String])

  /** D4 - run a thunk with up to `retries` re-attempts. */
  def withRetries[T](retries: Int)(thunk: => T): Try[T] = {
    var last: Try[T] = Try(thunk)
    var attempt = 1
    while (last.isFailure && attempt <= retries) {
      last = Try(thunk)
      attempt += 1
    }
    last
  }

  /** D3 - run stages in order; stop at the first stage that exhausts its
    * retries (downstream stages depend on upstream output, exactly the
    * Airflow `a >> b` semantics).
    */
  def runStages(spark: SparkSession, stages: Seq[Stage]): Seq[StageResult] = {
    val results = Seq.newBuilder[StageResult]
    var failed = false
    stages.foreach { st =>
      if (!failed) {
        var attempts = 0
        val outcome = withRetries(st.retries) { attempts += 1; st.run(spark) }
        outcome match {
          case Success(_) => results += StageResult(st.name, attempts, None)
          case Failure(e) =>
            failed = true
            results += StageResult(st.name, attempts, Some(e.getMessage))
        }
      }
    }
    results.result()
  }

  /** D1 - evaluate independent sources, skipping failures: the per-ticker
    * isolation of the reference. Returns the successful frames and the
    * failed source names. Used where inputs are genuinely independent (one
    * raw file per ticker) so one corrupt input cannot sink the run.
    */
  def isolateFailures(sources: Seq[(String, () => DataFrame)]): (Seq[(String, DataFrame)], Seq[String]) = {
    val evaluated = sources.map { case (name, mk) => name -> Try(mk()) }
    (evaluated.collect { case (name, Success(df)) => name -> df },
     evaluated.collect { case (name, Failure(_)) => name })
  }
}
