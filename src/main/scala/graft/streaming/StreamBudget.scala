package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming token-budget corpus assembly — the continuous-ingest
  * counterpart of `ops.Rank.tokenBudgetSample`: each stratum (e.g.
  * language) admits documents until its token budget is spent, with
  * the running total carried ACROSS micro-batches in keyed state
  * (`flatMapGroupsWithState`). Once a stratum's budget is exhausted,
  * its subsequent documents are dropped for the query's lifetime —
  * the state is one counter per stratum, bounded by stratum
  * cardinality, never by stream length.
  *
  * Unlike the batch operator (a pure function of ids), admission here
  * follows ARRIVAL order — inherent to streaming, and the property a
  * continuous ingest actually wants: take what arrives until full.
  * Greedy-inclusive like the batch path: a document is admitted iff
  * the tokens before it are under budget, so a stratum always admits
  * at least its first document.
  */
object StreamBudget {

  case class BudgetDoc(stratum: String, doc_id: Long, n_tokens: Long)
  case class BudgetState(spent: Long)
  case class AdmittedDoc(
      stratum: String, doc_id: Long, n_tokens: Long, spent_before: Long)

  def admitUntilBudget(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nTokCol: String,
      budget: Long): Dataset[AdmittedDoc] = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.select(
      col(stratumCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      col(nTokCol).cast("long").as("n_tokens")).as[BudgetDoc]
    packed.groupByKey(_.stratum)
      .flatMapGroupsWithState[BudgetState, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (stratum, rows, state) =>
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          // within a micro-batch, admit in doc_id order (deterministic
          // for replayed batches; across batches order = arrival)
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            if (spent < budget) {
              val before = spent
              spent += math.max(d.n_tokens, 0L)
              Some(AdmittedDoc(stratum, d.doc_id, d.n_tokens, before))
            } else None
          }
          state.update(BudgetState(spent))
          out.iterator
      }
  }
}
