package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   stable key used by the driver's Verify/Bench harness
  * @param fn     (session, sfDir) => result; sfDir holds the parquet tables
  * @param oracle equivalent ANSI SQL runnable by DuckDB on the same tables;
  *               None for operators not expressible in portable SQL (the
  *               driver then records a weaker rows-only check)
  * @param bench  include in the timed benchmark sweep
  * @param stage  optional idempotent setup (scenario inputs the operator
  *               consumes but is not itself — st3's partitioned lake,
  *               st4's bucketed tables, lk1's fragmented input). Bench
  *               runs it OUTSIDE the timed window so the recorded time is
  *               the operator, not its fixture write; `fn` must also call
  *               it (idempotently) so Verify and ad-hoc use need no
  *               separate step.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true,
    stage: Option[(SparkSession, String) => Unit] = None)

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan; Catalyst pushes projections/filters into the scan.
    *
    * `events.ts` is physically TIMESTAMP(NANOS), which Spark only reads as a
    * nano-epoch LongType (via spark.sql.legacy.parquet.nanosAsLong=true, set
    * by every graft session). We truncate to microseconds — integer DIV, same
    * semantics DuckDB applies when it narrows nanos to its micro timestamps —
    * so both engines see identical timestamp values.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else df
  }
}
