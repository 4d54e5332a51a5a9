package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** private[sql] bridge, the write-side twin of [[ParquetReadBridge]]:
  * [[ParquetFileFormat.prepareWrite]] builds the serializable
  * `OutputWriterFactory` `FileFormatWriter` itself ships to executors
  * (compression codec, ParquetWriteSupport schema binding, output
  * committer conf all baked into the job configuration). A DSv2
  * `DataWriter` opens one writer per task on its OWN final path — no
  * temp-dir rename protocol needed, because the snapshot commit makes
  * files visible by MANIFEST, not by directory listing: a crashed or
  * speculative attempt's file simply never enters the manifest (vacuum
  * reclaims it).
  */
object ParquetWriteBridge {

  /** Driver-side: the factory + the conf it requires at the executor
    * (prepareWrite MUTATES the job conf — schema binding, codec — so
    * that exact conf must travel with the factory).
    */
  def writerFactory(spark: SparkSession, schema: StructType)
      : (OutputWriterFactory, SerializableHadoopConf) = {
    val job = Job.getInstance(ParquetReadBridge.hadoopConf(spark))
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    (factory, new SerializableHadoopConf(job.getConfiguration))
  }

  /** Executor-side: open one parquet writer at `path`. The attempt id
    * is synthetic — nothing reads it back; file-name uniqueness (the
    * caller embeds partition + task ids) is what isolates attempts.
    */
  def open(factory: OutputWriterFactory, conf: Configuration,
      path: String, schema: StructType): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new org.apache.hadoop.mapreduce.JobID("graft", 0),
        TaskType.MAP, 0), 0)
    factory.newInstance(path, schema, new TaskAttemptContextImpl(conf, attempt))
  }
}
