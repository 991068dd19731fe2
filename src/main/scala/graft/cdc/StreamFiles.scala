package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Helper for producing change-log files a streaming file source can tail:
  * writes a DataFrame as a single flat parquet FILE (`<dir>/<name>.parquet`)
  * rather than Spark's usual per-write directory, since the file source
  * lists only direct children of the watched directory.
  */
object StreamFiles {
  def writeFlat(df: DataFrame, dir: String, name: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(dir, s".tmp-$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val fs = tmp.getFileSystem(conf)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val dst = new Path(dir, s"$name.parquet")
    if (!fs.rename(part, dst)) throw new IllegalStateException(s"rename $part -> $dst failed")
    fs.delete(tmp, true)
    ()
  }
}
