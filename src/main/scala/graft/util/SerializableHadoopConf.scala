package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Java-serializable wrapper for a Hadoop `Configuration` (which is not
  * itself `Serializable`), so a DataSource V2 reader factory can ship the
  * driver's filesystem configuration to executor-side readers — the same
  * trick Spark's own file sources use. Kept local to avoid depending on
  * `org.apache.spark.util.SerializableConfiguration`'s `private[spark]`
  * Scala visibility.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
