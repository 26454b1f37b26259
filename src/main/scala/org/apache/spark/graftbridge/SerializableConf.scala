package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge for Spark's `private[spark]` [[SerializableConfiguration]]:
  * the Hadoop `Configuration` is not java-serializable, so shipping it
  * into listing tasks needs the same wrapper Spark's own
  * `InMemoryFileIndex` parallel-discovery path uses. Package-shim form,
  * like [[ListenerDrain]].
  */
object SerializableConf {
  def apply(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)
}
