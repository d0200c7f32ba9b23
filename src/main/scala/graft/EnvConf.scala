package graft

import org.apache.spark.sql.SparkSession

/** Controlled-experiment knob (round-17): `SPARK_GRAFT_CONF="k=v;k=v"`
  * applies confs to the session BUILDER, so config A/Bs — including core/
  * static confs like `spark.io.compression.codec` that cannot change after
  * SparkContext start — run the SAME binary back-to-back with only the
  * conf changing. Never set by the driver's official runs — absent means
  * untouched defaults. */
private[graft] object EnvConf {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k.trim, v)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_CONF entries must be k=v, got '$kv'")
        }
      })
    b
  }
}
