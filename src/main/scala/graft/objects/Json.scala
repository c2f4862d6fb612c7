package graft.objects

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** JSON codec for object defs — Jackson + scala module (both ship on
  * Spark's classpath).
  */
object Json {
  val mapper: ObjectMapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def write(v: Any): Array[Byte] = mapper.writeValueAsBytes(v)
  def writeString(v: Any): String = mapper.writeValueAsString(v)
  def read[T](bytes: Array[Byte], cls: Class[T]): T = mapper.readValue(bytes, cls)
  def readString[T](s: String, cls: Class[T]): T = mapper.readValue(s, cls)
}
