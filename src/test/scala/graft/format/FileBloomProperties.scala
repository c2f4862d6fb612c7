package graft.format

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.util.sketch.BloomFilter

/** Property coverage for the bloom-sidecar codec: serialization is a
  * faithful round trip (no false NEGATIVES survive it — the property
  * file pruning's correctness rests on), and the multi-column framing
  * never crosses filters between columns.
  */
object FileBloomProperties extends Properties("FileBloom") {

  private val colName = Gen.identifier.map(_.take(24)).suchThat(_.nonEmpty)

  property("roundtrip preserves every inserted long (no false negatives)") =
    forAll(Gen.listOf(Gen.long), colName) { (vs, c) =>
      val bf = BloomFilter.create(math.max(vs.size, 1).toLong, 0.03)
      vs.foreach(bf.putLong)
      val back = FileBloom.deserialize(FileBloom.serialize(Map(c -> bf)))(c)
      vs.forall(back.mightContainLong)
    }

  property("roundtrip preserves every inserted string") =
    forAll(Gen.listOf(Gen.asciiPrintableStr), colName) { (vs, c) =>
      val bf = BloomFilter.create(math.max(vs.size, 1).toLong, 0.03)
      vs.foreach(bf.putString)
      val back = FileBloom.deserialize(FileBloom.serialize(Map(c -> bf)))(c)
      vs.forall(back.mightContainString)
    }

  property("multi-column framing keeps filters separate") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { vs =>
      val a = BloomFilter.create(vs.size.toLong, 0.001)
      vs.foreach(a.putLong)
      val b = BloomFilter.create(16L, 0.001) // empty sibling column
      val back = FileBloom.deserialize(FileBloom.serialize(Map("a" -> a, "b" -> b)))
      vs.forall(back("a").mightContainLong) &&
        vs.forall(v => !back("b").mightContainLong(v))
    }

  property("deserialize rejects junk with a clear error, never garbage") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.map(_.toByte).toArray
      try { FileBloom.deserialize(arr); arr.length >= 8 } // only a valid header passes
      catch { case _: Exception => true }
    }
}
