package graft

import org.apache.spark.sql.functions._

import graft.operators.AudioPayload

/** Real WAV encode/decode through javax.sound: lossless roundtrip, analytic
  * feature values, graceful failure on garbage bytes. */
class AudioPayloadSpec extends SparkTestBase {

  test("WAV roundtrip is bit-exact and features match the analytic sine") {
    for (key <- Seq(0L, 1L, 7L, 12345L)) {
      val wav = AudioPayload.encodeWav(key)
      assert(wav.length > 44, "RIFF header + data expected")
      assert(new String(wav.take(4), "US-ASCII") === "RIFF")
      val decoded = AudioPayload.decodePcm(wav)
      assert(decoded.isDefined)
      assert(java.util.Arrays.equals(decoded.get, AudioPayload.samples(key)),
        s"lossless PCM roundtrip failed for key $key")
      val Array(rms, zcr, peak, dur) = AudioPayload.audioFeatures(wav)
      // 0.8-amplitude sine: rms = 0.8/sqrt(2) ~ 0.566 (dither is +-1/512)
      assert(math.abs(rms - 0.8 / math.sqrt(2)) < 0.02, s"rms $rms")
      // zcr of a sine at f: 2f/sr crossings per sample
      val f = 200.0 + (key % 800)
      assert(math.abs(zcr - 2 * f / AudioPayload.SampleRate) < 0.02, s"zcr $zcr for f=$f")
      assert(peak > 0.7 && peak <= 1.0)
      assert(math.abs(dur - 0.2) < 1e-6)
    }
  }

  test("garbage and truncated bytes decode to None; gate rejects them") {
    assert(AudioPayload.decodePcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioPayload.decodePcm(AudioPayload.encodeWav(5L).take(30)).isEmpty)
    assert(AudioPayload.audioFeatures(Array[Byte](9, 9)).isEmpty)
  }

  test("featureGate passes every synthesized row, fails tampered bytes") {
    import spark.implicits._
    val keys = (0L until 50L).map(Tuple1(_)).toDF("p_partkey")
    val audio = AudioPayload.synthesize(keys, "p_partkey")
    assert(AudioPayload.featureGate(audio, "p_partkey")
      .where(col("features_ok")).count() === 50)
    // tamper: claim key+1's samples under key's id -> exact-equality gate fails
    val tampered = audio.withColumn("p_partkey", col("p_partkey") + 1)
    assert(AudioPayload.featureGate(tampered, "p_partkey")
      .where(col("features_ok")).count() === 0)
    // features land for every row through the DataFrame path too
    val feats = AudioPayload.withFeatures(audio)
      .where(size(col("features")) === 4).count()
    assert(feats === 50)
  }

  test("fingerprints are exactly the planted tone-band masks and gain-invariant") {
    for (key <- Seq(0L, 3L, 777L, 123456L)) {
      val fp = AudioPayload.fingerprints(AudioPayload.tonalSamples(key))
      assert(fp.length === 8)
      fp.zipWithIndex.foreach { case (f, w) =>
        val expected = AudioPayload.toneBins(key, w).map(k => 1L << (k - 2)).reduce(_ | _)
        assert(f === expected, s"key $key window $w")
      }
      // uniform gain + re-quantization leaves every window bit-identical
      for (gain <- Seq(0.9, 0.5, 1.3)) {
        val scaled = AudioPayload.tonalSamples(key).map(s =>
          math.max(Short.MinValue.toDouble,
            math.min(Short.MaxValue.toDouble, math.rint(s * gain))).toShort)
        assert(AudioPayload.fingerprints(scaled).toSeq === fp.toSeq, s"gain $gain key $key")
      }
      // a muted window fingerprints to 0 (no-signal), others untouched
      val muted = AudioPayload.decodePcm(AudioPayload.encodeTonalWav(key, 0.9, 1)).get
      val mutedFp = AudioPayload.fingerprints(muted)
      assert(mutedFp(1) === 0L)
      assert(mutedFp.patch(1, Nil, 1).toSeq === fp.toSeq.patch(1, Nil, 1))
    }
  }

  test("audioNearDup recovers exactly the planted re-uploads with shared == 7") {
    import spark.implicits._
    val audio = AudioPayload.synthesizeTonalReposts((0L to 500L).toDF("k"), "k")
    val got = AudioPayload.audioNearDup(audio, "k", minShared = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (0L to 500L).filter(_ % 25 == 0)
      .map(k => (k, k + 1000000000L, 7L)).toSet
    assert(got === expected)
  }

  test("oracle precondition: no natural fingerprint collision in the full sf0.01 key population") {
    import spark.implicits._
    // deterministic synthesis over the exact driver-gate key range
    // (p_partkey 0..1999): ANY base-population pair at even ONE shared
    // window would threaten the planted oracle's exactness — require none
    val audio = AudioPayload.synthesizeTonal((0L to 1999L).toDF("k"), "k")
    val natural = AudioPayload.audioNearDup(audio, "k", minShared = 1).count()
    assert(natural === 0L, s"natural near-dup pairs in the base population: $natural")
  }
}
