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
}
