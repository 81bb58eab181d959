package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Round-12 query surface: the audio half of the multimodal column
  * family. Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries20 {

  // ---------------------------------------------------------- q150_audio_decode
  /** REAL audio decode ([[Multimodal.MediaCodecWav]]): mono PCM-16 WAV
    * payloads parsed by the pure-JVM RIFF kernel — decoded sample rate,
    * channel count, bit depth, frame count, integer-exact duration and
    * the mean absolute amplitude — with the deliberately TRUNCATED
    * payload (id 13) degrading to `decode_ok = false` nulls instead of
    * failing the partition. The synthetic WAVs encode an integer sample
    * formula losslessly ([[Multimodal.synthSample]]), so the codec-less
    * oracle predicts every decoded field arithmetically — the q33
    * cross-engine faithfulness check extended from stills to audio.
    * Scale shape: decode is a narrow partition-local map directly over
    * the payload scan (no payload bytes ever shuffle); only the
    * fixed-width feature rows reach the final sort.
    */
  val q150AudioDecode = QueryDef(
    "q150_audio_decode",
    (s, dir) => {
      import s.implicits._
      val audio = Multimodal.syntheticAudio(s, 60)
      Multimodal.decodeAudioFeatures(audio).toDF()
        .select($"media_id", $"decode_ok", $"sample_rate", $"channels",
          $"bits", $"n_samples", $"duration_ms",
          round($"mean_abs_amp", 6).as("mean_abs_amp"))
        .orderBy($"media_id")
    },
    Some(s"""
      WITH m AS (
        SELECT id, id % 50 + 20 AS n, (id % 60 != 13) AS ok
        FROM range(0, 60) t(id))
      SELECT id AS media_id, ok AS decode_ok,
             CAST(CASE WHEN ok THEN 8000 END AS INTEGER) AS sample_rate,
             CAST(CASE WHEN ok THEN 1 END AS INTEGER) AS channels,
             CAST(CASE WHEN ok THEN 16 END AS INTEGER) AS bits,
             CAST(CASE WHEN ok THEN n END AS BIGINT) AS n_samples,
             CAST(CASE WHEN ok THEN n * 1000 // 8000 END AS BIGINT)
               AS duration_ms,
             CASE WHEN ok THEN
               round(CAST(list_sum(list_transform(range(0, n),
                 j -> abs((id * 37 + j * 11) % 4096 - 2048))) AS DOUBLE)
                 / n, 6)
             END AS mean_abs_amp
      FROM m ORDER BY media_id"""))

  def all: Seq[QueryDef] = Seq(q150AudioDecode)
}
