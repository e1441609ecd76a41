package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — image/audio/video payloads: decode, features, near-dup, mosaics. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogMedia {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // image metadata gate: every 25th row claims a wrong width — the gate
    // must flag exactly those (decoded dims vs cataloged columns)
    "q_image_meta_gate" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mislabeled = images.withColumn("w",
        when(col("p_partkey") % 25 === 0, col("w") + 1).otherwise(col("w")))
      ImagePayload.metaGate(mislabeled)
        .select(col("p_partkey"), col("meta_ok"))
    }),

    // --- image payload (synthesize + verify the north-rule invariants) ---
    "q_image_payload" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.verifyPayload(images, "p_partkey")
        .where(col("psnr_ok") && col("caption_ok"))
        .select("p_partkey")
    }),

    // variance-of-Laplacian blur gate: every 8th image is replaced by its
    // bilinear low-pass copy and the gate must flag exactly those — a
    // planted-id oracle, exact because the sharp (independent-pixel noise)
    // and blurred (piecewise-linear) populations straddle the threshold
    // with >= 4x margin on both sides (ImageSharpnessSpec)
    // grayscale/low-color gate (the LAION-style colorfulness filter):
    // every 12th image arrives DECOLORIZED on the real pixel path
    // (decode -> luminance collapse -> re-encode); the Hasler–Süsstrunk
    // score separates them from the colored population by a spec-pinned
    // margin (gray == exactly 0), so the planted ids are the exact answer
    "q_image_gray" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mixed = images.where(col("p_partkey") % 12 =!= 0)
        .unionByName(ImagePayload.withGrayscale(images.where(col("p_partkey") % 12 === 0)))
      ImagePayload.withColorfulness(mixed)
        .select(col("p_partkey"),
          (col("colorfulness") > lit(ColorfulnessThreshold)).as("colorful"))
    }),

    "q_image_sharpness" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mixed = images.where(col("p_partkey") % 8 =!= 0)
        .unionByName(ImagePayload.withBlur(images.where(col("p_partkey") % 8 === 0)))
      ImagePayload.withSharpness(mixed)
        .select(col("p_partkey"), (col("sharpness") > lit(SharpnessThreshold)).as("sharp"))
    }),

    // real PNG decode + feature extraction must succeed for every row
    "q_image_features" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.featureGate(images)
        .where(col("features_ok"))
        .select("p_partkey")
    }),

    // perceptual-hash image near-dup: plant single-pixel-patched copies of
    // every 40th image, find them by dhash banding. The planted set is
    // deterministic (p_partkey % 40 == 0 <-> key + 10^8) and unrelated
    // rasters sit at ~32 hamming bits, so the planted pairs ARE the exact
    // answer — oracled as such; ImageNearDupSpec asserts the full sf0.01
    // population has no natural <= 3-bit dhash collision, which is what
    // makes the planted-pair SQL exact rather than merely expected
    "q_image_neardup" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val planted = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      ImagePayload.imageNearDup(images.unionByName(planted), "p_partkey")
        .select("id_a", "id_b")
    }),

    // ROTATION-invariant near-dup: plant 90-deg-rotated re-uploads of
    // every 40th image; the orientation-canonical (D4-minimum) dhash puts
    // each rotated copy at hamming 0 from its source — rotation
    // invariance is EXACT, a pixel permutation, not approximate — while
    // unrelated canonical hashes stay ~32 bits apart (RotNearDupSpec pins
    // no natural <= 3-bit collision over the full population), so the
    // planted pairs ARE the exact answer
    "q_image_rot_neardup" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val planted = ImagePayload.withRotation(images.where(col("p_partkey") % 40 === 0), 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      ImagePayload.rotImageNearDup(images.unionByName(planted), "p_partkey")
        .select("id_a", "id_b")
    }),

    // SSIM pixel-verify stage over a candidate-pair table: every 40th key
    // pairs with its corner-patched copy (true near-dup, SSIM ~1), every
    // (40k+20)th with its NEIGHBOR key's unrelated raster (decoy, SSIM ~0).
    // The 0.8 gate keeps exactly the planted copies; ImageSsimSpec pins
    // the two-sided margin that makes the planted rule the exact answer
    "q_image_ssim" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val src = images.select(col("p_partkey").as("id_a"), col("bytes").as("__ba"))
      val trueB = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
        .select(col("p_partkey").as("id_a"),
          (col("p_partkey") + 100000000L).as("id_b"), col("bytes").as("__bb"))
      val decoyB = images.select((col("p_partkey") - 1).as("id_a"),
          (col("p_partkey") + 200000000L).as("id_b"), col("bytes").as("__bb"))
        .where(pmod(col("id_a"), lit(40)) === 20)
      ImagePayload.ssimGate(
          src.join(trueB.unionByName(decoyB), "id_a"), "__ba", "__bb", tau = 0.8)
        .select("id_a", "id_b")
    }),

    // GEO-constrained image near-dup: patched near-copies planted AT their
    // source's location must pair; byte-identical copies relocated to the
    // ANTIPODE (dhash hamming 0 but 180 deg away — level-6 cells are
    // ~1.3 deg, so never same-or-adjacent) must NOT. The oracle is exactly
    // the colocated planted set: ImageNearDupSpec pins the preconditions
    // (no natural <= 3-bit collision in the population; patches stay
    // within 3 bits of their source), and the spatial constraint can only
    // REMOVE pairs from the globally-exact q_image_neardup answer
    "q_geo_image_neardup" -> ((s, dir) =>
      ImagePayload.geoImageNearDup(
        geoImagePopulation(part(s, dir).select("p_partkey")),
        "p_partkey", "lat", "lon", level = 6)
        .select("id_a", "id_b")),

    // per-REGION duplicate rate — the geo x dedup composition a corpus
    // health dashboard runs: PIP-label the certified geo-image population,
    // flag members of the geo-constrained dup-pair set, count per region.
    // Exact because both inputs are certified exact (q_pip_rect's join,
    // q_geo_image_neardup's planted pairs)
    "q_region_dup_rate" -> ((s, dir) => {
      val pop = geoImagePopulation(part(s, dir).select("p_partkey"))
      val pairs = ImagePayload.geoImageNearDup(pop, "p_partkey", "lat", "lon", level = 6)
      val dupIds = pairs
        .select(explode(array(col("id_a"), col("id_b"))).as("p_partkey")).distinct()
        .withColumn("is_dup", lit(1L))
      SpatialJoin.pipJoin(pop.select("p_partkey", "lat", "lon"), "lat", "lon",
          SparkEntryRegions.rects)
        .join(dupIds, Seq("p_partkey"), "left")
        .groupBy("region_id")
        .agg(count(lit(1)).as("n_images"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_members"))
    }),

    // cross-modal caption consistency: among caption-sharing images, split
    // true re-posts (near-identical pixels) from caption collisions with
    // divergent pixels. Planted structure: every 30th image gets a
    // byte-identical re-post (same caption, id + 2*10^8); every 45th gets
    // a FRESH unrelated raster wearing its caption (id + 3*10^8) — exact
    // oracle because captions embed the unique image id (no natural
    // caption groups) and unrelated 16x16 renders sit ~32 dhash bits
    // apart (CaptionConsistencySpec asserts the planted rasters clear the
    // <= 3-bit line with margin)
    "q_caption_consistency" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val key = col("p_partkey")
      val reposts = images.where(key % 30 === 0)
        .withColumn("p_partkey", key + 200000000L)
      val base = images.where(key % 45 === 0)
      val mislabeled = ImagePayload.synthesize(
          base.select((key + 300000000L).as("p_partkey")), "p_partkey")
        .drop("caption")
        .join(base.select((key + 300000000L).as("p_partkey"), col("caption")), "p_partkey")
      ImagePayload.captionConsistency(
        images.unionByName(reposts).unionByName(mislabeled), "p_partkey")
        .select("id_a", "id_b", "same_image")
    }),

    // real WAV decode (javax.sound, zero external codecs): container parse,
    // PCM decode, exact-sample equality and feature sanity must hold for
    // every row — any failure drops rows vs the all-parts oracle
    "q_audio_features" -> ((s, dir) => {
      val audio = AudioPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      AudioPayload.featureGate(audio, "p_partkey")
        .where(col("features_ok"))
        .select("p_partkey")
    }),

    // temporal audio near-dup: planted re-uploads (every 25th clip copied
    // under id+10^9 at gain 0.9 with analysis window 1 silenced — every
    // byte differs) recovered by same-position spectral-fingerprint
    // equality. The fingerprint is exactly gain-invariant, so a planted
    // pair shares all 7 un-muted window positions; AudioPayloadSpec pins
    // the no-natural-collision precondition (zero base-population pairs
    // even at minShared=1), making the planted set THE exact answer
    "q_audio_neardup" -> ((s, dir) => {
      val audio = AudioPayload.synthesizeTonalReposts(
        part(s, dir).select("p_partkey"), "p_partkey")
      AudioPayload.audioNearDup(audio, "p_partkey", minShared = 6)
    }),

    // real VIDEO parse + decode over the GRFV1 container (length-prefixed
    // real PNG frames, see VideoPayload): header fields, full-decode
    // validity, and the exact static/dynamic classification (motion == 0
    // iff all frame buffers equal frame 0's). Every 20th video is planted
    // static, every 33rd has a truncated last frame (frames_ok false,
    // is_static unknowable -> null); all three rules are integer-exact, so
    // the oracle recomputes them from p_partkey alone — VideoPayloadSpec
    // pins the no-natural-static precondition that makes it exact
    "q_video_meta" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.metaGate(videos)
        .select("p_partkey", "n_frames", "fps", "frames_ok", "is_static")
    }),

    // frame SAMPLING gate: reads + decodes ONLY frames 0, 2, 4, ... —
    // skipped frames are never copied out of the buffer (the 100-TB
    // sampling contract). The planted corruption sits in the LAST frame,
    // sampled iff (n_frames - 1) is even, so sampled_ok flips exactly on
    // the corrupt videos whose stride lands on the damage — the oracle
    // replays that parity rule in integer SQL
    "q_video_frames" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.sampledGate(videos, every = 2)
        .select("p_partkey", "n_sampled", "sampled_ok")
    }),

    // temporal video near-dup: planted re-posts (every 25th decodable video
    // copied under id+10^9 with frame 1 corner-patched) recovered by
    // same-position frame-dhash equality. Frame 1 is never sampled at
    // stride 2, so a planted pair shares ALL its sampled positions —
    // shared == n_sampled(src) — and VideoPayloadSpec asserts the base
    // population has no natural same-position dhash collision reaching
    // minShared, which makes the planted set THE exact answer
    "q_video_neardup" -> ((s, dir) => {
      val videos = VideoPayload.synthesizeReposts(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.videoNearDup(videos, "p_partkey", every = 2, minShared = 2)
    }),

    // video -> image-operator bridge: sampled frames exploded to rows and
    // run through the REAL image feature gate (one PNG decode per sampled
    // frame). Readable sampled frames pass; frames the truncation damaged
    // never appear — the survivors are an integer stride/parity rule
    "q_video_frame_features" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val frames = VideoPayload.explodeSampledFrames(videos, every = 2)
        .withColumnRenamed("frame", "bytes")
      ImagePayload.featureGate(frames)
        .where(col("features_ok"))
        .select("p_partkey", "frame_idx")
    }),

    // geo x video: the metadata gate's outputs aggregated per spatial
    // region through the covering PIP join — videos carry the same
    // key-derived lat/lon as images, so the rect-branch oracle composes
    // with the integer gate rules
    "q_video_region_stats" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val gated = VideoPayload.metaGate(videos)
      SpatialJoin.pipJoin(gated, "lat", "lon", rectRegionsForParts)
        .groupBy("region_id")
        .agg(count(lit(1)).as("n_videos"),
          sum(when(col("is_static"), 1L).otherwise(0L)).as("n_static"),
          sum(when(col("frames_ok"), 0L).otherwise(1L)).as("n_bad"))
    }),

    "q_image_tile_join" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val tiled = Tiling.tileAssign(images, "lat", "lon", 8)
      SpatialJoin.pipJoin(tiled, "lat", "lon", rectRegionsForParts)
        .select("region_id", "image_id")
    }),

    // per-tile image mosaic (the atlas preview): every image REALLY
    // decoded scan-side, mercator zoom-5 rollup. The oracle checks tile
    // membership and that n_decoded == n_images (a decode failure shows
    // up as a count mismatch); the mosaic's average colors are pinned bit
    // for bit against the raster formula by ImageMosaicSpec
    "q_image_mosaic" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.tileMosaic(images, "lat", "lon", 5)
        .select("zx", "zy", "n_images", "n_decoded")
    }),

    // mosaic PYRAMID: one decode pass at z=5, ancestor levels 2..5 by
    // integer tile-index shifts on the bounded per-tile table. The oracle
    // gates membership + counts per (z, zx, zy) — a decode regression
    // breaks n_decoded at every level; the average colors are pinned bit
    // for bit (incl. the rollup identity) by ImageMosaicSpec
    "q_mosaic_pyramid" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.tileMosaicPyramid(images, "lat", "lon", 2, 5)
        .select("z", "zx", "zy", "n_images", "n_decoded")
    }),

    // per-REGION histogram quantiles: the spatial label join feeds the
    // mergeable sketch — p50/p95 order value in cents per query region,
    // fixed-size state, exact integer contract (the sketch + PIP
    // composition a per-region SLO dashboard runs at 100 TB)
    "q_region_quantile" -> ((s, dir) => {
      val hq = udaf(new graft.functions.Sketches.HistQuantile(
        0L, 1000000L, 60, Seq(0.5, 0.95)))
      val pts = points(s, dir).select(col("o_orderkey"), col("o_totalprice"),
        col("lat"), col("lon"))
      SpatialJoin.pipJoin(pts, "lat", "lon", rectRegions)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy("region_id")
        .agg(hq(col("cents")).as("qa"))
        .select(col("region_id"),
          element_at(col("qa"), 1).as("p50_c"),
          element_at(col("qa"), 2).as("p95_c"))
    }),

    // image duplicate CLUSTERS: two differently-patched copies per planted
    // original; dhash banding pairs each copy with its original and CC
    // closes the transitive cluster {k, k+1e8, k+2e8} with min label k.
    // Oracle is the planted structure — exact because ImageNearDupSpec
    // asserts the 3-population has no cross-cluster <= 3-bit pair
    "q_image_dup_clusters" -> ((s, dir) => {
      val originals = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val sel = originals.where(col("p_partkey") % 40 === 0)
      val copy1 = ImagePayload.withPatch(sel, 2, 2, 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      val copy2 = ImagePayload.withPatch(sel, 3, 3, 1)
        .withColumn("p_partkey", col("p_partkey") + 200000000L)
      val pairs = ImagePayload.imageNearDup(
        originals.unionByName(copy1).unionByName(copy2), "p_partkey")
        .select("id_a", "id_b")
      Dedup.duplicateClusters(pairs)
        .select(col("doc_id").as("image_key"), col("cluster_id"))
    })
  )

  val oracles: Map[String, String] = Map(


    // the planted wrong-width set IS the exact answer
    "q_image_meta_gate" ->
      "SELECT p_partkey, (p_partkey % 25 <> 0) AS meta_ok FROM part",

    "q_image_payload" -> "SELECT p_partkey FROM part",

    "q_image_features" -> "SELECT p_partkey FROM part",

    // the planted blur set IS the exact answer: ImageSharpnessSpec pins the
    // >= 4x threshold clearance of both populations
    "q_image_sharpness" -> "SELECT p_partkey, (p_partkey % 8 <> 0) AS sharp FROM part",

    "q_image_gray" -> "SELECT p_partkey, (p_partkey % 12 <> 0) AS colorful FROM part",

    "q_audio_features" -> "SELECT p_partkey FROM part",

    // the planted re-upload set IS the exact answer: 8 analysis windows,
    // window 1 muted in the copy -> 7 shared positions; gain invariance is
    // exact (energy-ratio bits) and the no-natural-collision precondition
    // is spec-asserted over the full sf0.01 key population
    "q_audio_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 1000000000 AS id_b,
        | CAST(7 AS BIGINT) AS shared
        |FROM part WHERE p_partkey % 25 = 0""".stripMargin,

    // all three gate columns are integer rules of p_partkey (header fields
    // from the synthesis rule; frames_ok = not corrupted; is_static known
    // only when decodable) — VideoPayloadSpec pins the no-natural-static
    // precondition that makes the planted classification THE exact answer
    "q_video_meta" ->
      """SELECT p_partkey,
        | CAST(3 + p_partkey % 4 AS INTEGER) AS n_frames,
        | CAST(2 + p_partkey % 3 AS INTEGER) AS fps,
        | (p_partkey % 33 <> 0) AS frames_ok,
        | CASE WHEN p_partkey % 33 = 0 THEN NULL ELSE (p_partkey % 20 = 0) END AS is_static
        |FROM part""".stripMargin,

    // n_sampled = floor((n_frames-1)/2)+1; the truncated LAST frame (index
    // n_frames-1 = 2 + key%4) is sampled iff that index is even, i.e. iff
    // key%4 is even — the stride-lands-on-the-damage parity rule
    "q_video_frames" ->
      """SELECT p_partkey,
        | CAST((2 + p_partkey % 4) // 2 + 1 AS INTEGER) AS n_sampled,
        | (p_partkey % 33 <> 0 OR (p_partkey % 4) % 2 <> 0) AS sampled_ok
        |FROM part""".stripMargin,

    // the planted re-post set IS the exact answer (VideoPayloadSpec pins
    // the no-natural-collision precondition); shared = n_sampled of the
    // source because the patched frame (idx 1) is never sampled at stride 2
    "q_video_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 1000000000 AS id_b,
        | CAST((2 + p_partkey % 4) // 2 + 1 AS BIGINT) AS shared
        |FROM part WHERE p_partkey % 25 = 0 AND p_partkey % 33 <> 0""".stripMargin,

    // survivors = even frame indices below n_frames, minus the damaged
    // last frame (idx n-1 = 2 + key%4) of corrupt videos when the stride
    // lands on it
    "q_video_frame_features" ->
      """SELECT p_partkey, CAST(f.idx AS INTEGER) AS frame_idx
        |FROM part, UNNEST(range(0, CAST(3 + p_partkey % 4 AS BIGINT), 2)) AS f(idx)
        |WHERE NOT (p_partkey % 33 = 0 AND f.idx = 2 + p_partkey % 4)""".stripMargin,

    // rect-branch region label + the q_video_meta integer gate rules
    "q_video_region_stats" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, p_partkey FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT p_partkey,
         |  $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |labeled AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, count(*) AS n_videos,
         |  CAST(sum(CASE WHEN p_partkey % 33 = 0 THEN 0
         |           WHEN p_partkey % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_static,
         |  CAST(sum(CASE WHEN p_partkey % 33 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
         |FROM labeled GROUP BY 1""".stripMargin
    },

    // the gate keeps exactly the true planted pairs (two-sided SSIM margin
    // spec-pinned over the full population)
    "q_image_ssim" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: the engine must recover precisely the planted patched copies
    // (no natural pair exists within hamming 3 — spec-asserted over the
    // whole population, see q_image_neardup comment)
    "q_image_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: rotated re-uploads sit at canonical hamming 0, nothing else
    // within 3 bits (precondition spec-asserted over the population)
    "q_image_rot_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: only the colocated planted pairs survive the spatial
    // constraint — the antipodal byte-copies (hamming 0, never adjacent)
    // are precisely what this query must exclude vs q_image_neardup
    "q_geo_image_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // the certified population's three branches with their literal lat/lon
    // derivations, the planted dup-member set (%40 originals + copies),
    // and the same rect predicates as q_image_tile_join
    "q_region_dup_rate" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, id FROM pop
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pop AS (
         |  SELECT p_partkey AS id, $PartLatSql AS lat, $PartLonSql AS lon FROM part
         |  UNION ALL
         |  SELECT p_partkey + 100000000, $PartLatSql, $PartLonSql FROM part WHERE p_partkey % 40 = 0
         |  UNION ALL
         |  SELECT p_partkey + 400000000, -($PartLatSql),
         |    CASE WHEN $PartLonSql >= 0 THEN $PartLonSql - 180.0 ELSE $PartLonSql + 180.0 END
         |  FROM part WHERE p_partkey % 60 = 0),
         |dups AS (
         |  SELECT p_partkey AS id FROM part WHERE p_partkey % 40 = 0
         |  UNION ALL
         |  SELECT p_partkey + 100000000 FROM part WHERE p_partkey % 40 = 0),
         |lab AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, count(*) AS n_images,
         |  CAST(sum(CASE WHEN id IN (SELECT id FROM dups) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_members
         |FROM lab GROUP BY 1""".stripMargin
    },

    // planted caption groups: {orig, re-post} pairs are same_image, any
    // pair involving the fresh-raster mislabel is not; keys % 90 carry
    // all three members, hence the third branch
    "q_caption_consistency" ->
      """SELECT p_partkey AS id_a, p_partkey + 200000000 AS id_b, TRUE AS same_image
        |FROM part WHERE p_partkey % 30 = 0
        |UNION ALL
        |SELECT p_partkey, p_partkey + 300000000, FALSE FROM part WHERE p_partkey % 45 = 0
        |UNION ALL
        |SELECT p_partkey + 200000000, p_partkey + 300000000, FALSE FROM part WHERE p_partkey % 90 = 0""".stripMargin,

    "q_image_tile_join" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, image_id FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT printf('img%012d', p_partkey) AS image_id,
         |  $PartLatSql AS lat, $PartLonSql AS lon FROM part)
         |${branches.mkString("\nUNION ALL\n")}
         |""".stripMargin
    },

    // the zoom-5 mercator arithmetic over the part-key grid; n_decoded is
    // asserted equal to n_images by construction — any decode regression
    // breaks the count equality, which is exactly what this row gates
    "q_image_mosaic" ->
      s"""WITH pts AS (SELECT $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(31, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32.0) AS BIGINT))) AS zx,
         |  least(31, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 32.0) AS BIGINT))) AS zy
         | FROM c)
         |SELECT zx, zy, count(*) AS n_images, count(*) AS n_decoded
         |FROM g GROUP BY 1, 2""".stripMargin,

    // the z=5 mercator arithmetic once, then each coarser level is integer
    // division of the tile indices (zx >= 0, so // == the engine's
    // shiftright); counts gate the decode at every level
    "q_mosaic_pyramid" -> {
      val levels = (2 to 5).map { z =>
        val d = 1 << (5 - z)
        s"""SELECT $z AS z, zx // $d AS zx, zy // $d AS zy,
           | count(*) AS n_images, count(*) AS n_decoded FROM g GROUP BY 2, 3""".stripMargin
      }
      s"""WITH pts AS (SELECT $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(31, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32.0) AS BIGINT))) AS zx,
         |  least(31, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 32.0) AS BIGINT))) AS zy
         | FROM c)
         |${levels.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // the PIP label branches feed the exact histogram-quantile replay
    // (same bucket clamp, same max(1, ceil(q*n)) threshold — identical
    // IEEE operands both sides, zero tolerance)
    "q_region_quantile" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, o_totalprice FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, o_totalprice, $LatSql AS lat, $LonSql AS lon FROM orders),
         |lab AS (${branches.mkString("\nUNION ALL\n")}),
         |x AS (SELECT region_id,
         |  LEAST(59, GREATEST(0, CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) / 1000000.0) AS BIGINT))) AS b
         | FROM lab),
         |c AS (SELECT region_id, b, count(*) AS cnt FROM x GROUP BY 1, 2),
         |w AS (SELECT region_id, b,
         |        SUM(cnt) OVER (PARTITION BY region_id ORDER BY b) AS cum,
         |        SUM(cnt) OVER (PARTITION BY region_id) AS n FROM c)
         |SELECT region_id,
         |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN b * 1000000 END) AS BIGINT) AS p50_c,
         |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN b * 1000000 END) AS BIGINT) AS p95_c
         |FROM w GROUP BY 1""".stripMargin
    },

    // planted cluster structure (see q_image_dup_clusters comment): each
    // selected original k forms the component {k, k+1e8, k+2e8}, min
    // label k; singleton (unpaired) images never enter the pair list
    "q_image_dup_clusters" ->
      """SELECT p_partkey AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey + 100000000 AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey + 200000000 AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin
  )
}
