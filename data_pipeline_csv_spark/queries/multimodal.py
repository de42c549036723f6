"""Multimodal pipeline queries (binary columns over mapInPandas).

The SGV1 synthetic codec's header fields are pure arithmetic on
asset_id (codecs.asset_dims), so the decode round-trip — encode bytes
in one mapInPandas stage, decode them in another — is verifiable by a
DuckDB oracle computing the same arithmetic directly: if any byte of
the binary plumbing (Arrow transfer, header pack/unpack, payload
sizing) were wrong, the hashes would diverge.

The payload bytes themselves are a splitmix64 stream — pure 64-bit
integer arithmetic — which DuckDB replays exactly in HUGEINT limb math
(mod-2^64 multiplies via 32-bit limbs, xor via 32-bit halves, shifts as
integer division). That upgrades the feature-extraction query from
rows-only to a FULL value oracle: DuckDB regenerates every pixel byte
in SQL and recomputes sum/mean/min/max/histogram. Frame sampling's
per-frame payload stats remain pinned by tests (the only non-replayed
surface); its count/shape query is oracle-checked below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_assets, frame_sample, image_features, synthetic_assets
from .registry import query

# ---- splitmix64 in DuckDB SQL (see multimodal/codecs.py) ------------
# All values live in HUGEINT (128-bit) and are reduced mod 2^64; a
# 64x64 multiply-low goes through 32-bit limbs so no intermediate
# exceeds 2^65; xor splits into 32-bit halves (BIGINT xor). Verified
# byte-identical to codecs._splitmix64_bytes for arbitrary seeds.
_M64 = "CAST('18446744073709551616' AS HUGEINT)"
_PHI = "CAST('11400714819323198485' AS HUGEINT)"  # 0x9E3779B97F4A7C15
_C1 = "CAST('13787848793156543929' AS HUGEINT)"  # 0xBF58476D1CE4E5B9
_C2 = "CAST('10723151780598845931' AS HUGEINT)"  # 0x94D049BB133111EB


def _lo32(e: str) -> str:
    return f"(({e}) % 4294967296)"


def _hi32(e: str) -> str:
    return f"(({e}) // 4294967296)"


def _xor64(a: str, b: str) -> str:
    return (
        f"(CAST(xor(CAST({_hi32(a)} AS BIGINT), CAST({_hi32(b)} AS BIGINT)) AS HUGEINT)"
        f" * 4294967296"
        f" + CAST(xor(CAST({_lo32(a)} AS BIGINT), CAST({_lo32(b)} AS BIGINT)) AS HUGEINT))"
    )


def _mul64(a: str, b: str) -> str:
    return (
        f"(({_lo32(a)} * {_lo32(b)}"
        f" + (({_lo32(a)} * {_hi32(b)} + {_hi32(a)} * {_lo32(b)}) % 4294967296)"
        f" * 4294967296) % {_M64})"
    )


def _shr64(a: str, n: str) -> str:
    return f"(({a}) // CAST(power(2, {n}) AS HUGEINT))"


# CTE chain regenerating the image payload bytes: word i of asset id is
# splitmix64(id + i*PHI); bytes unpack little-endian. Image assets have
# frames=1, so n_px = width*height <= 16*14 — the byte fan-out is
# bounded at ~224 rows per asset.
_PIXEL_CTE = f"""
    dims AS (
      SELECT doc_id,
             CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_px
      FROM documents
    ),
    words AS (
      SELECT doc_id, n_px, r.i,
             (doc_id + r.i * {_PHI}) % {_M64} AS x
      FROM dims JOIN range(1, 29) r(i) ON r.i <= (n_px + 7) // 8
    ),
    s1 AS (SELECT doc_id, n_px, i,
           {_mul64(_xor64('x', _shr64('x', '30')), _C1)} AS z FROM words),
    s2 AS (SELECT doc_id, n_px, i,
           {_mul64(_xor64('z', _shr64('z', '27')), _C2)} AS z FROM s1),
    s3 AS (SELECT doc_id, n_px, i,
           {_xor64('z', _shr64('z', '31'))} AS z FROM s2),
    px AS (
      SELECT doc_id, n_px,
             CAST({_shr64('z', '8 * b')} % 256 AS INT) AS v
      FROM s3, range(0, 8) rb(b)
      WHERE (i - 1) * 8 + b < n_px
    )
"""


@query(
    "multimodal_decode_roundtrip",
    oracle="""
    SELECT
      doc_id AS asset_id,
      'video' AS modality,
      CAST(8 + doc_id % 9 AS INT)  AS width,
      CAST(8 + doc_id % 7 AS INT)  AS height,
      CAST(4 + doc_id % 5 AS INT)  AS frames,
      CAST((8 + doc_id % 9) * (8 + doc_id % 7) * (4 + doc_id % 5) AS BIGINT)
        AS n_payload_bytes
    FROM documents
    """,
    doc="Encode->decode SGV1 video blobs; decoded header fields must equal "
    "the id-arithmetic the oracle computes without touching bytes.",
    tags=("multimodal", "binary", "mapInPandas"),
)
def multimodal_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthetic_assets(spark, sf_dir, modality="video")
    return decode_assets(assets).filter(F.col("decode_error").isNull()).drop("decode_error")


@query(
    "multimodal_image_features",
    # Full value oracle: DuckDB regenerates every payload byte via the
    # splitmix64 CTE and recomputes the features. pixel_sum is exact
    # integer arithmetic; mean is one correctly-rounded division of an
    # exact integer sum (pixel values are integers, so numpy's pairwise
    # summation is exact too); min/max/histogram are integers. std_val
    # stays out of the checked projection: its sum of (x-mean)^2 terms
    # is accumulation-order-dependent across engines.
    oracle=f"""
    WITH {_PIXEL_CTE},
    agg AS (
      SELECT doc_id,
             ANY_VALUE(n_px) AS n_px,
             CAST(SUM(v) AS BIGINT) AS pixel_sum,
             CAST(MIN(v) AS DOUBLE) AS min_val,
             CAST(MAX(v) AS DOUBLE) AS max_val
      FROM px GROUP BY doc_id
    ),
    bins AS (
      SELECT a.doc_id, hb.b,
             COALESCE(p.cnt, 0) AS c
      FROM agg a
      CROSS JOIN range(0, 16) hb(b)
      LEFT JOIN (
        SELECT doc_id, v // 16 AS b, COUNT(*) AS cnt FROM px GROUP BY 1, 2
      ) p ON p.doc_id = a.doc_id AND p.b = hb.b
    ),
    hist AS (
      SELECT doc_id,
             '[' || string_agg(CAST(c AS VARCHAR), ',' ORDER BY b) || ']' AS histogram
      FROM bins GROUP BY doc_id
    )
    SELECT a.doc_id AS asset_id,
           a.n_px,
           a.pixel_sum,
           CAST(a.pixel_sum AS DOUBLE) / a.n_px AS mean_val,
           a.min_val,
           a.max_val,
           h.histogram
    FROM agg a JOIN hist h ON a.doc_id = h.doc_id
    """,
    doc="Gray-level stats + 16-bin histogram per synthetic image, "
    "Arrow-batched mapInPandas over the binary column — verified "
    "byte-for-byte: the oracle regenerates the splitmix64 payload in "
    "HUGEINT SQL and recomputes sum/mean/min/max/histogram.",
    tags=("multimodal", "features"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = image_features(synthetic_assets(spark, sf_dir, modality="image"))
    n_px = ((F.lit(8) + F.col("asset_id") % 9) * (F.lit(8) + F.col("asset_id") % 7)).cast(
        "bigint"
    )
    return feats.select(
        "asset_id",
        n_px.alias("n_px"),
        # exact integer recovery: |mean*n - sum| << 0.5 for n<=224
        F.round(F.col("mean_val") * n_px).cast("bigint").alias("pixel_sum"),
        "mean_val",
        "min_val",
        "max_val",
        "histogram",
    )


@query(
    "multimodal_frame_stats",
    oracle="""
    SELECT
      doc_id AS asset_id,
      CAST(CEIL((4 + doc_id % 5) / 2.0) AS BIGINT) AS n_sampled,
      CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS frame_bytes
    FROM documents
    """,
    doc="Video -> every-2nd-frame explosion; per-asset sampled-frame count "
    "and frame byte size are id-arithmetic the oracle checks.",
    tags=("multimodal", "video", "fanout"),
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(synthetic_assets(spark, sf_dir, modality="video"), every_k=2)
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.first(F.length("frame").cast("long")).alias("frame_bytes"),
    )


# ---- perceptual-hash near-dup oracle ---------------------------------
# The dHash samples only 72 grid pixels per asset, so instead of
# regenerating whole payloads (the _PIXEL_CTE above) the oracle
# computes, per sampled grid point, the ONE splitmix64 word that
# carries its byte: linear position po in the ORIGINAL raster -> word
# (po // 8 + 1), byte (po % 8). Variants never materialize: a 2x
# nearest-neighbor upscale samples back to floor-half coordinates of
# the original raster (floor(floor(2x)/2) = floor(x)), and the sparse
# inversion applies where the VARIANT-raster linear position pv hits
# the perturbation stride. Pure integer arithmetic end to end.
_PHASH_MAXHAM = 3
_PHASH_CTE = f"""
    assets AS (
      SELECT doc_id AS aid, doc_id AS seed,
             CAST(8 + doc_id % 9 AS HUGEINT) AS w,
             CAST(8 + doc_id % 7 AS HUGEINT) AS h,
             CAST(1 AS HUGEINT) AS up
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000, doc_id,
             CAST(8 + doc_id % 9 AS HUGEINT),
             CAST(8 + doc_id % 7 AS HUGEINT),
             CAST(2 AS HUGEINT)
      FROM documents WHERE doc_id % 10 = 0
    ),
    grid AS (
      SELECT aid, seed, w, h, up, gr.r AS r, gc.c AS c,
             ((gr.r * (up * h)) // 8) AS yv,
             ((gc.c * (up * w)) // 9) AS xv
      FROM assets, range(0, 8) gr(r), range(0, 9) gc(c)
    ),
    coords AS (
      SELECT aid, r, c,
             ((yv // up) * w + (xv // up)) AS po,
             (yv * (up * w) + xv) AS pv,
             up, seed
      FROM grid
    ),
    pwords AS (
      SELECT aid, r, c, pv, up, (po % 8) AS b,
             (seed + (po // 8 + 1) * {_PHI}) % {_M64} AS x
      FROM coords
    ),
    p1 AS (SELECT aid, r, c, pv, up, b,
           {_mul64(_xor64('x', _shr64('x', '30')), _C1)} AS z FROM pwords),
    p2 AS (SELECT aid, r, c, pv, up, b,
           {_mul64(_xor64('z', _shr64('z', '27')), _C2)} AS z FROM p1),
    p3 AS (SELECT aid, r, c, pv, up, b,
           {_xor64('z', _shr64('z', '31'))} AS z FROM p2),
    vals AS (
      SELECT aid, r, c,
             CASE WHEN up = 2 AND pv % 37 = 0
                  THEN 255 - ({_shr64('z', '8 * b')} % 256)
                  ELSE ({_shr64('z', '8 * b')} % 256) END AS v
      FROM p3
    ),
    packed AS (
      SELECT l.aid,
             SUM(CASE WHEN l.v > rt.v
                      THEN CAST(power(2, l.r * 8 + l.c) AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END) AS hv
      FROM vals l
      JOIN vals rt ON l.aid = rt.aid AND l.r = rt.r AND rt.c = l.c + 1
      WHERE l.c < 8
      GROUP BY l.aid
    ),
    hashes AS (
      SELECT aid,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - {_M64} ELSE hv END AS BIGINT) AS hsh
      FROM packed
    )
"""


@query(
    "multimodal_phash_neardup",
    # FULL value oracle: DuckDB recomputes every sampled pixel byte in
    # HUGEINT splitmix64 math, packs the 64-bit dHashes, and brute-
    # forces ALL pairs with bit_count(xor) — so both the perceptual
    # hashing and the banding (which must lose NO pair at hamming <= 3,
    # the pigeonhole guarantee) are verified value-for-value.
    oracle=f"""
    WITH {_PHASH_CTE}
    SELECT a.aid AS d1, b.aid AS d2,
           CAST(bit_count(xor(a.hsh, b.hsh)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.aid < b.aid
    WHERE bit_count(xor(a.hsh, b.hsh)) <= {_PHASH_MAXHAM}
    """,
    doc="Perceptual-hash image near-dup — the multimodal member of the "
    "dedup family: every asset's 64-bit dHash (9x8 NN-downsample, "
    "horizontal gradient signs — multimodal/ops.py dhash_images) is "
    "banded 4x16 bits so any pair within hamming 3 agrees exactly on "
    ">= 1 band (pigeonhole: equi-joins on tiny band values, never "
    "all-pairs — operators/dedup.py hamming_neardup_pairs), then "
    "bit_count(xor) verifies the exact distance. The asset table "
    "seeds true near-dups: every 10th image also appears 2x-upscaled "
    "with sparse pixel inversions (multimodal/assets.py "
    "synthetic_assets_with_variants) — resolution changes hash "
    "identically by construction, the damage moves a few bits. The "
    "oracle replays every sampled byte in HUGEINT splitmix64 SQL and "
    "brute-forces all pairs, so banding losslessness is value-checked.",
    tags=("multimodal", "dedup", "phash", "binary", "scale"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import dhash_images, synthetic_assets_with_variants
    from ..operators.dedup import hamming_neardup_pairs

    assets = synthetic_assets_with_variants(spark, sf_dir)
    fp = dhash_images(assets)
    return hamming_neardup_pairs(
        fp, max_hamming=_PHASH_MAXHAM, bits=64, id_col="asset_id", hash_col="dhash"
    )


@query(
    "multimodal_phash_incremental",
    # Same FULL splitmix64 replay oracle as multimodal_phash_neardup,
    # restricted to pairs TOUCHING the new batch (variants carry ids
    # >= 10M, so "d2 is a variant" selects exactly cross + within-new):
    # the incremental probe must reproduce the one-shot answer for the
    # arriving batch without re-pairing the existing corpus.
    oracle=f"""
    WITH {_PHASH_CTE}
    SELECT a.aid AS d1, b.aid AS d2,
           CAST(bit_count(xor(a.hsh, b.hsh)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.aid < b.aid
    WHERE bit_count(xor(a.hsh, b.hsh)) <= {_PHASH_MAXHAM}
      AND b.aid >= 10000000
    """,
    doc="INCREMENTAL perceptual dedup — the continuous-ingestion shape "
    "of multimodal_phash_neardup: the existing corpus's dHash band "
    "entries act as the index, the arriving batch (the 2x-upscaled "
    "perturbed re-uploads) is hashed, BROADCAST, and probed with one "
    "band equi-join — the corpus side never shuffles and is never "
    "re-paired against itself — plus within-batch pairs over the "
    "O(batch) side only (operators/dedup.py hamming_probe_pairs). "
    "Incremental-equals-one-shot is pinned in "
    "tests/test_multimodal.py::test_phash_incremental_equals_oneshot "
    "and value-checked here by the brute-force oracle restricted to "
    "batch-touching pairs.",
    tags=("multimodal", "dedup", "phash", "incremental", "scale"),
)
def multimodal_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import dhash_images, synthetic_assets_with_variants
    from ..operators.dedup import hamming_probe_pairs

    fp = dhash_images(synthetic_assets_with_variants(spark, sf_dir))
    old = fp.filter(F.col("asset_id") < 10_000_000)
    new = fp.filter(F.col("asset_id") >= 10_000_000)
    return hamming_probe_pairs(old, new, max_hamming=_PHASH_MAXHAM, bits=64)


# ---- audio fingerprint near-dup oracle -------------------------------
# Audio samples are int16 little-endian byte PAIRS of the splitmix64
# stream: sample j's two bytes live in word j//4 (+1, 1-based) at bit
# offset 8*((2j)%8) — one shift+mod yields the unsigned 16-bit value.
# Window of sample j is (j*65)//n (pure integer arithmetic); energies
# are exact integer sums of |sample|; bit k = E_k > E_{k+1}.
_AFP_MAXHAM = 7
_AFP_CTE = f"""
    aassets AS (
      SELECT doc_id AS aid, doc_id AS seed,
             CAST(256 + doc_id % 512 AS HUGEINT) AS n,
             0 AS drop_mod
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000, doc_id,
             CAST(256 + doc_id % 512 AS HUGEINT), 41
      FROM documents WHERE doc_id % 10 = 0
    ),
    awords AS (
      SELECT aid, n, drop_mod, r.i AS wi,
             (seed + r.i * {_PHI}) % {_M64} AS x
      FROM aassets JOIN range(1, 193) r(i) ON r.i <= (n + 3) // 4
    ),
    a1 AS (SELECT aid, n, drop_mod, wi,
           {_mul64(_xor64('x', _shr64('x', '30')), _C1)} AS z FROM awords),
    a2 AS (SELECT aid, n, drop_mod, wi,
           {_mul64(_xor64('z', _shr64('z', '27')), _C2)} AS z FROM a1),
    a3 AS (SELECT aid, n, drop_mod, wi,
           {_xor64('z', _shr64('z', '31'))} AS z FROM a2),
    asamples AS (
      SELECT a3.aid, a3.n, j.j,
             CASE WHEN a3.drop_mod > 0 AND j.j % a3.drop_mod = 0 THEN 0
                  ELSE abs(CASE WHEN ({_shr64('z', '8 * ((2 * j.j) % 8)')} % 65536) >= 32768
                                THEN CAST(({_shr64('z', '8 * ((2 * j.j) % 8)')} % 65536) AS BIGINT) - 65536
                                ELSE CAST(({_shr64('z', '8 * ((2 * j.j) % 8)')} % 65536) AS BIGINT) END)
             END AS a
      FROM a3 JOIN range(0, 768) j(j)
        ON j.j < a3.n AND (j.j // 4 + 1) = a3.wi
    ),
    aenergy AS (
      SELECT aid, CAST((j * 65) // n AS INT) AS k, SUM(a) AS e
      FROM asamples GROUP BY 1, 2
    ),
    apacked AS (
      SELECT l.aid,
             SUM(CASE WHEN l.e > rt.e
                      THEN CAST(power(2, l.k) AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END) AS hv
      FROM aenergy l JOIN aenergy rt ON l.aid = rt.aid AND rt.k = l.k + 1
      WHERE l.k < 64
      GROUP BY l.aid
    ),
    ahashes AS (
      SELECT aid,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - {_M64} ELSE hv END AS BIGINT) AS hsh
      FROM apacked
    )
"""


@query(
    "multimodal_audio_fingerprint",
    # FULL value oracle: DuckDB regenerates every 16-bit PCM sample
    # from the splitmix64 stream, rebuilds the 65-window energy
    # contour, packs the 64-bit fingerprints and brute-forces ALL
    # pairs — hashing AND banding losslessness value-checked, exactly
    # the phash contract.
    oracle=f"""
    WITH {_AFP_CTE}
    SELECT a.aid AS d1, b.aid AS d2,
           CAST(bit_count(xor(a.hsh, b.hsh)) AS INT) AS hamming
    FROM ahashes a JOIN ahashes b ON a.aid < b.aid
    WHERE bit_count(xor(a.hsh, b.hsh)) <= {_AFP_MAXHAM}
    """,
    doc="Acoustic-fingerprint near-dup — the dedup family's AUDIO "
    "member, completing the modality matrix (text x5, embeddings x2, "
    "image x2, audio): 64-bit energy-contour hash per PCM clip (65 "
    "contiguous index windows, exact integer |sample| sums, bit = "
    "energy-gradient sign — multimodal/ops.py audio_fingerprint), "
    "8x8-bit pigeonhole banding for hamming<=7 candidates (the "
    "dropout damage moves ~2-7 bits; equi-joins only, never "
    "all-pairs), exact bit_count verify. The asset table seeds true "
    "near-dups: every 10th clip reappears with every 41st sample "
    "zeroed (multimodal/assets.py synthetic_audio_with_variants).",
    tags=("multimodal", "audio", "dedup", "fingerprint", "scale"),
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import audio_fingerprint, synthetic_audio_with_variants
    from ..operators.dedup import hamming_neardup_pairs

    assets = synthetic_audio_with_variants(spark, sf_dir)
    fp = audio_fingerprint(assets)
    return hamming_neardup_pairs(
        fp, max_hamming=_AFP_MAXHAM, bits=64, id_col="asset_id", hash_col="afp"
    )


# ---- multi-frame video near-dup oracle --------------------------------
# The per-frame dHash grid samples 72 pixels of frame f; a variant is
# trimmed (first frame dropped) and 2x-upscaled with sparse inversion
# per VARIANT-FRAME raster. Source position of a sampled variant pixel:
# frame (f + trim) of the ORIGINAL raster at floor-half coordinates, so
# po = (f + trim)*w*h + (yv//up)*w + (xv//up) indexes the original
# payload and one splitmix64 word (po//8 + 1) carries its byte. The
# inversion applies where the variant-frame raster position
# pv = yv*(up*w) + xv hits the perturbation stride. Integer arithmetic
# end to end — the oracle replays every sampled byte of every frame.
_VIDEO_MAXHAM = 3
_VIDEO_CTE = f"""
    vassets AS (
      SELECT doc_id AS aid, doc_id AS seed,
             CAST(8 + doc_id % 9 AS HUGEINT) AS w,
             CAST(8 + doc_id % 7 AS HUGEINT) AS h,
             CAST(4 + doc_id % 5 AS HUGEINT) AS nf,
             CAST(1 AS HUGEINT) AS up,
             CAST(0 AS HUGEINT) AS trim
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000, doc_id,
             CAST(8 + doc_id % 9 AS HUGEINT),
             CAST(8 + doc_id % 7 AS HUGEINT),
             CAST(4 + doc_id % 5 AS HUGEINT) - 1,
             CAST(2 AS HUGEINT),
             CAST(1 AS HUGEINT)
      FROM documents WHERE doc_id % 10 = 0
    ),
    vframes AS (
      SELECT aid, seed, w, h, up, trim, fr.f AS f
      FROM vassets JOIN range(0, 8) fr(f) ON fr.f < nf
    ),
    vgrid AS (
      SELECT aid, seed, w, h, up, trim, f, gr.r AS r, gc.c AS c,
             ((gr.r * (up * h)) // 8) AS yv,
             ((gc.c * (up * w)) // 9) AS xv
      FROM vframes, range(0, 8) gr(r), range(0, 9) gc(c)
    ),
    vcoords AS (
      SELECT aid, f, r, c,
             ((f + trim) * (w * h) + (yv // up) * w + (xv // up)) AS po,
             (yv * (up * w) + xv) AS pv,
             up, seed
      FROM vgrid
    ),
    vwords AS (
      SELECT aid, f, r, c, pv, up, (po % 8) AS b,
             (seed + (po // 8 + 1) * {_PHI}) % {_M64} AS x
      FROM vcoords
    ),
    v1 AS (SELECT aid, f, r, c, pv, up, b,
           {_mul64(_xor64('x', _shr64('x', '30')), _C1)} AS z FROM vwords),
    v2 AS (SELECT aid, f, r, c, pv, up, b,
           {_mul64(_xor64('z', _shr64('z', '27')), _C2)} AS z FROM v1),
    v3 AS (SELECT aid, f, r, c, pv, up, b,
           {_xor64('z', _shr64('z', '31'))} AS z FROM v2),
    vvals AS (
      SELECT aid, f, r, c,
             CASE WHEN up = 2 AND pv % 37 = 0
                  THEN 255 - ({_shr64('z', '8 * b')} % 256)
                  ELSE ({_shr64('z', '8 * b')} % 256) END AS v
      FROM v3
    ),
    vpacked AS (
      SELECT l.aid, l.f,
             SUM(CASE WHEN l.v > rt.v
                      THEN CAST(power(2, l.r * 8 + l.c) AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END) AS hv
      FROM vvals l
      JOIN vvals rt ON l.aid = rt.aid AND l.f = rt.f
                   AND l.r = rt.r AND rt.c = l.c + 1
      WHERE l.c < 8
      GROUP BY l.aid, l.f
    ),
    vhashes AS (
      SELECT aid, f,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - {_M64} ELSE hv END AS BIGINT) AS hsh
      FROM vpacked
    ),
    vmatch AS (
      SELECT a.aid AS d1, b.aid AS d2, a.f AS f1, b.f AS f2
      FROM vhashes a JOIN vhashes b ON a.aid < b.aid
      WHERE bit_count(xor(a.hsh, b.hsh)) <= {_VIDEO_MAXHAM}
    ),
    vnf AS (SELECT aid, CAST(COUNT(*) AS BIGINT) AS nf FROM vhashes GROUP BY aid),
    vvotes AS (
      SELECT d1, d2,
             CAST(COUNT(DISTINCT f1) AS BIGINT) AS m1,
             CAST(COUNT(DISTINCT f2) AS BIGINT) AS m2
      FROM vmatch GROUP BY d1, d2
    )
"""


@query(
    "multimodal_video_neardup",
    # FULL value oracle: DuckDB replays every sampled pixel byte of
    # EVERY frame in HUGEINT splitmix64 SQL, packs the per-frame
    # dHashes, brute-forces ALL frame pairs across videos, and
    # recomputes the integer containment vote — so per-frame hashing,
    # banding losslessness AND the vote arithmetic are value-checked.
    oracle=f"""
    WITH {_VIDEO_CTE}
    SELECT v.d1, v.d2, n1.nf AS n1, n2.nf AS n2, v.m1, v.m2
    FROM vvotes v
    JOIN vnf n1 ON v.d1 = n1.aid
    JOIN vnf n2 ON v.d2 = n2.aid
    WHERE 2 * v.m1 >= n1.nf OR 2 * v.m2 >= n2.nf
    """,
    doc="MULTI-FRAME video near-dup — closes the single-frame hole "
    "(dhash_images hashes only frame 0, so a re-encode with a trimmed "
    "intro defeats it): every frame of every video gets its own 64-bit "
    "dHash (multimodal/ops.py dhash_frames — NN-upscale-invariant per "
    "frame), frame MATCHES come from the same pigeonhole band "
    "equi-joins as every other fingerprint (never all-frame-pairs), "
    "and a FRAME-SET CONTAINMENT VOTE pairs two videos iff at least "
    "half of EITHER side's frames have a hamming<=3 match on the "
    "other (integer cross-multiplied — no float division; the "
    "containment direction catches short-inside-long). The asset "
    "table seeds true trimmed re-encodes: every 10th video reappears "
    "minus its first frame, 2x-upscaled with sparse per-frame pixel "
    "inversions (multimodal/assets.py synthetic_videos_with_variants) "
    "— zero of those survive first-frame hashing, all pair here "
    "(operators/dedup.py frameset_containment_pairs).",
    tags=("multimodal", "video", "dedup", "phash", "scale"),
)
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import dhash_frames, synthetic_videos_with_variants
    from ..operators.dedup import frameset_containment_pairs

    assets = synthetic_videos_with_variants(spark, sf_dir)
    frames = dhash_frames(assets)
    return frameset_containment_pairs(frames, max_hamming=_VIDEO_MAXHAM, bits=64)


@query(
    "multimodal_video_incremental",
    # Same FULL multi-frame splitmix64 replay oracle as
    # multimodal_video_neardup, restricted to pairs TOUCHING the new
    # batch (variants carry ids >= 10M and d1 < d2, so "d2 >= 10M"
    # selects exactly cross + within-batch): the incremental probe
    # must reproduce the one-shot vote for the arriving batch without
    # re-pairing the existing corpus.
    oracle=f"""
    WITH {_VIDEO_CTE}
    SELECT v.d1, v.d2, n1.nf AS n1, n2.nf AS n2, v.m1, v.m2
    FROM vvotes v
    JOIN vnf n1 ON v.d1 = n1.aid
    JOIN vnf n2 ON v.d2 = n2.aid
    WHERE (2 * v.m1 >= n1.nf OR 2 * v.m2 >= n2.nf)
      AND v.d2 >= 10000000
    """,
    doc="INCREMENTAL video near-dup — the continuous-ingestion shape "
    "of multimodal_video_neardup: the corpus's per-frame dHash band "
    "entries act as the index, the arriving batch (the trimmed "
    "re-encodes) is hashed, BROADCAST, and probed with one band "
    "equi-join — the corpus side never shuffles and is never "
    "re-paired against itself — then the containment vote runs over "
    "matched pairs only (per-video frame counts are index metadata "
    "in production; one count agg here), plus within-batch voting "
    "over the O(batch) side (operators/dedup.py "
    "frameset_containment_probe). Incremental-equals-one-shot pinned "
    "in tests/test_multimodal.py::test_video_incremental_equals_"
    "oneshot and value-checked here by the brute-force oracle "
    "restricted to batch-touching pairs.",
    tags=("multimodal", "video", "dedup", "incremental", "scale"),
)
def multimodal_video_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import dhash_frames, synthetic_videos_with_variants
    from ..operators.dedup import frameset_containment_probe

    frames = dhash_frames(synthetic_videos_with_variants(spark, sf_dir))
    old = frames.filter(F.col("asset_id") < 10_000_000)
    new = frames.filter(F.col("asset_id") >= 10_000_000)
    return frameset_containment_probe(old, new, max_hamming=_VIDEO_MAXHAM, bits=64)


@query(
    "multimodal_audio_incremental",
    # Same FULL PCM replay oracle as multimodal_audio_fingerprint,
    # restricted to pairs TOUCHING the new batch (variants carry ids
    # >= 10M and d1 < d2, so "d2 >= 10M" selects exactly cross +
    # within-batch).
    oracle=f"""
    WITH {_AFP_CTE}
    SELECT a.aid AS d1, b.aid AS d2,
           CAST(bit_count(xor(a.hsh, b.hsh)) AS INT) AS hamming
    FROM ahashes a JOIN ahashes b ON a.aid < b.aid
    WHERE bit_count(xor(a.hsh, b.hsh)) <= {_AFP_MAXHAM}
      AND b.aid >= 10000000
    """,
    doc="INCREMENTAL audio dedup — the continuous-ingestion shape of "
    "multimodal_audio_fingerprint, completing the incremental matrix "
    "(text batches, image phash, video frame-sets, now audio): the "
    "corpus's fingerprint band entries act as the index, the arriving "
    "batch (the sample-dropout re-uploads) is fingerprinted, "
    "BROADCAST, and probed with one band equi-join — the corpus side "
    "never shuffles or re-pairs — plus within-batch pairs over the "
    "O(batch) side (operators/dedup.py hamming_probe_pairs, the same "
    "generic prober as the image path). Value-checked by the "
    "brute-force PCM replay oracle restricted to batch-touching pairs.",
    tags=("multimodal", "audio", "dedup", "incremental", "scale"),
)
def multimodal_audio_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import audio_fingerprint, synthetic_audio_with_variants
    from ..operators.dedup import hamming_probe_pairs

    fp = audio_fingerprint(synthetic_audio_with_variants(spark, sf_dir))
    old = fp.filter(F.col("asset_id") < 10_000_000)
    new = fp.filter(F.col("asset_id") >= 10_000_000)
    return hamming_probe_pairs(
        old, new, max_hamming=_AFP_MAXHAM, bits=64, hash_col="afp"
    )
