"""Unit tests for similarity search (vectorops) and multimodal plumbing
(media) against numpy / hashlib references."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from spider_go_spark.functions.media import extract_media_features, real_decode
from spider_go_spark.queries.vectorops import _dot, _norm, _plane_weights

EMB_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(42)
    data = [(int(i), [float(x) for x in rng.standard_normal(64).astype(np.float32)]) for i in range(20)]
    return spark.createDataFrame(data, EMB_SCHEMA), data


def test_dot_and_norm_match_numpy(spark, vecs):
    sdf, data = vecs
    rows = sdf.select(
        "vec_id", _dot(F.col("embedding"), F.col("embedding")).alias("d"),
        _norm(F.col("embedding")).alias("n"),
    ).collect()
    by_id = {i: np.asarray(v, dtype=np.float64) for i, v in data}
    for r in rows:
        v = by_id[r["vec_id"]]
        assert r["d"] == pytest.approx(float(v @ v), rel=1e-12)
        assert r["n"] == pytest.approx(float(np.sqrt(v @ v)), rel=1e-12)


def test_brute_force_topk_matches_numpy(spark, vecs):
    sdf, data = vecs
    sdf.createOrReplaceTempView("embeddings_test")
    by_id = {i: np.asarray(v, dtype=np.float64) for i, v in data}
    # Spark-side: same construction as queries.vectorops.ann_cosine_topk but
    # on the fixture (query = vec 0, k = 5)
    e = sdf.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
    got = [
        r["vec_id"]
        for r in j.select("vec_id", cos.alias("c")).orderBy(F.desc("c"), "vec_id").limit(5).collect()
    ]
    qv = by_id[0]
    sims = {
        i: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        for i, v in by_id.items()
        if i != 0
    }
    expect = [i for i, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    assert got == expect


def test_lsh_bucket_matches_numpy(spark, vecs):
    sdf, data = vecs
    by_id = {i: np.asarray(v, dtype=np.float64) for i, v in data}
    bucket = F.lit(0).cast("bigint")
    for h in range(8):
        w = F.array(*[F.lit(float(x)) for x in _plane_weights(h)])
        bucket = bucket + F.when(_dot(F.col("embedding"), w) >= 0, 2**h).otherwise(0)
    got = {r["vec_id"]: r["b"] for r in sdf.select("vec_id", bucket.alias("b")).collect()}
    for i, v in by_id.items():
        expect = sum(
            (1 << h) if float(v @ np.asarray(_plane_weights(h), dtype=np.float64)) >= 0 else 0
            for h in range(8)
        )
        assert got[i] == expect, i


def test_media_features_deterministic_fake(spark):
    d = spark.createDataFrame(
        [(0, "hello world"), (1, "abc"), (2, "xyzzy plugh")], ["doc_id", "text"]
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    rows = {r["doc_id"]: r for r in extract_media_features(d).collect()}
    texts = {0: "hello world", 1: "abc", 2: "xyzzy plugh"}
    kinds = {0: "image", 1: "audio", 2: "video"}
    for i, t in texts.items():
        r = rows[i]
        n = len(t)
        assert r["media_kind"] == kinds[i]
        assert r["n_bytes"] == n
        assert r["digest"] == hashlib.md5(t.encode()).hexdigest()
        if kinds[i] == "audio":
            assert r["width"] is None and r["height"] is None
        else:
            assert r["width"] == (n * 7) % 1024 and r["height"] == (n * 13) % 768
        if kinds[i] == "video":
            assert r["frame_count"] == (n % 120) + 1
        else:
            assert r["frame_count"] is None


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG", "image")


def test_media_features_real_sniffs_and_digests_canonically(spark):
    import numpy as np

    from spider_go_spark.functions.media import (
        encode_bmp,
        encode_png,
        encode_video,
        encode_wav,
        extract_media_features_real,
    )

    j = np.arange(4 * 3 * 3, dtype=np.int64)
    rgb = ((j * 31) % 256).astype(np.uint8)
    samples = ((np.arange(50) * 97) % 4001) - 2000
    rows_in = [
        (0, encode_bmp(4, 3, rgb)),
        (1, encode_png(4, 3, rgb)),  # same pixels, different container
        (2, encode_wav(8000, samples)),
        (3, encode_video([encode_bmp(4, 3, rgb), encode_bmp(4, 3, rgb)])),
    ]
    d = spark.createDataFrame(rows_in, ["doc_id", "payload"])
    rows = {r["doc_id"]: r for r in extract_media_features_real(d).collect()}
    assert [rows[i]["media_kind"] for i in range(4)] == [
        "image", "image", "audio", "video",
    ]
    assert (rows[0]["width"], rows[0]["height"]) == (4, 3)
    # digest is over DECODED canonical content: BMP and PNG of the same
    # pixels collide; the raw payloads differ
    assert rows[0]["digest"] == rows[1]["digest"]
    assert rows_in[0][1] != rows_in[1][1]
    assert rows[0]["n_bytes"] == len(rows_in[0][1]) != len(rows_in[1][1])
    assert rows[2]["width"] is None and rows[2]["frame_count"] is None
    assert rows[3]["frame_count"] == 2 and rows[3]["width"] == 4
    expect = hashlib.md5(rgb.tobytes().hex().encode()).hexdigest()
    assert rows[0]["digest"] == expect


# --------------------------------------------------------------------------
# real P6 PPM codec (round 3): genuine byte-level decode behind real_decode
# --------------------------------------------------------------------------


def test_ppm_roundtrip_exact():
    import numpy as np

    from spider_go_spark.functions.media import decode_ppm, encode_ppm, real_decode

    w, h = 5, 3
    rgb = np.arange(w * h * 3, dtype=np.uint8)
    payload = encode_ppm(w, h, rgb)
    stats = decode_ppm(payload)
    assert (stats["width"], stats["height"], stats["n_pixels"]) == (w, h, 15)
    px = rgb.reshape(h, w, 3).astype(int)
    assert stats["sum_r"] == px[:, :, 0].sum()
    assert stats["sum_g"] == px[:, :, 1].sum()
    assert stats["sum_b"] == px[:, :, 2].sum()
    # real_decode dispatches on the magic
    assert real_decode(payload, "image") == stats


def test_ppm_header_comments_and_errors():
    import numpy as np
    import pytest

    from spider_go_spark.functions.media import decode_ppm, encode_ppm, real_decode

    rgb = np.zeros(2 * 2 * 3, dtype=np.uint8)
    ok = encode_ppm(2, 2, rgb)
    # '#' comment lines inside the header are legal PPM
    commented = b"P6\n# a comment\n2 2\n255\n" + ok.split(b"255\n", 1)[1]
    assert decode_ppm(commented)["n_pixels"] == 4

    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError, match="header promises"):
        decode_ppm(ok[:-3])  # truncated pixels
    with pytest.raises(ValueError, match="header promises"):
        decode_ppm(ok + b"xx")  # trailing junk
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
    # non-PPM payloads still hit the honest unimplemented hook
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG\r\n", "image")


# --------------------------------------------------------------------------
# real 24-bit BMP codec: little-endian headers, BGR triples, bottom-up rows,
# 4-byte row padding — all verified against HAND-BUILT golden bytes so a
# symmetric encode/decode bug cannot cancel out.
# --------------------------------------------------------------------------


def test_bmp_golden_bytes():
    import struct

    from spider_go_spark.functions.media import decode_bmp, encode_bmp, real_decode

    # hand-construct a 2x2 BMP: top-down logical pixels
    #   row0: (10,20,30) (40,50,60)
    #   row1: (70,80,90) (1,2,3)
    # stored bottom-up as BGR with stride 8 (2*3=6 → padded to 8)
    pixel_rows = (
        bytes([90, 80, 70, 3, 2, 1, 0, 0])  # bottom row first (logical row1)
        + bytes([30, 20, 10, 60, 50, 40, 0, 0])  # logical row0
    )
    golden = (
        struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
        + pixel_rows
    )
    stats = decode_bmp(golden)
    assert (stats["width"], stats["height"], stats["n_pixels"]) == (2, 2, 4)
    assert stats["sum_r"] == 10 + 40 + 70 + 1
    assert stats["sum_g"] == 20 + 50 + 80 + 2
    assert stats["sum_b"] == 30 + 60 + 90 + 3
    # the encoder must reproduce the golden bytes exactly
    import numpy as np

    rgb = np.array([10, 20, 30, 40, 50, 60, 70, 80, 90, 1, 2, 3], dtype=np.uint8)
    assert encode_bmp(2, 2, rgb) == golden
    assert real_decode(golden, "image") == stats


def test_bmp_top_down_and_errors():
    import struct

    import numpy as np
    import pytest

    from spider_go_spark.functions.media import decode_bmp, encode_bmp

    rgb = np.arange(3 * 2 * 3, dtype=np.uint8)  # 3 wide, 2 tall
    ok = encode_bmp(3, 2, rgb)
    up = decode_bmp(ok)
    # flip to a top-down bitmap (negative height) with rows in file order
    # reversed — must decode to the SAME stats
    stride = 12
    offset = 54
    rows = [ok[offset + stride * i : offset + stride * (i + 1)] for i in range(2)]
    td = (
        ok[:14]
        + struct.pack("<Iii", 40, 3, -2)
        + ok[26:offset]
        + rows[1]
        + rows[0]
    )
    assert decode_bmp(td) == up

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + ok[2:])
    with pytest.raises(ValueError, match="needs"):
        decode_bmp(ok[:-4])  # truncated pixels
    bad_bpp = ok[:28] + struct.pack("<H", 8) + ok[30:]
    with pytest.raises(ValueError, match="bpp=8"):
        decode_bmp(bad_bpp)


# --------------------------------------------------------------------------
# real PCM WAV codec: RIFF chunk walk (ancillary chunks, odd-size padding),
# little-endian int16 — golden bytes again.
# --------------------------------------------------------------------------


def test_wav_golden_bytes():
    import struct

    from spider_go_spark.functions.media import decode_wav, encode_wav, real_decode

    # samples: 100, -200, 32767, -32768
    data = struct.pack("<4h", 100, -200, 32767, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 8) + data
    golden = b"RIFF" + struct.pack("<I", len(body)) + body
    stats = decode_wav(golden)
    assert stats == {
        "sample_rate": 8000,
        "n_samples": 4,
        "sum_abs": 100 + 200 + 32767 + 32768,
        "peak": 32768,
        "sum_sq": 100 * 100 + 200 * 200 + 32767 * 32767 + 32768 * 32768,
    }
    import numpy as np

    assert encode_wav(8000, np.array([100, -200, 32767, -32768])) == golden
    assert real_decode(golden, "audio") == stats


def test_wav_chunk_walk_and_errors():
    import struct

    import numpy as np
    import pytest

    from spider_go_spark.functions.media import decode_wav, encode_wav

    ok = encode_wav(16000, np.array([1, -1, 5]))
    base = decode_wav(ok)
    # insert an odd-sized ancillary LIST chunk (with its pad byte) between
    # fmt and data — the chunk walk must skip it
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    riffed = ok[:fmt_end] + junk + ok[fmt_end:]
    riffed = b"RIFF" + struct.pack("<I", len(riffed) - 8) + riffed[8:]
    assert decode_wav(riffed) == base

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"RIFX" + ok[4:])
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(ok[:-2])
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    bad = ok[:20] + stereo_fmt + ok[36:]
    with pytest.raises(ValueError, match="channels=2"):
        decode_wav(bad)


def test_ima_adpcm_roundtrip_and_structure():
    import struct

    import numpy as np
    import pytest

    from spider_go_spark.functions.media import (
        IMA_BLOCK_SAMPLES,
        IMA_INDEX_ADJ,
        IMA_STEPS,
        _ima_quantize,
        _ima_step,
        decode_wav_samples,
        encode_wav_ima,
        wav_frame_profile,
    )

    # pure-Python replay: decoding must equal stepping the shared state
    # machine over the encoder's own quantizer decisions
    t = np.arange(1300, dtype=np.int64)
    sig = ((t * 131 + 7) % 4001) - 2000
    payload = encode_wav_ima(8000, sig)
    rate, out = decode_wav_samples(payload)
    assert rate == 8000 and out.size == sig.size
    expect = []
    for start in range(0, sig.size, IMA_BLOCK_SAMPLES):
        blk = sig[start : start + IMA_BLOCK_SAMPLES]
        pred, index = int(blk[0]), 0 if start == 0 else index  # noqa: F821
        expect.append(pred)
        for s in blk[1:]:
            code = _ima_quantize(int(s) - pred, IMA_STEPS[index])
            pred, index = _ima_step(pred, index, code)
            expect.append(pred)
    assert out.tolist() == expect  # multi-block (3 blocks), exact replay
    # lossy but bounded on a slew-limited signal
    smooth = (2000 * np.sin(np.arange(600) / 25)).astype(np.int64)
    _, o2 = decode_wav_samples(encode_wav_ima(8000, smooth))
    assert int(np.abs(o2 - smooth).max()) <= 256
    # ~4:1 compression vs PCM at block scale
    assert len(payload) < (44 + 2 * sig.size) // 3
    # table sanity pinned to the public spec
    assert len(IMA_STEPS) == 89 and IMA_STEPS[0] == 7 and IMA_STEPS[88] == 32767
    assert IMA_INDEX_ADJ == [-1, -1, -1, -1, 2, 4, 6, 8]

    # downstream audio ops run unchanged over compressed input: a silent
    # lead decodes to exact zeros (diff 0 → code 0 → delta step>>3 ... not
    # necessarily 0) — use frame profile for structure, not exact silence
    prof = wav_frame_profile(payload, frame=64)
    assert prof["n_frames"] == (sig.size + 63) // 64

    # malformed streams fail loudly
    with pytest.raises(ValueError, match="fact chunk"):
        i = payload.index(b"fact")
        decode_wav_samples(payload[:i] + b"junk" + payload[i + 4 :])
    # fact chunk promising more samples than the data stream holds
    fi = payload.index(b"fact") + 8
    overclaim = payload[:fi] + struct.pack("<I", sig.size + 5000) + payload[fi + 4 :]
    with pytest.raises(ValueError, match="truncated ADPCM"):
        decode_wav_samples(overclaim)
    # corrupt a block's step index beyond 88
    di = payload.index(b"data") + 8
    bad = bytearray(payload)
    bad[di + 2] = 120
    with pytest.raises(ValueError, match="invalid step index"):
        decode_wav_samples(bytes(bad))
    with pytest.raises(ValueError, match="format tag"):
        fmt_off = payload.index(b"fmt ") + 8
        decode_wav_samples(
            payload[:fmt_off] + struct.pack("<H", 2) + payload[fmt_off + 2 :]
        )


def test_ahash_kernel_properties():
    import numpy as np
    import pytest

    from spider_go_spark.functions.media import (
        ahash_bits,
        decode_bmp_pixels,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    h = ahash_bits(rgb)
    assert len(h) == 64 and set(h) <= {"0", "1"}
    # encode → byte-decode roundtrip preserves pixels exactly, so the hash
    # of the decoded image equals the hash of the source array
    decoded = decode_bmp_pixels(encode_bmp(16, 16, rgb))
    assert np.array_equal(decoded, rgb)
    assert ahash_bits(decoded) == h
    # perceptual: a ±1 brightness jitter keeps the hash close (≤ 8/64 bits)
    jitter = np.clip(rgb.astype(np.int16) + rng.integers(-1, 2, rgb.shape), 0, 255)
    h2 = ahash_bits(jitter.astype(np.uint8))
    assert sum(a != b for a, b in zip(h, h2)) <= 8
    # sensitivity: inverting the image flips most bits
    h3 = ahash_bits(255 - rgb)
    assert sum(a != b for a, b in zip(h, h3)) >= 32
    # block-mean downsample really averages: a 2x-upscaled image hashes equal
    up = np.repeat(np.repeat(rgb, 2, axis=0), 2, axis=1)
    assert ahash_bits(up) == h
    with pytest.raises(ValueError, match="divisible"):
        ahash_bits(rgb[:15])


def test_wav_frame_profile_silence_structure():
    import numpy as np

    from spider_go_spark.functions.media import encode_wav, wav_frame_profile

    # 2 silent frames, 1 loud frame, trailing partial silent frame
    samples = np.concatenate(
        [np.zeros(32, dtype=np.int64), np.full(16, 7, dtype=np.int64), np.zeros(5, dtype=np.int64)]
    )
    p = wav_frame_profile(encode_wav(8000, samples), frame=16)
    assert p == {"n_frames": 4, "n_silent": 3, "lead_silent": 2, "total_abs": 112}
    # all-silent clip: lead spans everything
    q = wav_frame_profile(encode_wav(8000, np.zeros(20, dtype=np.int64)), frame=16)
    assert q == {"n_frames": 2, "n_silent": 2, "lead_silent": 2, "total_abs": 0}
    # empty clip
    z = wav_frame_profile(encode_wav(8000, np.zeros(0, dtype=np.int64)), frame=16)
    assert z == {"n_frames": 0, "n_silent": 0, "lead_silent": 0, "total_abs": 0}


def test_video_container_roundtrip_and_errors():
    import struct

    import numpy as np
    import pytest

    from spider_go_spark.functions.media import (
        decode_video_frames,
        encode_bmp,
        encode_video,
        video_sample_stats,
    )

    frames = []
    for f in range(5):
        j = np.arange(3 * 2 * 3, dtype=np.int64)
        frames.append(encode_bmp(3, 2, ((f * 29 + j * 11) % 256).astype(np.uint8)))
    payload = encode_video(frames)
    assert decode_video_frames(payload) == frames
    # sampling stride: frames 0, 2, 4
    stats = video_sample_stats(payload, every=2)
    assert stats["n_frames"] == 5 and stats["n_sampled"] == 3
    # exact channel sums from the pixel rule for sampled frames
    want = [0, 0, 0]
    for f in (0, 2, 4):
        for p in range(6):
            for c in range(3):
                want[c] += (f * 29 + (p * 3 + c) * 11) % 256
    assert [stats["sum_r"], stats["sum_g"], stats["sum_b"]] == want
    with pytest.raises(ValueError, match="magic"):
        decode_video_frames(b"XXXX" + payload[4:])
    with pytest.raises(ValueError, match="truncated SGV1 frame"):
        decode_video_frames(payload[:-3])
    with pytest.raises(ValueError, match="truncated SGV1 index"):
        decode_video_frames(b"SGV1" + struct.pack("<I", 99) + b"\x00" * 8)


# --------------------------------------------------------------------------
# real PNG codec: CRC32-validated chunk walk, zlib inflate, and the five
# scanline filters. The decoder is checked against a TEST-SIDE scalar
# filterer written directly from the PNG spec's equations (independent of
# the engine's encoder, so a symmetric encode/decode bug cannot cancel);
# the encoder is then pinned by exact roundtrip.
# --------------------------------------------------------------------------


def _png_spec_filter(rows: list[list[int]], filters: list[int], bpp: int = 3) -> bytes:
    """Apply PNG filtering per the spec (encode direction), scalar reference."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    out = b""
    for y, (row, ft) in enumerate(zip(rows, filters)):
        prev = rows[y - 1] if y else [0] * len(row)
        line = [ft]
        for x, v in enumerate(row):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                f = v
            elif ft == 1:
                f = v - a
            elif ft == 2:
                f = v - b
            elif ft == 3:
                f = v - (a + b) // 2
            else:
                f = v - paeth(a, b, c)
            line.append(f % 256)
        out += bytes(line)
    return out


def _png_chunks(width: int, height: int, scanlines: bytes) -> bytes:
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_vs_spec_reference_filterer():
    import numpy as np

    from spider_go_spark.functions.media import decode_png_pixels

    w, h = 4, 10  # 10 rows → every filter type appears twice
    rng = [(i * 167 + 13) % 256 for i in range(w * h * 3)]
    rows = [rng[y * w * 3 : (y + 1) * w * 3] for y in range(h)]
    filters = [y % 5 for y in range(h)]
    payload = _png_chunks(w, h, _png_spec_filter(rows, filters))
    got = decode_png_pixels(payload)
    assert got.shape == (h, w, 3)
    assert got.reshape(-1).tolist() == rng

    # split the IDAT into two chunks — decoders must concatenate the stream
    import struct
    import zlib

    comp = zlib.compress(_png_spec_filter(rows, filters))
    half = len(comp) // 2

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    split = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", comp[:half])
        + chunk(b"IDAT", comp[half:])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png_pixels(split), got)


def test_png_roundtrip_and_stats():
    import numpy as np

    from spider_go_spark.functions.media import (
        decode_png,
        decode_png_pixels,
        encode_png,
        real_decode,
    )

    w, h = 5, 7
    rgb = ((np.arange(w * h * 3, dtype=np.int64) * 29 + 5) % 256).astype(np.uint8)
    payload = encode_png(w, h, rgb)
    assert np.array_equal(
        decode_png_pixels(payload).reshape(-1), rgb
    )
    stats = decode_png(payload)
    px = rgb.reshape(h, w, 3).astype("int64")
    assert stats == {
        "width": w, "height": h, "n_pixels": w * h,
        "sum_r": int(px[:, :, 0].sum()),
        "sum_g": int(px[:, :, 1].sum()),
        "sum_b": int(px[:, :, 2].sum()),
    }
    assert real_decode(payload, "image") == stats


def test_png_errors():
    import struct
    import zlib

    import numpy as np
    import pytest

    from spider_go_spark.functions.media import decode_png_pixels, encode_png

    ok = encode_png(3, 6, (np.arange(54) % 256).astype(np.uint8))

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_pixels(b"XPNG" + ok[4:])
    # corrupt one IDAT byte → CRC must catch it
    idat_pos = ok.index(b"IDAT") + 4
    bad = bytearray(ok)
    bad[idat_pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32"):
        decode_png_pixels(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png_pixels(ok[:-6])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # grayscale (color type 0) is out of scope and must fail loudly
    gray = (
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(6))) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png_pixels(gray)
    # invalid filter type byte
    badf = (
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([7, 0, 0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type 7"):
        decode_png_pixels(badf)
    # scanline payload shorter than height*(1+stride)
    short = (
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(7)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline data"):
        decode_png_pixels(short)


def test_resize_nearest_kernel():
    from spider_go_spark.functions.media import resize_nearest

    src = np.arange(4 * 6 * 3, dtype=np.int64).reshape(4, 6, 3)
    # identity: same dims returns the same pixels
    assert (resize_nearest(src, 6, 4) == src).all()
    # downsample 6x4 -> 3x2: out[y,x] = src[(y*4)//2, (x*6)//3] = src[2y, 2x]
    small = resize_nearest(src, 3, 2)
    assert small.shape == (2, 3, 3)
    for y in range(2):
        for x in range(3):
            assert (small[y, x] == src[2 * y, 2 * x]).all()
    # upsample 1x1 -> 3x2 repeats the single source pixel
    one = np.array([[[7, 8, 9]]], dtype=np.int64)
    up = resize_nearest(one, 3, 2)
    assert up.shape == (2, 3, 3) and (up == one[0, 0]).all()
    # non-multiple downsample uses the floor mapping
    odd = resize_nearest(src, 4, 3)  # sx = (x*6)//4 -> 0,1,3,4 ; sy = (y*4)//3 -> 0,1,2
    assert (odd[2, 2] == src[2, 3]).all()
    with pytest.raises(ValueError):
        resize_nearest(src, 0, 2)


def test_canonical_decode_covers_lossy_containers():
    """ADVICE r4: _canonical_decode must accept every container the image/
    video decoders support — one JPEG or AVI payload in a batch must not
    fail the whole Spark stage. Lossy content hashes by DECODED pixels."""
    import numpy as np

    from spider_go_spark.functions.jpeg import decode_jpeg_pixels, encode_jpeg
    from spider_go_spark.functions.media import (
        _canonical_decode,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    jp = encode_jpeg(24, 16, rgb.reshape(-1).tolist(), quality=85)
    kind, canon, feats = _canonical_decode(jp)
    assert kind == "image"
    assert (feats["width"], feats["height"]) == (24, 16)
    assert canon == decode_jpeg_pixels(jp).tobytes()

    frames = [
        encode_jpeg(8, 8, rng.integers(0, 256, size=192, dtype=np.int64)
                    .astype(np.uint8).tolist(), quality=90)
        for _ in range(3)
    ]
    avi = encode_avi_mjpeg(8, 8, 10, frames)
    kind, canon, feats = _canonical_decode(avi)
    assert kind == "video"
    assert feats["frame_count"] == 3
    assert canon == b"".join(decode_jpeg_pixels(f).tobytes() for f in frames)
