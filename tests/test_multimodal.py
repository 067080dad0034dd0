from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(b"\x00\x10\x20\x30" * 10), ("image", "png", 4, 4, None, None)),
        (2, bytearray(b"\xff\xee\xdd" * 5), ("audio", "wav", None, None, 1500, None)),
        (3, None, ("video", "mp4", 640, 480, 3500, None)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<media_type:string, format:string, width:int, height:int, "
        "duration_ms:bigint, size_bytes:bigint>",
    )


def test_metadata_size_fill(media):
    out = multimodal.attach_metadata(media)
    sizes = {r["media_id"]: r["meta"]["size_bytes"] for r in out.collect()}
    assert sizes[1] == 40 and sizes[2] == 15 and sizes[3] is None


def test_extract_features_with_fake_decoder(media):
    feats = multimodal.extract_features(
        media, decoder=multimodal.deterministic_fake_decoder
    )
    rows = {r["media_id"]: r.asDict() for r in feats.collect()}
    assert rows[1]["decode_ok"] and len(rows[1]["feature"]) == 8
    assert abs(sum(rows[1]["feature"]) - 1.0) < 1e-6  # histogram normalizes
    assert rows[3]["decode_ok"]  # empty payload → zero histogram


def test_extract_features_routes_errors(media):
    def failing(payload, fmt):
        raise ValueError("no codec")

    feats = multimodal.extract_features(media, decoder=failing)
    rows = feats.collect()
    assert all(not r["decode_ok"] for r in rows)
    assert all("no codec" in r["error"] for r in rows)


def test_default_decoder_is_stubbed(media):
    feats = multimodal.extract_features(media)  # default decoder raises
    assert all(not r["decode_ok"] for r in feats.collect())


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media.filter(F.col("media_id") == 3), every_ms=1000)
    ts = sorted(r["frame_ts_ms"] for r in plan.collect())
    assert ts == [0, 1000, 2000, 3000]


def test_resize_media_with_fake_resizer(media):
    out = {r["media_id"]: r for r in multimodal.resize_media(
        media, 8, 4, resizer=multimodal.deterministic_fake_resizer
    ).collect()}
    assert set(out) == {1, 2, 3}
    for mid in (1, 2):
        assert out[mid]["resize_ok"]
        assert out[mid]["width"] == 8 and out[mid]["height"] == 4
        assert len(out[mid]["payload"]) == 32  # exactly width*height bytes
    assert out[3]["payload"] == bytearray()  # null payload -> empty, no error
    # deterministic: same input, same bytes
    again = {r["media_id"]: r["payload"] for r in multimodal.resize_media(
        media, 8, 4, resizer=multimodal.deterministic_fake_resizer
    ).collect()}
    assert again[1] == out[1]["payload"]


def test_resize_media_routes_errors_and_default_stub(media):
    def failing(payload, fmt, w, h):
        raise ValueError("no resizer")

    rows = multimodal.resize_media(media, 4, 4, resizer=failing).collect()
    assert all(not r["resize_ok"] for r in rows)
    assert all("no resizer" in r["error"] for r in rows)
    stub = multimodal.resize_media(media, 4, 4).collect()  # default raises
    assert all(not r["resize_ok"] for r in stub)


# ---------------------------------------------------------------------------
# Real pure-Python codecs (r9 verdict #5): genuine bytes, bit-exact.
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_bit_exact():
    raster = bytes(range(3 * 4 * 2))  # 4x2 RGB, distinct byte per cell
    ppm = multimodal.encode_ppm(4, 2, raster)
    assert ppm.startswith(b"P6\n4 2\n255\n")
    w, h, back = multimodal.decode_ppm(ppm)
    assert (w, h) == (4, 2) and back == raster


def test_ppm_parser_handles_comments_and_rejects_garbage():
    raster = bytes(3 * 2 * 2)
    with_comment = b"P6\n# a comment line\n2 2\n# another\n255\n" + raster
    assert multimodal.decode_ppm(with_comment) == (2, 2, raster)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a P6"):
        multimodal.decode_ppm(b"P5\n2 2\n255\n" + raster)
    with _pytest.raises(ValueError, match="truncated ppm raster"):
        multimodal.decode_ppm(b"P6\n2 2\n255\n" + raster[:-1])
    with _pytest.raises(ValueError, match="unsupported maxval"):
        multimodal.decode_ppm(b"P6\n2 2\n65535\n" + raster * 2)


def test_ppm_features_exact():
    # 2x1: pixels (10,20,30) and (40,50,60)
    ppm = multimodal.encode_ppm(2, 1, bytes([10, 20, 30, 40, 50, 60]))
    assert multimodal.ppm_features(ppm) == [2.0, 1.0, 2.0, 50.0, 70.0, 90.0]


def test_ppm_resize_identity_and_downsample():
    raster = bytes((i * 37) % 256 for i in range(3 * 6 * 4))
    ppm = multimodal.encode_ppm(6, 4, raster)
    # identity: resizing to source dims returns the exact same bytes
    assert multimodal.ppm_resize(ppm, "ppm", 6, 4) == ppm
    # 2x downsample: each target pixel is the nearest-neighbour source
    # pixel at (x*6//3, y*4//2)
    small = multimodal.ppm_resize(ppm, "ppm", 3, 2)
    w, h, out = multimodal.decode_ppm(small)
    assert (w, h) == (3, 2)
    for y in range(2):
        for x in range(3):
            si = 3 * ((y * 2) * 6 + x * 2)
            assert out[3 * (y * 3 + x) : 3 * (y * 3 + x) + 3] == raster[si : si + 3]


def test_wav_roundtrip_features_exact():
    samples = [0, 1000, -1000, 32767, -32768, 7]  # 2ch -> 3 frames
    wav = multimodal.encode_wav(8000, 2, samples)
    feats = multimodal.wav_features(wav)
    assert feats == [
        2.0, 8000.0, 3.0,
        float(sum(samples)),
        float(sum(abs(s) for s in samples)),
    ]


def test_wav_parser_walks_chunk_list():
    import struct

    samples = [5, -5]
    wav = multimodal.encode_wav(16000, 1, samples)
    # splice an unknown odd-sized chunk between fmt and data: a real
    # RIFF reader must skip it (word-aligned) and still find data
    fmt_end = wav.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = wav[:fmt_end] + junk + wav[fmt_end:]
    assert multimodal.wav_features(spliced) == multimodal.wav_features(wav)


def test_media_decoder_dispatch_and_seam(media):
    ppm = multimodal.encode_ppm(1, 1, bytes([9, 9, 9]))
    assert multimodal.media_decoder(ppm, "ppm")[0] == 1.0
    wav = multimodal.encode_wav(8000, 1, [1])
    assert multimodal.media_decoder(wav, "wav")[0] == 1.0
    png = multimodal.encode_png(1, 1, bytes([9, 9, 9]))
    assert multimodal.media_decoder(png, "png")[0] == 1.0
    import pytest as _pytest

    # jpeg/mp4 remain the genuine injection seam (need codec libs)
    with _pytest.raises(NotImplementedError):
        multimodal.media_decoder(b"\xff\xd8\xff\xe0", "jpeg")


def test_extract_features_decodes_real_ppm_bytes(spark):
    """The full mapInPandas pipeline over REAL media bytes: encode
    genuine P6 payloads, decode with the real parser, and mix in one
    unparseable format to prove the seam still error-routes."""
    rows = [
        (1, multimodal.encode_ppm(2, 1, bytes([10, 20, 30, 40, 50, 60])), "ppm"),
        (2, multimodal.encode_wav(8000, 1, [100, -100, 50]), "wav"),
        (3, b"\xff\xd8\xff\xe0....", "jpeg"),
        (4, multimodal.encode_png(2, 1, bytes([10, 20, 30, 40, 50, 60])), "png"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, fmt string"
    ).select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("fmt").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length("payload").cast("long").alias("size_bytes"),
        ).alias("meta"),
    )
    out = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            media, decoder=multimodal.media_decoder
        ).collect()
    }
    assert out[1]["decode_ok"] and out[1]["feature"] == [2.0, 1.0, 2.0, 50.0, 70.0, 90.0]
    assert out[2]["decode_ok"] and out[2]["feature"][:3] == [1.0, 8000.0, 3.0]
    assert not out[3]["decode_ok"] and "media decoding requires" in out[3]["error"]
    assert out[4]["decode_ok"] and out[4]["feature"] == [2.0, 1.0, 2.0, 50.0, 70.0, 90.0]


# -- property tests: codecs must round-trip arbitrary payloads --------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_ppm_roundtrip_property(w, h, data):
    raster = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
            )
        )
    )
    ppm = multimodal.encode_ppm(w, h, raster)
    assert multimodal.decode_ppm(ppm) == (w, h, raster)
    # identity resize returns the exact encoded bytes
    assert multimodal.ppm_resize(ppm, "ppm", w, h) == ppm
    # features recompute exactly from the raster
    feats = multimodal.ppm_features(ppm)
    sums = [0, 0, 0]
    for i, b in enumerate(raster):
        sums[i % 3] += b
    assert feats == [float(w), float(h), float(w * h)] + [float(s) for s in sums]


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=2),
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    ),
)
def test_wav_roundtrip_property(rate, channels, frames):
    # interleave: sample count must be a frame multiple
    samples = frames * channels
    wav = multimodal.encode_wav(rate, channels, samples)
    feats = multimodal.wav_features(wav)
    assert feats == [
        float(channels),
        float(rate),
        float(len(samples) // channels),
        float(sum(samples)),
        float(sum(abs(s) for s in samples)),
    ]


# -- PNG codec (r11 verdict #2: the last seam closable with stdlib) --


def test_png_roundtrip_bit_exact():
    raster = bytes(range(3 * 2 * 3))  # 2x3 RGB
    png = multimodal.encode_png(2, 3, raster)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert multimodal.decode_png(png) == (2, 3, 3, raster)


def test_png_all_five_filters_roundtrip():
    # 6 rows => the encoder cycles through every filter type incl.
    # Paeth (row 4) and wraps back to None (row 5)
    w, h = 5, 6
    raster = bytes((i * 37 + 11) % 256 for i in range(3 * w * h))
    png = multimodal.encode_png(w, h, raster)
    assert multimodal.decode_png(png) == (w, h, 3, raster)
    # the filtered stream really uses all five types
    import struct as _struct
    import zlib as _zlib

    pos, idat = 8, b""
    while pos + 12 <= len(png):
        (ln,) = _struct.unpack_from(">I", png, pos)
        if png[pos + 4 : pos + 8] == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = _zlib.decompress(idat)
    stride = 3 * w
    assert [raw[y * (stride + 1)] for y in range(h)] == [0, 1, 2, 3, 4, 0]


def test_png_rejects_corruption():
    png = multimodal.encode_png(2, 2, bytes(12))
    with pytest.raises(ValueError, match="not a png"):
        multimodal.decode_png(b"\x89PNX" + png[4:])
    # flip a raster-affecting byte inside IDAT: CRC must catch it
    idat_at = png.index(b"IDAT") + 4
    bad = bytearray(png)
    bad[idat_at + 2] ^= 0xFF
    with pytest.raises(ValueError, match="bad crc"):
        multimodal.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="unsupported channel count"):
        multimodal.encode_png(2, 2, bytes(8), channels=2)
    with pytest.raises(ValueError, match="raster is"):
        multimodal.encode_png(2, 2, bytes(11))


def test_png_features_exact():
    # 1x2 RGB: rows exercise None + Sub... dims small but sums exact
    raster = bytes([1, 2, 3, 250, 251, 252])
    png = multimodal.encode_png(1, 2, raster)
    assert multimodal.png_features(png) == [1.0, 2.0, 2.0, 251.0, 253.0, 255.0]
    # RGBA: alpha is excluded from the RGB sums
    rgba = bytes([1, 2, 3, 128, 9, 8, 7, 64])
    png4 = multimodal.encode_png(2, 1, rgba, channels=4)
    assert multimodal.png_features(png4) == [2.0, 1.0, 2.0, 10.0, 10.0, 10.0]


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    channels=st.sampled_from([3, 4]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, data):
    n = channels * w * h
    raster = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    png = multimodal.encode_png(w, h, raster, channels=channels)
    assert multimodal.decode_png(png) == (w, h, channels, raster)
    sums = [0, 0, 0]
    for i, b in enumerate(raster):
        if i % channels < 3:
            sums[i % channels] += b
    assert multimodal.png_features(png) == [
        float(w), float(h), float(w * h),
    ] + [float(s) for s in sums]
