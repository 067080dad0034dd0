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
