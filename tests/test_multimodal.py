"""Multimodal plumbing tests: binary payload columns, Arrow-batched
stub decode, frame-sampling plan, real-decoder gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytearray(b"img-bytes-0"), None),
        (1, "audio", bytearray(b"audio-bytes-1"), None),
        (2, "video", bytearray(b"video-bytes-2"), None),
        (3, "image", None, None),  # null payload
        (4, "video", bytearray(b""), None),  # empty payload
    ]
    return spark.createDataFrame(rows, schema=M.MEDIA)


def test_decode_meta_deterministic_and_typed(media):
    meta = M.decode_media_meta(media)
    assert [f.name for f in meta.schema.fields] == [
        f.name for f in M.MEDIA_META.fields
    ]
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == 5
    # image fields set, audio/video partitioned correctly
    h = hashlib.md5(b"img-bytes-0").hexdigest()
    x = int(h[:15], 16)
    r0 = rows[0]
    assert r0["content_hash"] == h
    assert r0["width"] == 16 + x % 4096
    assert r0["height"] == 16 + (x // 4096) % 4096
    assert r0["duration_ms"] is None and r0["n_frames"] is None
    assert rows[1]["width"] is None and rows[1]["duration_ms"] is not None
    assert rows[2]["n_frames"] is not None
    # null payload decodes as empty bytes, not a crash
    assert rows[3]["n_bytes"] == 0
    assert rows[3]["content_hash"] == hashlib.md5(b"").hexdigest()
    assert rows[4]["n_bytes"] == 0


def test_frame_sample_plan(media):
    meta = M.decode_media_meta(media)
    frames = M.sample_frames(meta, every_n=100)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_no").alias("mx")
    ).collect()
    by_id = {r["media_id"]: r for r in got}
    # only video rows sampled
    assert set(by_id) <= {2, 4}
    nf = {r["media_id"]: r["n_frames"] for r in meta.collect() if r["n_frames"]}
    for mid, r in by_id.items():
        expected = (nf[mid] - 1) // 100 + 1
        assert r["n"] == expected
        assert r["mx"] <= nf[mid] - 1


def test_real_decoder_is_gated(media):
    with pytest.raises(NotImplementedError):
        M.decode_image_real(media)


def test_synth_media_matches_text_bytes(spark):
    docs = spark.createDataFrame(
        [(7, "hello world"), (8, "héllo ünïcode")], ["doc_id", "text"]
    )
    rows = {r["media_id"]: r for r in
            M.decode_media_meta(M.synth_media_from_documents(docs)).collect()}
    assert rows[7]["content_hash"] == hashlib.md5(b"hello world").hexdigest()
    assert rows[8]["content_hash"] == hashlib.md5(
        "héllo ünïcode".encode()
    ).hexdigest()
    assert rows[8]["n_bytes"] == len("héllo ünïcode".encode())


class TestMediaExactDedup:
    def test_keeper_and_clusters(self, spark):
        from search_engine_spark.ops.multimodal import media_exact_dedup

        rows = [
            (1, "image", b"\x89PNG-payload-A", None),
            (2, "image", b"\x89PNG-payload-A", None),   # dup of 1
            (7, "image", b"\x89PNG-payload-A", None),   # dup of 1
            (3, "image", b"\x89PNG-payload-B", None),
            # same bytes, DIFFERENT kind: separate cluster by design
            (4, "audio", b"\x89PNG-payload-A", None),
            (5, "video", None, None),                   # null payload
            (6, "video", b"", None),                    # empty payload
        ]
        df = spark.createDataFrame(
            rows, "media_id long, kind string, payload binary, source_url string"
        )
        got = {
            r["media_id"]: (r["cluster_size"], r["is_keeper"])
            for r in media_exact_dedup(df).collect()
        }
        assert got[1] == (3, True)
        assert got[2] == (3, False) and got[7] == (3, False)
        assert got[3] == (1, True)
        assert got[4] == (1, True)
        # null and empty payload hash identically (coalesce to b"") and
        # share a kind -> one cluster, min id keeps
        assert got[5] == (2, True) and got[6] == (2, False)
        # exactly one keeper per (kind, hash) cluster
        kept = sum(1 for cs, k in got.values() if k)
        assert kept == 4
