"""Multimodal plumbing (Arrow-batched decode over binary payloads) and
Structured Streaming (watermarked windows == batch result)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark.operators import multimodal
from agol_pandas_spark.streaming import (
    stream_from_directory,
    windowed_counts,
    write_stream_to_memory,
)


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    from agol_pandas_spark.catalog import Catalog

    docs = Catalog(spark, sf_dir).table("documents").limit(50)
    return multimodal.text_as_payload(docs, "text")


def test_metadata_is_jvm_side_and_correct(payloads):
    out = multimodal.attach_payload_metadata(payloads, "payload", mime="text/plain")
    r = out.select("doc_id", "n_chars", "payload_meta.*").first()
    assert r["mime"] == "text/plain"
    assert r["n_bytes"] == r["n_chars"]  # ascii text: bytes == chars
    assert len(r["sha256"]) == 64


def test_decode_features_fake_codec(payloads):
    feats = multimodal.decode_features(
        payloads, "doc_id", codec=multimodal.fake_codec
    )
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["width"] >= 1 and r["height"] >= 1
        assert 0 <= r["mean_intensity"] <= 255


def test_decode_stub_raises_cleanly(payloads):
    feats = multimodal.decode_features(payloads, "doc_id")  # default stub codec
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        feats.collect()


def test_sample_frames_shapes(payloads):
    frames = multimodal.sample_frames(
        payloads, "doc_id", frame_size=16, stride=64, max_frames=3
    )
    rows = frames.collect()
    assert rows
    for r in rows:
        assert 0 <= r["frame_idx"] <= 2
        assert 1 <= len(r["frame_bytes"]) <= 16


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    from agol_pandas_spark.catalog import Catalog

    events = Catalog(spark, sf_dir).table("events")
    # land the events as files → stream them back with availableNow
    land = str(tmp_path / "landing")
    events.repartition(4).write.parquet(land)
    landed_schema = spark.read.parquet(land).schema
    stream = stream_from_directory(spark, land, landed_schema, max_files_per_trigger=2)
    agg = windowed_counts(stream, window_len="1 hour", watermark="0 seconds")
    q = write_stream_to_memory(agg, "win_counts", output_mode="append")
    q.awaitTermination(120)

    got = spark.table("win_counts")
    batch = windowed_counts(events, window_len="1 hour", watermark="0 seconds")
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    # append-mode emits only watermark-closed windows; every emitted window
    # must match batch exactly, and coverage must be non-trivial
    assert g
    for k, v in g.items():
        assert b[k] == v
    assert len(g) >= len(b) - 5  # at most the tail windows unemitted


def test_resize_payload_bytes_match_python_reference(payloads):
    from agol_pandas_spark.operators.multimodal import resize_payload

    out = resize_payload(payloads, "doc_id", factor=4).limit(50).collect()
    src = {r.doc_id: r.text for r in payloads.select("doc_id", "text").collect()}
    assert out
    for r in out:
        want = src[r.doc_id].encode("utf-8")[::4]
        assert bytes(r.resized_payload) == want
        assert r.resized_n_bytes == len(want)


def test_bmp_roundtrip_crafted_file():
    """Real BMP codec (VERDICT r5 item 8): a crafted 3x2 image with known
    pixels round-trips exactly through encode_bmp -> bmp_codec, including
    the 4-byte row padding (3*3=9 bytes/row -> 3 pad bytes) that a naive
    parser would fold into the mean."""
    from agol_pandas_spark.operators.multimodal import bmp_codec, encode_bmp

    pixels = bytes(range(18))  # 3 wide x 2 high x BGR
    payload = encode_bmp(3, 2, pixels)
    # a genuine BMP header: magic, 54-byte offset, 24-bit, BI_RGB
    assert payload[:2] == b"BM"
    assert payload[28] == 24
    # padded stride: 2 rows * (9 + 3 pad) + 54 header bytes
    assert len(payload) == 54 + 2 * 12
    got = bmp_codec(payload)
    assert got["width"] == 3 and got["height"] == 2
    assert got["mean_intensity"] == sum(range(18)) / 18


def test_bmp_codec_rejects_malformed():
    import pytest as _pytest

    from agol_pandas_spark.operators.multimodal import bmp_codec, encode_bmp

    with _pytest.raises(ValueError):
        bmp_codec(b"PNG not bmp")
    good = encode_bmp(3, 2, bytes(18))
    with _pytest.raises(ValueError):
        bmp_codec(good[:40])  # truncated header
    with _pytest.raises(ValueError):
        bmp_codec(good[:-5])  # truncated pixel data
    # 8-bit bitcount rejected
    bad = bytearray(good)
    bad[28] = 8
    with _pytest.raises(ValueError):
        bmp_codec(bytes(bad))


def test_bmp_decode_through_map_in_pandas(spark):
    from agol_pandas_spark.operators.multimodal import (
        bmp_codec,
        decode_features,
        encode_bmp,
    )

    rows = []
    for i, (w, h) in enumerate([(4, 3), (5, 2), (8, 1)]):
        px = bytes((j * 7 + i) % 256 for j in range(w * h * 3))
        rows.append((i, encode_bmp(w, h, px), w, h, sum(px) / len(px)))
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r
        for r in decode_features(df, "doc_id", "payload", codec=bmp_codec).collect()
    }
    for i, _, w, h, mean in rows:
        assert got[i]["width"] == w
        assert got[i]["height"] == h
        assert got[i]["mean_intensity"] == mean


class TestWavCodec:
    def test_roundtrip_stats(self):
        from agol_pandas_spark.operators.multimodal import encode_wav, wav_codec

        samples = [0, 1000, -1000, 32767, -32768, 5]
        got = wav_codec(encode_wav(44100, samples))
        assert got == {
            "sample_rate": 44100,
            "n_samples": 6,
            "mean_amplitude": sum(samples) / 6,
        }

    def test_chunk_walk_skips_extra_chunks(self):
        """A LIST chunk between fmt and data (word-aligned, odd size)
        must be walked over, not mis-parsed as audio."""
        import struct

        from agol_pandas_spark.operators.multimodal import encode_wav, wav_codec

        base = encode_wav(8000, [7, -7, 7])
        fmt_and_rest = base[12:]
        extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad
        patched = (
            struct.pack("<4sI4s", b"RIFF", len(fmt_and_rest) + len(extra) + 4,
                        b"WAVE")
            + base[12:36]          # fmt chunk (8 + 16 bytes)
            + extra
            + base[36:]            # data chunk
        )
        got = wav_codec(patched)
        assert (got["n_samples"], got["sample_rate"]) == (3, 8000)

    def test_malformed_payloads_raise(self):
        import struct

        import pytest

        from agol_pandas_spark.operators.multimodal import encode_wav, wav_codec

        with pytest.raises(ValueError):
            wav_codec(b"RIFFxxxxWAV?")          # bad magic
        good = encode_wav(8000, [1, 2, 3])
        with pytest.raises(ValueError):
            wav_codec(good[:-2])                # truncated data chunk
        # stereo rejected: patch channels=2 in the fmt chunk
        stereo = bytearray(good)
        struct.pack_into("<H", stereo, 22, 2)
        with pytest.raises(ValueError):
            wav_codec(bytes(stereo))
