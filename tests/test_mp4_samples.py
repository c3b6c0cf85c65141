"""MP4 sample-table walk (stsd/stts/stsc/stsz/stco/co64/stss) and
frame sampling — the no-codec "where are the frames" layer under the
metadata probe. Fixture payloads come from encode_mp4_media, whose
sample bytes follow the ASCII-generative mp4_sample_rule, so every
offset/size/pts the parser derives is checked against ground truth
byte-for-byte (a wrong stsc expansion or chunk-offset cumsum anywhere
changes the sliced content)."""

import hashlib

import numpy as np
import pytest

from nadry_spark.operators.multimodal import (
    encode_mp4_media,
    mp4_fixture_track_counts,
    mp4_frames_df,
    mp4_sample_rule,
    parse_mp4_meta,
    parse_mp4_samples,
    probe_media,
    sample_mp4_frames,
)


@pytest.mark.parametrize("mid", [0, 1, 3, 4, 7])  # even=stco, odd=co64
def test_sample_table_round_trip(mid):
    payload = encode_mp4_media(mid)
    n_v, n_a = mp4_fixture_track_counts(mid)
    tracks = parse_mp4_samples(payload)
    assert [t["track_id"] for t in tracks] == [1, 2]
    assert [t["handler"] for t in tracks] == ["vide", "soun"]
    assert [t["codec"] for t in tracks] == ["avc1", "mp4a"]
    for tr, n_expect in zip(tracks, (n_v, n_a)):
        assert tr["n_samples"] == n_expect
        for i in range(n_expect):
            size, pts_ms, content = mp4_sample_rule(mid, tr["track_id"], i + 1)
            assert tr["size"][i] == size
            assert tr["pts_ms"][i] == pts_ms
            off = int(tr["offset"][i])
            assert payload[off : off + size] == content
    # video: stss marks every 4th sample; audio: no stss => all sync
    v, a = tracks
    assert np.array_equal(v["is_sync"], (np.arange(n_v) % 4) == 0)
    assert a["is_sync"].all()


def test_frame_sampling_even_spacing():
    # media_id 4 -> n_v = 8 + (4 % 5) * 3 = 20 -> sync {1,5,9,13,17},
    # n_sync = 5 > 4 -> picks rn (i*4)//3 = 0,1,2,4 -> s = 1,5,9,17
    frames = sample_mp4_frames(encode_mp4_media(4), k=4, handler="vide")
    assert [f["sample_no"] for f in frames] == [1, 5, 9, 17]
    # n_sync <= k keeps all sync samples: media_id 0 -> n_v=8 -> {1,5}
    frames = sample_mp4_frames(encode_mp4_media(0), k=4, handler="vide")
    assert [f["sample_no"] for f in frames] == [1, 5]
    # k=1 keeps the first sync sample only
    frames = sample_mp4_frames(encode_mp4_media(4), k=1)
    assert [f["sample_no"] for f in frames] == [1, 1]
    with pytest.raises(ValueError):
        sample_mp4_frames(encode_mp4_media(0), k=0)


def test_frame_bytes_match_rule():
    for mid in (2, 5):
        for fr in sample_mp4_frames(encode_mp4_media(mid), k=4):
            size, pts_ms, content = mp4_sample_rule(
                mid, fr["track_id"], fr["sample_no"]
            )
            assert fr["data"] == content
            assert fr["pts_ms"] == pts_ms


def test_probe_compat_and_corruption():
    payload = encode_mp4_media(3)
    meta = parse_mp4_meta(payload)
    assert (meta["width"], meta["height"], meta["n_tracks"]) == (64, 48, 2)
    assert probe_media(payload)["container"] == "mp4"
    # truncating mid-moov breaks a box size invariant
    with pytest.raises(ValueError):
        parse_mp4_samples(payload[: len(payload) - 40])
    # no moov at all
    with pytest.raises(ValueError):
        parse_mp4_samples(payload[: payload.index(b"moov") - 4])
    # corrupt an stsz sample count: inflate it so stts no longer tiles
    # stsz body: version+flags(4) sample_size(4) sample_count(4)
    idx = payload.index(b"stsz") + 4 + 4 + 4 + 3  # low byte of sample_count
    broken = bytearray(payload)
    broken[idx] ^= 0x40
    with pytest.raises(ValueError):
        parse_mp4_samples(bytes(broken))


def test_mp4_frames_df(spark):
    rows = [(mid, bytearray(encode_mp4_media(mid))) for mid in range(4)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = mp4_frames_df(media, k=4).collect()
    expect = {}
    for mid in range(4):
        for fr in sample_mp4_frames(encode_mp4_media(mid), 4):
            expect[(mid, fr["track_id"], fr["sample_no"])] = (
                fr["codec"],
                fr["pts_ms"],
                len(fr["data"]),
                hashlib.sha256(fr["data"]).hexdigest(),
            )
    got = {
        (r["media_id"], r["track_id"], r["sample_no"]): (
            r["codec"], r["pts_ms"], r["n_bytes"], r["frame_sha"]
        )
        for r in out
    }
    assert got == expect
