"""Native C++ decoder parity: must match the numpy parser byte-for-byte."""
import numpy as np
import pytest

from slamtpu.lidar import LidarParams, build_luts, parse_packet
from slamtpu.lidar import native
from tests.test_lidar import build_legacy_packet, build_rng19_packet, make_meta, random_fields

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++/native lib")


def test_rng19_matches_python():
    meta = make_meta(cols=64, pix=16, cpp=4)
    luts = build_luts(meta, LidarParams(channel_stride=2))
    bufs, pcs = [], []
    rng = np.random.default_rng(3)
    for k in range(5):
        ranges, refl, sig, nir = random_fields(meta, 4)
        ts = [int(1e9 + (k * 4 + i) * 1e5) for i in range(4)]
        pkt = build_rng19_packet(meta, k // 2, [i for i in range(4)], ts, ranges, refl, sig, nir,
                                 col_status=[1, 0, 1, 1])
        bufs.append(pkt)
        pcs.append(parse_packet(pkt, meta, luts))
    out = native.decode_batch(b"".join(bufs), meta, luts)
    assert out is not None
    assert out["pkt_ok"].all()
    for k, pc in enumerate(pcs):
        sl = slice(k * 4, (k + 1) * 4)
        np.testing.assert_array_equal(out["m_ids"][sl], pc.m_ids)
        np.testing.assert_array_equal(out["col_valid"][sl], pc.col_valid)
        np.testing.assert_allclose(out["timestamps_s"][sl], pc.timestamps_s, atol=0)
        np.testing.assert_array_equal(out["ranges_m"][sl], pc.ranges_m)
        np.testing.assert_array_equal(out["reflectivity"][sl], pc.reflectivity)
        np.testing.assert_array_equal(out["signal"][sl], pc.signal)
        np.testing.assert_array_equal(out["nir"][sl], pc.nir)
        np.testing.assert_array_equal(out["frame_ids"][sl], pc.frame_ids)


def test_legacy_matches_python():
    meta = make_meta(profile="LEGACY", cols=32, pix=8, cpp=4)
    luts = build_luts(meta, LidarParams(channel_stride=4))
    ranges, refl, sig, nir = random_fields(meta, 4)
    pkt = build_legacy_packet(meta, [1, 1, 2, 2], [0, 1, 2, 3], [100, 200, 300, 400],
                              ranges, refl, sig, nir,
                              block_status=[0xFFFFFFFF, 0, 0xFFFFFFFF, 0xFFFFFFFF])
    pc = parse_packet(pkt, meta, luts)
    out = native.decode_batch(pkt, meta, luts)
    assert out is not None
    np.testing.assert_array_equal(out["col_valid"][:4], pc.col_valid)
    np.testing.assert_array_equal(out["ranges_m"][:4], pc.ranges_m)
    np.testing.assert_array_equal(out["frame_ids"][:4], pc.frame_ids)


def test_bad_type_marks_pkt():
    meta = make_meta(cols=16, pix=8, cpp=4)
    luts = build_luts(meta, LidarParams())
    ranges, refl, sig, nir = random_fields(meta, 4)
    pkt = bytearray(build_rng19_packet(meta, 0, [0, 1, 2, 3], [0] * 4, ranges, refl, sig, nir))
    pkt[0] = 0xAB
    out = native.decode_batch(bytes(pkt), meta, luts)
    assert out is not None
    assert not out["pkt_ok"][0]
    assert not out["col_valid"][:4].any()


class TestAnppNative:
    def test_matches_python_decoder(self):
        from slamtpu.ins import native as ins_native
        from tests.test_ins import make_pkt20, make_pkt25, make_pkt26, make_pkt28, make_pkt29

        if not ins_native.available():
            pytest.skip("no native anpp lib")
        pkts = [
            make_pkt20(t=3600.5, lla=(0.91, 0.23, 40.0), vel=(1.5, -2.0, 0.3),
                       rpy=(0.02, -0.04, 2.1), sys_status=0x0041, filt_status=0x1F),
            make_pkt25((0.01, 0.02, 0.03)),
            make_pkt26((0.002, 0.001, 0.004)),
            make_pkt28(list(np.arange(12) * 0.25)),
            make_pkt29(t=3600.55, status=0x5A),
            b"\x00\x14\x05\x00\x00bad",  # malformed
        ]
        out = ins_native.decode_batch(pkts)
        assert out is not None
        pids, fields = out
        np.testing.assert_array_equal(pids, [20, 25, 26, 28, 29, 0])
        np.testing.assert_allclose(fields[0][0], 3600.5, atol=1e-6)
        np.testing.assert_allclose(fields[0][1:4], [0.91, 0.23, 40.0])
        np.testing.assert_allclose(fields[0][4:7], [1.5, -2.0, 0.3], atol=1e-6)
        np.testing.assert_allclose(fields[0][11:14], [0.02, -0.04, 2.1], atol=1e-6)
        assert int(fields[0][20]) == 0x0041 and int(fields[0][21]) == 0x1F
        np.testing.assert_allclose(fields[1][:3], [0.01, 0.02, 0.03], atol=1e-7)
        np.testing.assert_allclose(fields[3][:12], np.arange(12) * 0.25, atol=1e-6)
        np.testing.assert_allclose(fields[4][0], 3600.55, atol=1e-6)
        assert int(fields[4][14]) == 0x5A


def test_push_packets_matches_push_packet():
    """FrameAssembler.push_packets (batched native decode + one scatter per
    frame run) emits the same FrameGrids as the per-packet path — including
    a rejected packet in the middle (wrong packet type), which both paths
    must treat as invisible."""
    from slamtpu.lidar import FrameAssembler

    meta = make_meta(cols=16, pix=8, cpp=4)
    luts = build_luts(meta, LidarParams(channel_stride=2))
    bufs = []
    for k in range(3):  # 3 frames x 4 packets
        for p in range(4):
            ranges, refl, sig, nir = random_fields(meta, 4)
            pkt = build_rng19_packet(
                meta, k, [p * 4 + i for i in range(4)],
                [int(1e9 + (k * 16 + p * 4 + i) * 1e5) for i in range(4)],
                ranges, refl, sig, nir,
            )
            bufs.append(pkt)
    # corrupt one packet's type word: parse_packet returns None for it
    bad = bytearray(bufs[5])
    bad[0] = 0x42
    bufs[5] = bytes(bad)

    a, b = FrameAssembler(meta, luts), FrameAssembler(meta, luts)
    seq = []
    for buf in bufs:
        fr = a.push_packet(buf)
        if fr is not None:
            seq.append(fr)
    bat = b.push_packets(bufs)
    assert len(seq) == len(bat) == 2
    for fa, fb in zip(seq, bat):
        assert fa.frame_id == fb.frame_id
        np.testing.assert_array_equal(fa.col_valid, fb.col_valid)
        np.testing.assert_array_equal(fa.ranges_m, fb.ranges_m)
        np.testing.assert_array_equal(fa.reflectivity, fb.reflectivity)
        np.testing.assert_array_equal(fa.signal, fb.signal)
        np.testing.assert_array_equal(fa.nir, fb.nir)
        np.testing.assert_allclose(fa.col_timestamp_s, fb.col_timestamp_s, atol=0)
        assert fa.timestamp == fb.timestamp and fa.timestamp_end == fb.timestamp_end
    # tails match too
    ta, tb = a.flush(), b.flush()
    assert (ta is None) == (tb is None)
    if ta is not None:
        np.testing.assert_array_equal(ta.ranges_m, tb.ranges_m)
