"""Unit tests for the scan/INS synchronizer (reference sync thread semantics,
run/pipeline_lo_svn.cpp:196-289)."""
import numpy as np

from slamtpu.ins.anpp import NavFrame
from slamtpu.lidar.ouster import FrameGrid
from slamtpu.runtime.sync import Synchronizer, interpolate_at


def nav(t, alt=0.0):
    f = NavFrame()
    f.t = t
    f.lla = np.array([0.9, 0.2, alt])
    f.valid_mask = 0b11111
    return f


def scan(frame_id, t_end, n_cols=4):
    ts = np.linspace(t_end - 0.09, t_end, n_cols)
    return FrameGrid(
        frame_id=frame_id,
        ranges_m=np.ones((n_cols, 2), np.float32),
        reflectivity=np.zeros((n_cols, 2), np.uint8),
        signal=np.zeros((n_cols, 2), np.uint16),
        nir=np.zeros((n_cols, 2), np.uint16),
        col_timestamp_s=ts,
        col_valid=np.ones(n_cols, bool),
        timestamp=float(ts[0]),
        timestamp_end=float(ts[-1]),
        interframe_timedelta=0.0,
    )


class TestSynchronizer:
    def test_first_scan_only_sets_keyframe_ts(self):
        s = Synchronizer()
        for k in range(10):
            s.push_nav(nav(100.0 + 0.02 * k))
        assert s.push_scan(scan(0, 100.1)) == []

    def test_emits_when_nav_covers_interval(self):
        s = Synchronizer()
        s.push_scan(scan(0, 100.1))  # keyframe ts = 100.1
        out = s.push_scan(scan(1, 100.2))
        assert out == []  # no nav yet
        for k in range(20):
            out = s.push_nav(nav(100.0 + 0.02 * k))
            if out:
                break
        assert len(out) == 1
        sf = out[0]
        assert sf.t_start == 100.1 and abs(sf.t_end - 100.2) < 1e-9
        # bracketing interpolated frames exactly at the interval ends
        assert abs(sf.ins[0].t - 100.1) < 1e-9
        assert abs(sf.ins[-1].t - 100.2) < 1e-9
        # inner samples strictly inside
        for f in sf.ins[1:-1]:
            assert sf.t_start < f.t < sf.t_end

    def test_data_gap_drops_scan(self):
        s = Synchronizer(nav_window=8)
        s.push_scan(scan(0, 100.1))
        s.push_scan(scan(1, 100.2))
        # nav only starts AFTER the interval start -> gap -> drop
        out = []
        for k in range(10):
            out += s.push_nav(nav(100.15 + 0.02 * k))
        assert out == []
        assert s.dropped_gaps == 1
        # next scan (interval now starts at 100.2, covered) goes through
        out = s.push_scan(scan(2, 100.3))
        assert len(out) == 1 and out[0].t_start == 100.2

    def test_short_scan_skipped(self):
        s = Synchronizer()
        sc = scan(0, 100.1, n_cols=4)
        sc.col_valid[:] = False
        sc.col_valid[0] = True  # < 2 valid columns
        assert s.push_scan(sc) == []
        # the keyframe timestamp must NOT have been consumed by the bad scan
        assert s._keyframe_ts is None

    def test_multiple_pending_scans_drain_in_order(self):
        s = Synchronizer()
        s.push_scan(scan(0, 100.1))
        s.push_scan(scan(1, 100.2))
        s.push_scan(scan(2, 100.3))
        out = []
        for k in range(25):
            out += s.push_nav(nav(100.0 + 0.02 * k))
        assert [o.scan.frame_id for o in out] == [1, 2]
        assert out[0].t_end == out[1].t_start

    def test_interpolate_at_clamps_to_window_edges(self):
        window = [nav(1.0, alt=0.0), nav(2.0, alt=10.0)]
        assert interpolate_at(window, 0.5).t == 1.0
        assert interpolate_at(window, 2.5).t == 2.0
        mid = interpolate_at(window, 1.25)
        np.testing.assert_allclose(mid.lla[2], 2.5)
