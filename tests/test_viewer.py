"""Live viewer (--viz): HTTP server, binary snapshot protocol, VizHook.

The reference's equivalent is the PCL/VTK viewer thread pair fed by a viz
queue with windowed cloud eviction (run/pipeline.cpp:826-985,
run/viz_lidar_udp.cpp:38-110); slamtpu serves the same sliding-window state
over localhost HTTP to a self-contained canvas renderer.
"""
import struct
import urllib.request

import numpy as np
import pytest

from slamtpu.runtime.viewer import LiveViewer


@pytest.fixture()
def viewer():
    v = LiveViewer(port=0)  # ephemeral port
    yield v
    v.close()


def _fetch(viewer, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{viewer.port}{path}", timeout=5) as r:
        return r.read()


def _parse(blob):
    seq, n_traj, n_ins, n_pts = struct.unpack_from("<IIII", blob, 0)
    traj = np.frombuffer(blob, "<f4", n_traj * 3, 16).reshape(-1, 3)
    ins = np.frombuffer(blob, "<f4", n_ins * 3, 16 + n_traj * 12).reshape(-1, 3)
    pts = np.frombuffer(
        blob, "<f4", n_pts * 4, 16 + (n_traj + n_ins) * 12
    ).reshape(-1, 4)
    return seq, traj, ins, pts


def test_index_page_served(viewer):
    body = _fetch(viewer, "/")
    assert b"slamtpu" in body and b"canvas" in body
    # self-contained: no external asset fetches (zero-egress environments)
    assert b"http://" not in body and b"https://" not in body


def test_snapshot_roundtrip(viewer):
    rng = np.random.default_rng(0)
    cloud = rng.normal(size=(100, 3)).astype(np.float32)
    viewer.push_cloud(cloud, frame_id=7)
    viewer.push_pose([1.0, 2.0, 3.0])

    seq, traj, ins, pts = _parse(_fetch(viewer, "/data?seq=-1"))
    assert seq == 2  # two pushes
    np.testing.assert_allclose(traj, [[1, 2, 3]])
    assert ins.shape == (0, 3)  # no INS overlay pushed
    np.testing.assert_allclose(pts[:, :3], cloud, rtol=1e-6)

    # same-seq poll answers the 16-byte "no change" header
    blob = _fetch(viewer, f"/data?seq={seq}")
    assert len(blob) == 16
    assert struct.unpack_from("<IIII", blob)[0] == seq


def test_dual_trajectory_overlay(viewer):
    """Reference parity: the viewer carries BOTH the optimized trajectory and
    the raw INS one (red vs green overlay, run/pipeline.cpp:862-864)."""
    viewer.push_pose([1.0, 0.0, 0.0], ins_xyz=[1.1, 0.05, 0.0])
    viewer.push_pose([2.0, 0.0, 0.0], ins_xyz=[2.2, 0.10, 0.0])
    _, traj, ins, _ = _parse(_fetch(viewer, "/data?seq=-1"))
    np.testing.assert_allclose(traj, [[1, 0, 0], [2, 0, 0]])
    np.testing.assert_allclose(ins, [[1.1, 0.05, 0], [2.2, 0.1, 0]], rtol=1e-6)
    # the client renders both polylines in the reference's colors
    page = _fetch(viewer, "/")
    assert b"#ff5b5b" in page and b"#58d68d" in page


def test_intensity_channel_transported(viewer):
    """pipeline.cpp:919 colors clouds by intensity; the channel must survive
    the packed (M, 4) path and the wire format."""
    pts4 = np.concatenate(
        [np.zeros((5, 3), np.float32),
         np.arange(5, dtype=np.float32)[:, None] * 50],
        axis=1,
    )
    viewer.push_cloud(pts4)
    _, _, _, pts = _parse(_fetch(viewer, "/data?seq=-1"))
    np.testing.assert_allclose(pts[:, 3], [0, 50, 100, 150, 200])


def test_window_eviction():
    v = LiveViewer(port=0, max_clouds=3, max_points_per_cloud=10)
    try:
        for i in range(5):
            v.push_cloud(np.full((4, 3), float(i), np.float32), frame_id=i)
        _, _, _, pts = _parse(_fetch(v, "/data?seq=-1"))
        # window keeps the last 3 clouds only (reference pipeline.cpp:894-901)
        assert pts.shape[0] == 12
        assert pts[:, 0].min() == 2.0
    finally:
        v.close()


def test_per_cloud_point_cap():
    v = LiveViewer(port=0, max_points_per_cloud=16)
    try:
        v.push_cloud(np.zeros((1000, 3), np.float32))
        _, _, _, pts = _parse(_fetch(v, "/data?seq=-1"))
        assert pts.shape[0] <= 16
    finally:
        v.close()


def test_vizhook_world_transform(viewer):
    from slamtpu.apps.common import Pose3, VizHook

    hook = VizHook(viewer, stride=1)
    body = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]], np.float32)
    # 90 deg about z, translate by (10, 0, -1)
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    pose = Pose3(R, np.array([10.0, 0.0, -1.0]))
    hook.push(body, pose, frame_id=1)

    _, traj, _, pts = _parse(_fetch(viewer, "/data?seq=-1"))
    np.testing.assert_allclose(traj, [[10, 0, -1]])
    np.testing.assert_allclose(
        pts[:, :3], [[10, 1, -1], [8, 0, -1]], atol=1e-5
    )


def test_vizhook_subsample_masks_and_strides(viewer):
    from slamtpu.apps.common import VizHook
    from slamtpu.lidar.project import ScanBuffer

    import jax.numpy as jnp

    n = 64
    pts = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    mask = jnp.arange(n) % 2 == 0
    sb = ScanBuffer(
        points=pts, mask=mask, alpha=jnp.zeros(n), reflectivity=jnp.zeros(n, jnp.uint8),
        num_points=jnp.asarray(32),
    )
    out = VizHook(viewer, stride=4).subsample(sb)
    # stride-4 rows are 0,4,8,... all even -> all mask-true; reflectivity
    # rides as the 4th (intensity) column when the buffer carries it
    assert out.shape == (16, 4)
    np.testing.assert_allclose(out[1, :3], [12, 13, 14])
    np.testing.assert_allclose(out[:, 3], 0.0)
