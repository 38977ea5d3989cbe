"""ANPP decoder, NavFrame interpolation, geodesy, and gravity tests."""
import struct

import jax.numpy as jnp
import numpy as np

from slamtpu.ins import (
    AnppDecoder,
    ImuConfig,
    NavFrame,
    gravity_wgs84,
    interpolate,
    lla2ned,
    ned2lla,
    symmetrical_angle,
)

RNG = np.random.default_rng(5)


def pkt(pid, payload: bytes) -> bytes:
    return bytes([0x00, pid, len(payload), 0x00, 0x00]) + payload


def make_pkt20(t=3600.0, lla=(0.9, 0.2, 35.0), vel=(1.0, 2.0, 0.1),
               rpy=(0.01, -0.02, 1.5), sys_status=0, filt_status=0x0F):
    secs = int(t)
    usecs = int(round((t - secs) * 1e6))
    payload = struct.pack("<HHII", sys_status, filt_status, secs, usecs)
    payload += struct.pack("<ddd", *lla)
    payload += struct.pack(
        "<16f", *vel, 0.1, 0.2, 9.8, 1.0, *rpy, 0.01, 0.02, 0.03, 1.1, 1.2, 1.3
    )
    assert len(payload) == 100
    return pkt(20, payload)


def make_pkt25(s=(0.05, 0.06, 0.07)):
    return pkt(25, struct.pack("<3f", *s))


def make_pkt26(s=(0.001, 0.002, 0.003)):
    return pkt(26, struct.pack("<3f", *s))


def make_pkt28(vals=None):
    vals = vals if vals is not None else list(np.arange(12) * 0.1)
    return pkt(28, struct.pack("<12f", *vals))


def make_pkt29(t=3600.05, status=0x7F):
    secs, usecs = int(t), int(round((t - int(t)) * 1e6))
    payload = struct.pack("<II", secs, usecs)
    payload += struct.pack("<ddd", 0.9001, 0.2001, 36.0)
    payload += struct.pack("<10f", 1.0, 2.0, 0.1, 0.5, 0.5, 0.8, 0.01, 1.5, 0.001, 0.002)
    payload += struct.pack("<H", status)
    assert len(payload) == 74
    return pkt(29, payload)


class TestAnpp:
    def test_frame_requires_all_five(self):
        dec = AnppDecoder()
        assert dec.push_packet(make_pkt20()) is None
        assert dec.push_packet(make_pkt25()) is None
        assert dec.push_packet(make_pkt26()) is None
        assert dec.push_packet(make_pkt28()) is None
        frame = dec.push_packet(make_pkt29())
        assert frame is not None and frame.is_complete()

    def test_fields_decoded(self):
        dec = AnppDecoder()
        for p in (make_pkt20(), make_pkt25(), make_pkt26(), make_pkt28()):
            dec.push_packet(p)
        f = dec.push_packet(make_pkt29())
        np.testing.assert_allclose(f.t, 3600.0, atol=1e-6)
        np.testing.assert_allclose(f.lla, [0.9, 0.2, 35.0])
        np.testing.assert_allclose(f.vel_ned, [1.0, 2.0, 0.1], atol=1e-6)
        np.testing.assert_allclose(f.rpy, [0.01, -0.02, 1.5], atol=1e-6)
        np.testing.assert_allclose(f.sigma_vel, [0.05, 0.06, 0.07], atol=1e-7)
        np.testing.assert_allclose(f.sigma_rpy, [0.001, 0.002, 0.003], atol=1e-7)
        np.testing.assert_allclose(f.imu_accel, [0.0, 0.1, 0.2], atol=1e-6)
        np.testing.assert_allclose(f.lla29, [0.9001, 0.2001, 36.0])
        assert f.fix_status == 0  # filt_status 0x0F has fix bits 4-6 = 0
        # quaternion matches ZYX euler
        from slamtpu.core import so3

        R_q = np.asarray(so3.quat_to_rot(jnp.asarray(f.quat)))
        R_e = np.asarray(so3.rpy_to_rot(jnp.asarray(f.rpy)))
        np.testing.assert_allclose(R_q, R_e, atol=1e-6)

    def test_timestamp_fold(self):
        dec = AnppDecoder()
        t = 3 * 86400 + 123.5
        dec.push_packet(make_pkt20(t=t))
        assert abs(dec._frame.t - 123.5) < 1e-6

    def test_bad_packets_rejected(self):
        dec = AnppDecoder()
        assert dec.push_packet(b"") is None
        assert dec.push_packet(bytes(5)) is None
        bad = bytearray(make_pkt20())
        bad[2] = 99  # wrong declared length
        assert dec.push_packet(bytes(bad)) is None
        assert dec._frame.valid_mask == 0

    def test_failure_bits_or_init_bits_and(self):
        dec = AnppDecoder()
        dec.push_packet(make_pkt20(sys_status=0x0001, filt_status=0x0003))
        a = dec._frame
        assert a.fail_bits & 1  # system failure
        assert a.init_bits & 0b11  # orientation + navigation init


class TestInterpolate:
    def make(self, t, yaw, fail, init):
        f = NavFrame()
        f.t = t
        f.lla = np.array([0.9, 0.2, 10.0 + t])
        f.rpy = np.array([0.0, 0.0, yaw])
        from slamtpu.core import so3

        f.quat = np.asarray(so3.rot_to_quat(so3.rpy_to_rot(jnp.asarray(f.rpy))))
        f.fail_bits = fail
        f.init_bits = init
        f.fix_status = 2 if t < 1 else 6
        f.valid_mask = 0b11111
        return f

    def test_strategies(self):
        a = self.make(0.0, 0.0, 0b01, 0b11)
        b = self.make(1.0, 1.0, 0b10, 0b01)
        m = interpolate(a, b, 0.25)
        np.testing.assert_allclose(m.t, 0.25)
        np.testing.assert_allclose(m.lla[2], 10.25)
        assert m.fail_bits == 0b11  # OR
        assert m.init_bits == 0b01  # AND
        assert m.fix_status == a.fix_status  # nearest (t<0.5)
        # slerp: quaternion at quarter yaw
        from slamtpu.core import so3

        rpy = np.asarray(so3.rot_to_rpy(so3.quat_to_rot(jnp.asarray(m.quat))))
        np.testing.assert_allclose(rpy[2], 0.25, atol=1e-7)

    def test_clamping(self):
        a = self.make(0.0, 0.0, 0, 0)
        b = self.make(1.0, 1.0, 0, 0)
        m = interpolate(a, b, 1.7)
        np.testing.assert_allclose(m.t, 1.0)


class TestGeodesy:
    def test_roundtrip(self):
        # lla2ned is the reference's 2nd-order series (registercallback.cpp:
        # 93-116); its truncation error grows ~r^3 (about 1.5 cm at 850 m,
        # 0.2 m at 2 km). ned2lla is exact (ECEF + Bowring iteration), so the
        # roundtrip exposes exactly the series error envelope.
        ref = jnp.asarray([np.deg2rad(52.5), np.deg2rad(13.4), 35.0])
        ned = jnp.asarray(RNG.uniform(-500, 500, size=(64, 3)))
        lla = ned2lla(ned, ref)
        ned2 = lla2ned(lla, ref)
        np.testing.assert_allclose(np.asarray(ned2), np.asarray(ned), atol=2e-2)

    def test_series_error_envelope_at_2km(self):
        ref = jnp.asarray([np.deg2rad(52.5), np.deg2rad(13.4), 35.0])
        ned = jnp.asarray(RNG.uniform(-2000, 2000, size=(64, 3)))
        ned2 = lla2ned(ned2lla(ned, ref), ref)
        assert float(jnp.max(jnp.abs(ned2 - ned))) < 0.25

    def test_zero_offset(self):
        ref = jnp.asarray([0.8, 0.3, 100.0])
        np.testing.assert_allclose(np.asarray(lla2ned(ref, ref)), np.zeros(3), atol=1e-9)

    def test_north_displacement_sign(self):
        ref = np.array([np.deg2rad(52.5), np.deg2rad(13.4), 0.0])
        north = ref + np.array([1e-5, 0, 0])
        ned = np.asarray(lla2ned(jnp.asarray(north), jnp.asarray(ref)))
        assert ned[0] > 0 and abs(ned[1]) < 1e-3
        # ~1.11 m per 1e-5 rad at this latitude
        np.testing.assert_allclose(ned[0], 6378137.0 * 1e-5, rtol=0.01)

    def test_symmetrical_angle(self):
        np.testing.assert_allclose(float(symmetrical_angle(jnp.asarray(3 * np.pi))), -np.pi)
        np.testing.assert_allclose(float(symmetrical_angle(jnp.asarray(0.5))), 0.5)


class TestGravity:
    def test_known_values(self):
        # WGS84 normal gravity: equator 9.7803, pole 9.8322 (on ellipsoid)
        g_eq = float(gravity_wgs84(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0)))
        g_pole = float(
            gravity_wgs84(jnp.asarray(np.pi / 2), jnp.asarray(0.0), jnp.asarray(0.0))
        )
        np.testing.assert_allclose(g_eq, 9.7803253359, atol=2e-6)
        np.testing.assert_allclose(g_pole, 9.8321849379, atol=2e-6)

    def test_altitude_decreases(self):
        lat = jnp.asarray(np.deg2rad(52.5))
        g0 = float(gravity_wgs84(lat, jnp.asarray(0.2), jnp.asarray(0.0)))
        g1 = float(gravity_wgs84(lat, jnp.asarray(0.2), jnp.asarray(1000.0)))
        assert g1 < g0
        np.testing.assert_allclose(g0 - g1, 3.086e-3, rtol=0.05)  # free-air gradient


class TestImuConfig:
    def test_from_json(self):
        cfg = ImuConfig.from_json(
            {
                "imu_parameter": {
                    "updateRateHz": 100.0,
                    "staticBiasAccelerometer": [0.1, 0.2, 0.3],
                    "velocityRandomWalk": [1e-3, 1e-3, 1e-3],
                }
            }
        )
        assert cfg.update_rate_hz == 100.0
        np.testing.assert_allclose(cfg.static_bias_accel, [0.1, 0.2, 0.3])
        assert cfg.dt == 0.01


class TestNpSlerp:
    def test_matches_so3_quat_slerp(self):
        from slamtpu.core import so3
        from slamtpu.ins.anpp import _np_slerp

        rng = np.random.default_rng(3)
        for _ in range(30):
            q0 = rng.normal(size=4); q0 /= np.linalg.norm(q0)
            q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
            t = float(rng.uniform())
            ref = np.asarray(so3.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(t)))
            got = _np_slerp(q0, q1, t)
            np.testing.assert_allclose(got, ref, atol=1e-9)
