// Native ANPP GNSS/INS packet decoder.
//
// C++ counterpart of slamtpu/ins/anpp.py (wire layouts per
// /root/reference/src/compcallback.cpp:159-403): packets 20/25/26/28/29 are
// decoded into a flat float64 field block + bitmask words per packet, which
// the Python NavFrame assembler consumes. One call decodes a batch of
// variable-length packets (offsets provided by the caller).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libanpp_decode.so anpp_decode.cpp

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

constexpr double kSecondsPerDay = 86400.0;

inline uint16_t le16(const uint8_t* p) {
    return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}
inline uint32_t le32(const uint8_t* p) {
    return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
           (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
inline float lef32(const uint8_t* p) {
    float v;
    std::memcpy(&v, p, 4);
    return v;
}
inline double lef64(const uint8_t* p) {
    double v;
    std::memcpy(&v, p, 8);
    return v;
}

}  // namespace

extern "C" {

// Field layout of the per-packet output block (fixed 40 doubles):
//   pid 20: [0]=t, [1..3]=lat,lon,alt, [4..6]=vel NED, [7..9]=accel,
//           [10]=gforce, [11..13]=rpy, [14..16]=gyro, [17..19]=sigma pos,
//           [20]=sys_status, [21]=filt_status
//   pid 25: [0..2]=sigma vel
//   pid 26: [0..2]=sigma rpy
//   pid 28: [0..11]=accel(3),gyro(3),mag(3),env(3)
//   pid 29: [0]=t, [1..3]=lla, [4..6]=vel, [7..9]=sigma pos,
//           [10..13]=tilt,heading,sigma_tilt,sigma_heading, [14]=status
// out_pid[i] = packet id (0 for rejected packets).
int anpp_decode_batch(
    const uint8_t* data, const int64_t* offsets, const int32_t* lengths,
    int64_t n_packets, int32_t* out_pid, double* out_fields /* n x 40 */) {
    for (int64_t i = 0; i < n_packets; ++i) {
        const uint8_t* pkt = data + offsets[i];
        const int32_t len = lengths[i];
        double* f = out_fields + i * 40;
        out_pid[i] = 0;
        if (len < 5) continue;
        const uint8_t pid = pkt[1];
        const uint8_t plen = pkt[2];
        if (pid == 20 && plen == 100 && len == 105) {
            const uint16_t sys_status = le16(pkt + 5);
            const uint16_t filt_status = le16(pkt + 7);
            const uint32_t secs = le32(pkt + 9);
            const uint32_t usecs = le32(pkt + 13);
            if (usecs > 999999) continue;
            f[0] = std::fmod(secs + usecs * 1e-6, kSecondsPerDay);
            f[1] = lef64(pkt + 17);
            f[2] = lef64(pkt + 25);
            f[3] = lef64(pkt + 33);
            for (int k = 0; k < 16; ++k) f[4 + k] = lef32(pkt + 41 + 4 * k);
            f[20] = sys_status;
            f[21] = filt_status;
            out_pid[i] = 20;
        } else if (pid == 25 && plen == 12 && len == 17) {
            for (int k = 0; k < 3; ++k) f[k] = lef32(pkt + 5 + 4 * k);
            out_pid[i] = 25;
        } else if (pid == 26 && plen == 12 && len == 17) {
            for (int k = 0; k < 3; ++k) f[k] = lef32(pkt + 5 + 4 * k);
            out_pid[i] = 26;
        } else if (pid == 28 && plen == 48 && len == 53) {
            for (int k = 0; k < 12; ++k) f[k] = lef32(pkt + 5 + 4 * k);
            out_pid[i] = 28;
        } else if (pid == 29 && plen == 74 && len == 79) {
            const uint32_t secs = le32(pkt + 5);
            const uint32_t usecs = le32(pkt + 9);
            if (usecs > 999999) continue;
            f[0] = std::fmod(secs + usecs * 1e-6, kSecondsPerDay);
            f[1] = lef64(pkt + 13);
            f[2] = lef64(pkt + 21);
            f[3] = lef64(pkt + 29);
            for (int k = 0; k < 10; ++k) f[4 + k] = lef32(pkt + 37 + 4 * k);
            f[14] = le16(pkt + 77);
            out_pid[i] = 29;
        }
    }
    return 0;
}

}  // extern "C"
