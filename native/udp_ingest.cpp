// Native UDP ingest: a C++ receiver thread + bounded datagram ring.
//
// The reference's transport layer is a C++ Boost.Asio socket
// (/root/reference/include/udpsocket.hpp): async receive re-armed per
// datagram, receive deadline, configurable buffer. This is the slamtpu
// native analog for the live pipeline's high-rate LiDAR stream (1280
// packets/s x 24832 B): a plain POSIX socket serviced by a dedicated
// thread, datagrams landing in a fixed-capacity ring that Python drains in
// batches through ctypes (one GIL-bound call per batch, not per packet).
// Overflow drops the oldest pending datagram and counts it — the same
// bounded-queue softening as runtime/live.py's frame queue.
//
// C ABI (ctypes):
//   handle = udp_ingest_start(host, port, rcvbuf, max_packet, ring)
//   n      = udp_ingest_poll(handle, out, lengths, max_msgs)
//   ms     = udp_ingest_silent_ms(handle)   (receive-timeout watchdog input)
//   drops  = udp_ingest_dropped(handle)
//            udp_ingest_stop(handle)
#include <arpa/inet.h>
#include <netinet/in.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct Ingest {
    int fd = -1;
    int max_packet = 0;
    int ring_capacity = 0;
    std::vector<uint8_t> slots;   // ring_capacity * max_packet
    std::vector<int> lengths;     // ring_capacity
    // ring indices: [tail, head) are pending datagrams
    size_t head = 0, tail = 0;
    std::mutex mu;
    std::atomic<uint64_t> dropped{0};
    std::atomic<int64_t> last_rx_ms{0};
    std::atomic<bool> stop{false};
    std::thread rx;

    int64_t now_ms() const {
        return std::chrono::duration_cast<std::chrono::milliseconds>(
                   Clock::now().time_since_epoch())
            .count();
    }

    void run() {
        std::vector<uint8_t> buf(max_packet);
        while (!stop.load(std::memory_order_relaxed)) {
            struct pollfd pfd = {fd, POLLIN, 0};
            int pr = ::poll(&pfd, 1, 50);  // 50 ms tick: stop + watchdog
            if (pr <= 0 || !(pfd.revents & POLLIN)) continue;
            ssize_t n = ::recv(fd, buf.data(), max_packet, 0);
            if (n <= 0) continue;
            last_rx_ms.store(now_ms(), std::memory_order_relaxed);
            std::lock_guard<std::mutex> lock(mu);
            if (head - tail == static_cast<size_t>(ring_capacity)) {
                ++tail;  // drop the oldest pending datagram
                dropped.fetch_add(1, std::memory_order_relaxed);
            }
            size_t slot = head % ring_capacity;
            std::memcpy(&slots[slot * max_packet], buf.data(), n);
            lengths[slot] = static_cast<int>(n);
            ++head;
        }
    }
};

}  // namespace

extern "C" {

void* udp_ingest_start(const char* host, int port, int rcvbuf, int max_packet,
                       int ring_capacity) {
    auto* ing = new Ingest();
    ing->max_packet = max_packet;
    ing->ring_capacity = ring_capacity;
    ing->slots.resize(static_cast<size_t>(ring_capacity) * max_packet);
    ing->lengths.resize(ring_capacity);
    ing->fd = ::socket(AF_INET, SOCK_DGRAM, 0);
    if (ing->fd < 0) {
        delete ing;
        return nullptr;
    }
    int one = 1;
    ::setsockopt(ing->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    if (rcvbuf > 0)
        ::setsockopt(ing->fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
        ::close(ing->fd);
        delete ing;
        return nullptr;
    }
    if (::bind(ing->fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
        ::close(ing->fd);
        delete ing;
        return nullptr;
    }
    ing->last_rx_ms.store(ing->now_ms(), std::memory_order_relaxed);
    ing->rx = std::thread([ing] { ing->run(); });
    return ing;
}

// Copy up to max_msgs pending datagrams into `out` (packed back-to-back at
// max_packet stride) and their byte lengths into `lengths`. Returns the
// number of datagrams copied.
int udp_ingest_poll(void* handle, uint8_t* out, int* lengths, int max_msgs) {
    auto* ing = static_cast<Ingest*>(handle);
    std::lock_guard<std::mutex> lock(ing->mu);
    int n = 0;
    while (ing->tail != ing->head && n < max_msgs) {
        size_t slot = ing->tail % ing->ring_capacity;
        int len = ing->lengths[slot];
        std::memcpy(out + static_cast<size_t>(n) * ing->max_packet,
                    &ing->slots[slot * ing->max_packet], len);
        lengths[n] = len;
        ++ing->tail;
        ++n;
    }
    return n;
}

int64_t udp_ingest_silent_ms(void* handle) {
    auto* ing = static_cast<Ingest*>(handle);
    return ing->now_ms() - ing->last_rx_ms.load(std::memory_order_relaxed);
}

uint64_t udp_ingest_dropped(void* handle) {
    return static_cast<Ingest*>(handle)->dropped.load(std::memory_order_relaxed);
}

void udp_ingest_stop(void* handle) {
    auto* ing = static_cast<Ingest*>(handle);
    ing->stop.store(true);
    if (ing->rx.joinable()) ing->rx.join();
    if (ing->fd >= 0) ::close(ing->fd);
    delete ing;
}

}  // extern "C"
