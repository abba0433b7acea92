// Lock-free single-writer multi-reader broadcast ring buffer in POSIX
// shared memory. Host-side transport for scheduler->worker broadcast on
// multi-process / multi-host-agent deployments — the native analog of
// the reference's shm MessageQueue (vllm/distributed/device_communicators/
// shm_broadcast.py:44,177: single writer + per-reader cursors + spin
// with sched_yield) rebuilt in C++.
//
// Memory layout:
//   Header { u64 capacity; u64 slot_size; u64 n_readers;
//            atomic<u64> head;                    // next seq to write
//            atomic<u64> tails[MAX_READERS]; }    // next seq to read
//   Slot i stream: [atomic<u64> seq][u32 len][payload bytes]
//
// Writer: waits until slowest tail > head - capacity (ring not full for
// every reader), writes payload, then publishes by storing seq+1 into
// the slot's seq word (release). Readers: spin (with sched_yield) on
// slot seq == want+1 (acquire), copy payload, bump their tail.
//
// Memory-ordering assumptions documented per SURVEY §5.2: the only
// synchronization words are the slot seq (release/acquire pairs the
// payload copy) and head/tails (relaxed monotonic counters, each
// written by exactly one thread).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <sched.h>

namespace {

constexpr uint64_t MAX_READERS = 64;

struct Header {
    uint64_t capacity;   // number of slots (power of two not required)
    uint64_t slot_size;  // payload bytes per slot
    uint64_t n_readers;
    std::atomic<uint64_t> head;
    std::atomic<uint64_t> tails[MAX_READERS];
};

struct Slot {
    std::atomic<uint64_t> seq;
    uint32_t len;
    // payload follows
};

inline Slot* slot_at(uint8_t* base, uint64_t idx) {
    Header* h = reinterpret_cast<Header*>(base);
    uint8_t* slots = base + sizeof(Header);
    uint64_t stride = sizeof(Slot) + h->slot_size;
    return reinterpret_cast<Slot*>(slots + (idx % h->capacity) * stride);
}

}  // namespace

extern "C" {

uint64_t shm_ring_bytes(uint64_t capacity, uint64_t slot_size) {
    return sizeof(Header) + capacity * (sizeof(Slot) + slot_size);
}

void shm_ring_init(uint8_t* base, uint64_t capacity, uint64_t slot_size,
                   uint64_t n_readers) {
    Header* h = reinterpret_cast<Header*>(base);
    h->capacity = capacity;
    h->slot_size = slot_size;
    h->n_readers = n_readers;
    h->head.store(0, std::memory_order_relaxed);
    for (uint64_t i = 0; i < MAX_READERS; i++)
        h->tails[i].store(0, std::memory_order_relaxed);
    for (uint64_t i = 0; i < capacity; i++)
        slot_at(base, i)->seq.store(0, std::memory_order_relaxed);
}

// Returns 0 on success, -1 if payload too large, -2 on timeout
// (spin_limit yields exhausted while the ring is full).
int shm_ring_write(uint8_t* base, const uint8_t* data, uint64_t len,
                   uint64_t spin_limit) {
    Header* h = reinterpret_cast<Header*>(base);
    if (len > h->slot_size) return -1;
    uint64_t head = h->head.load(std::memory_order_relaxed);
    // wait until every reader has consumed seq head - capacity
    for (uint64_t spins = 0;; spins++) {
        uint64_t min_tail = UINT64_MAX;
        for (uint64_t r = 0; r < h->n_readers; r++) {
            uint64_t t = h->tails[r].load(std::memory_order_acquire);
            if (t < min_tail) min_tail = t;
        }
        if (h->n_readers == 0 || head < min_tail + h->capacity) break;
        if (spins >= spin_limit) return -2;
        sched_yield();
    }
    Slot* s = slot_at(base, head);
    s->len = static_cast<uint32_t>(len);
    std::memcpy(reinterpret_cast<uint8_t*>(s) + sizeof(Slot), data, len);
    s->seq.store(head + 1, std::memory_order_release);  // publish
    h->head.store(head + 1, std::memory_order_release);
    return 0;
}

// Returns payload length, or -2 on timeout, -3 reader overran (lapped).
long shm_ring_read(uint8_t* base, uint64_t reader_id, uint8_t* out,
                   uint64_t out_cap, uint64_t spin_limit) {
    Header* h = reinterpret_cast<Header*>(base);
    uint64_t want = h->tails[reader_id].load(std::memory_order_relaxed);
    Slot* s = slot_at(base, want);
    for (uint64_t spins = 0;; spins++) {
        uint64_t seq = s->seq.load(std::memory_order_acquire);
        if (seq == want + 1) break;
        if (seq > want + 1) return -3;  // writer lapped this reader
        if (spins >= spin_limit) return -2;
        sched_yield();
    }
    uint32_t len = s->len;
    if (len > out_cap) return -1;
    std::memcpy(out, reinterpret_cast<uint8_t*>(s) + sizeof(Slot), len);
    // re-check the slot was not overwritten mid-copy (writer laps only
    // after tails advance, so this cannot happen unless misused)
    h->tails[reader_id].store(want + 1, std::memory_order_release);
    return static_cast<long>(len);
}

}  // extern "C"
