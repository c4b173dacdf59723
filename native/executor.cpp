// Real-time MHPC execution engine (native runtime component).
//
// The reference copies the solved first-phase trajectory + feedback gains
// into execution buffers (ms_exec / CTG_exec, MHPCLocomotion.cpp:178-194)
// and leaves their consumption to the robot's 1 kHz control loop.  This
// module is that control loop's engine, implemented natively so it can run
// at real-time rates independent of Python/JAX:
//
//   - double-buffered plan storage with a per-slot SEQLOCK: the solver
//     thread publishes a new plan (x_nom, u_nom, K) with
//     mhpc_exec_publish(); the control thread picks it up wait-free at the
//     next tick boundary
//   - time-indexed affine feedback policy evaluation:
//       u(k, x) = u_nom[k] + K[k] (x - x_nom[k]),  clamped to torque limits
//   - binary trajectory logging into a preallocated ring
//
// Memory-ordering argument (single publisher, single consumer):
//   * Plan slots are preallocated at create() (max_steps capacity) and
//     NEVER reallocate, so a reader can never touch freed memory even if a
//     publish lands in the slot it is reading.
//   * Each slot carries an atomic sequence word: the publisher makes it odd
//     (release) before writing payload and even (release) after; `active`
//     is then store(release)d.  The reader load(acquire)s `active`, then
//     the slot seq; an odd value or a seq change across the read means a
//     torn snapshot -> retry with the other/updated slot.  The acquire
//     loads pair with the publisher's release stores, so a reader that
//     observes an even, unchanged seq observes the complete payload.
//   * The step cursor (`tick`) is owned exclusively by the control thread;
//     publish() communicates a plan switch through `seq`, and the control
//     thread resets its own cursor when it observes a new value
//     (last_seen_seq).  No cross-thread non-atomic writes remain.
//   * Torn reads of the payload while retrying are loads of doubles that
//     are concurrently memcpy'd; the seqlock discards such snapshots.
//
// Exposed as a C API (ctypes-friendly); see runtime/native_exec.py.
// Stress-tested with a concurrent publisher at tests/test_native_exec.py.
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct PlanSlot {
    std::atomic<uint32_t> seq{0};  // even = stable, odd = being written
    int n_steps = 0;
    std::vector<double> x_nom;  // max_steps * xs
    std::vector<double> u_nom;  // max_steps * us
    std::vector<double> K;      // max_steps * us * xs
};

struct Executor {
    PlanSlot plans[2];
    std::atomic<int> active{-1};     // index of the newest published slot
    std::atomic<uint64_t> seq{0};    // publish counter
    // control-thread-private state (never touched by the publisher):
    int tick = 0;
    uint64_t last_seen_seq = 0;
    double torque_limit = 33.0;      // reference: MHPCConstraints.cpp:49
    // trajectory log ring (control thread only)
    std::vector<double> log_buf;     // capacity * (xs + us)
    int log_cap = 0, log_len = 0, log_head = 0;
    int xs = 0, us = 0, max_steps = 0;
    // scratch for the reader's seqlock snapshot
    std::vector<double> snap_x, snap_u, snap_K;
};

}  // namespace

extern "C" {

void* mhpc_exec_create(int xs, int us, int log_capacity, int max_steps) {
    Executor* e = new Executor();
    e->xs = xs;
    e->us = us;
    e->max_steps = max_steps;
    for (int i = 0; i < 2; i++) {
        e->plans[i].x_nom.assign(static_cast<size_t>(max_steps) * xs, 0.0);
        e->plans[i].u_nom.assign(static_cast<size_t>(max_steps) * us, 0.0);
        e->plans[i].K.assign(static_cast<size_t>(max_steps) * us * xs, 0.0);
    }
    e->snap_x.assign(xs, 0.0);
    e->snap_u.assign(us, 0.0);
    e->snap_K.assign(static_cast<size_t>(us) * xs, 0.0);
    e->log_cap = log_capacity;
    e->log_buf.assign(static_cast<size_t>(log_capacity) * (xs + us), 0.0);
    return e;
}

void mhpc_exec_destroy(void* h) { delete static_cast<Executor*>(h); }

void mhpc_exec_set_torque_limit(void* h, double lim) {
    static_cast<Executor*>(h)->torque_limit = lim;
}

// Publish a new plan into the inactive buffer and flip (solver thread).
// Returns 0 on success, -1 if n_steps exceeds the preallocated capacity.
int mhpc_exec_publish(void* h, int n_steps,
                      const double* x_nom, const double* u_nom,
                      const double* K) {
    Executor* e = static_cast<Executor*>(h);
    if (n_steps > e->max_steps || n_steps <= 0) return -1;
    int cur = e->active.load(std::memory_order_relaxed);
    int idx = cur == 0 ? 1 : 0;  // first publish targets slot 0
    PlanSlot& p = e->plans[idx];
    // seqlock write: odd while mutating
    p.seq.fetch_add(1, std::memory_order_release);
    std::atomic_thread_fence(std::memory_order_release);
    p.n_steps = n_steps;
    std::memcpy(p.x_nom.data(), x_nom,
                sizeof(double) * static_cast<size_t>(n_steps) * e->xs);
    std::memcpy(p.u_nom.data(), u_nom,
                sizeof(double) * static_cast<size_t>(n_steps) * e->us);
    std::memcpy(p.K.data(), K,
                sizeof(double) * static_cast<size_t>(n_steps) * e->us * e->xs);
    std::atomic_thread_fence(std::memory_order_release);
    p.seq.fetch_add(1, std::memory_order_release);
    e->active.store(idx, std::memory_order_release);
    e->seq.fetch_add(1, std::memory_order_acq_rel);
    return 0;
}

uint64_t mhpc_exec_plan_seq(void* h) {
    return static_cast<Executor*>(h)->seq.load(std::memory_order_acquire);
}

// One control tick: evaluate the feedback policy at measured state x,
// write the torque command into u_out, log (x, u), advance the cursor.
// Returns the tick index used, or -1 if no plan has been published.
int mhpc_exec_tick(void* h, const double* x, double* u_out) {
    Executor* e = static_cast<Executor*>(h);
    // observe a plan switch -> restart the cursor (control thread owns it)
    uint64_t s = e->seq.load(std::memory_order_acquire);
    if (s != e->last_seen_seq) {
        e->last_seen_seq = s;
        e->tick = 0;
    }
    int k = -1;
    int n = 0;
    // seqlock read: retry until a consistent snapshot of row k is taken
    for (;;) {
        int a = e->active.load(std::memory_order_acquire);
        if (a < 0) return -1;
        PlanSlot& p = e->plans[a];
        uint32_t s1 = p.seq.load(std::memory_order_acquire);
        if (s1 & 1u) continue;  // mid-write, retry
        std::atomic_thread_fence(std::memory_order_acquire);
        n = p.n_steps;
        if (n <= 0) return -1;
        k = e->tick < n - 1 ? e->tick : n - 1;
        std::memcpy(e->snap_x.data(), &p.x_nom[static_cast<size_t>(k) * e->xs],
                    sizeof(double) * e->xs);
        std::memcpy(e->snap_u.data(), &p.u_nom[static_cast<size_t>(k) * e->us],
                    sizeof(double) * e->us);
        std::memcpy(e->snap_K.data(),
                    &p.K[static_cast<size_t>(k) * e->us * e->xs],
                    sizeof(double) * e->us * e->xs);
        std::atomic_thread_fence(std::memory_order_acquire);
        uint32_t s2 = p.seq.load(std::memory_order_acquire);
        if (s1 == s2 && a == e->active.load(std::memory_order_acquire)) break;
        // torn (publish landed in this slot mid-read): retry
    }
    for (int i = 0; i < e->us; i++) {
        double u = e->snap_u[i];
        for (int j = 0; j < e->xs; j++) {
            u += e->snap_K[static_cast<size_t>(i) * e->xs + j]
                 * (x[j] - e->snap_x[j]);
        }
        if (u > e->torque_limit) u = e->torque_limit;
        if (u < -e->torque_limit) u = -e->torque_limit;
        u_out[i] = u;
    }
    // log
    if (e->log_cap > 0) {
        double* slot =
            &e->log_buf[static_cast<size_t>(e->log_head) * (e->xs + e->us)];
        std::memcpy(slot, x, sizeof(double) * e->xs);
        std::memcpy(slot + e->xs, u_out, sizeof(double) * e->us);
        e->log_head = (e->log_head + 1) % e->log_cap;
        if (e->log_len < e->log_cap) e->log_len++;
    }
    if (e->tick < n - 1) e->tick++;  // hold at the plan's last row
    return k;
}

int mhpc_exec_log_len(void* h) { return static_cast<Executor*>(h)->log_len; }

// Copy out the trajectory log (oldest first); returns rows copied.
int mhpc_exec_read_log(void* h, double* out, int max_rows) {
    Executor* e = static_cast<Executor*>(h);
    int rows = e->log_len < max_rows ? e->log_len : max_rows;
    int w = e->xs + e->us;
    int start = (e->log_head - e->log_len + e->log_cap) % e->log_cap;
    for (int r = 0; r < rows; r++) {
        int src = (start + r) % e->log_cap;
        std::memcpy(out + static_cast<size_t>(r) * w,
                    &e->log_buf[static_cast<size_t>(src) * w],
                    sizeof(double) * w);
    }
    return rows;
}

}  // extern "C"
