// Real-time MHPC execution engine (native runtime component).
//
// The reference copies the solved first-phase trajectory + feedback gains
// into execution buffers (ms_exec / CTG_exec, MHPCLocomotion.cpp:178-194)
// and leaves their consumption to the robot's 1 kHz control loop.  This
// module is that control loop's engine, implemented natively so it can run
// at real-time rates independent of Python/JAX:
//
//   - double-buffered plan storage: the solver thread publishes a new plan
//     (x_nom, u_nom, K) with mhpc_exec_publish(); the control thread picks
//     it up lock-free at the next tick boundary
//   - time-indexed affine feedback policy evaluation:
//       u(k, x) = u_nom[k] + K[k] (x - x_nom[k]),  clamped to torque limits
//   - binary trajectory logging into a preallocated ring
//
// Exposed as a C API (ctypes-friendly); see runtime/native_exec.py.
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Plan {
    int n_steps = 0;
    int xs = 0, us = 0;
    std::vector<double> x_nom;  // n_steps * xs
    std::vector<double> u_nom;  // n_steps * us
    std::vector<double> K;      // n_steps * us * xs
};

struct Executor {
    Plan plans[2];
    std::atomic<int> active{0};      // index of the plan the control loop reads
    std::atomic<uint64_t> seq{0};    // publish counter
    int tick = 0;                    // current step within the active plan
    double torque_limit = 33.0;      // reference: MHPCConstraints.cpp:49
    // trajectory log ring
    std::vector<double> log_buf;     // capacity * (xs + us)
    int log_cap = 0, log_len = 0, log_head = 0;
    int xs = 0, us = 0;
};

}  // namespace

extern "C" {

void* mhpc_exec_create(int xs, int us, int log_capacity) {
    Executor* e = new Executor();
    e->xs = xs;
    e->us = us;
    e->log_cap = log_capacity;
    e->log_buf.assign(static_cast<size_t>(log_capacity) * (xs + us), 0.0);
    return e;
}

void mhpc_exec_destroy(void* h) { delete static_cast<Executor*>(h); }

void mhpc_exec_set_torque_limit(void* h, double lim) {
    static_cast<Executor*>(h)->torque_limit = lim;
}

// Publish a new plan into the inactive buffer and flip (solver thread).
void mhpc_exec_publish(void* h, int n_steps,
                       const double* x_nom, const double* u_nom,
                       const double* K) {
    Executor* e = static_cast<Executor*>(h);
    int idx = 1 - e->active.load(std::memory_order_acquire);
    Plan& p = e->plans[idx];
    p.n_steps = n_steps;
    p.xs = e->xs;
    p.us = e->us;
    p.x_nom.assign(x_nom, x_nom + static_cast<size_t>(n_steps) * e->xs);
    p.u_nom.assign(u_nom, u_nom + static_cast<size_t>(n_steps) * e->us);
    p.K.assign(K, K + static_cast<size_t>(n_steps) * e->us * e->xs);
    e->active.store(idx, std::memory_order_release);
    e->seq.fetch_add(1, std::memory_order_acq_rel);
    e->tick = 0;
}

uint64_t mhpc_exec_plan_seq(void* h) {
    return static_cast<Executor*>(h)->seq.load(std::memory_order_acquire);
}

// One control tick: evaluate the feedback policy at measured state x,
// write the torque command into u_out, log (x, u), advance the tick.
// Returns the tick index used, or -1 if no plan has been published.
int mhpc_exec_tick(void* h, const double* x, double* u_out) {
    Executor* e = static_cast<Executor*>(h);
    const Plan& p = e->plans[e->active.load(std::memory_order_acquire)];
    if (p.n_steps == 0) return -1;
    int k = e->tick < p.n_steps - 1 ? e->tick : p.n_steps - 1;
    const double* xn = &p.x_nom[static_cast<size_t>(k) * p.xs];
    const double* un = &p.u_nom[static_cast<size_t>(k) * p.us];
    const double* Kk = &p.K[static_cast<size_t>(k) * p.us * p.xs];
    for (int i = 0; i < p.us; i++) {
        double u = un[i];
        for (int j = 0; j < p.xs; j++) {
            u += Kk[i * p.xs + j] * (x[j] - xn[j]);
        }
        if (u > e->torque_limit) u = e->torque_limit;
        if (u < -e->torque_limit) u = -e->torque_limit;
        u_out[i] = u;
    }
    // log
    if (e->log_cap > 0) {
        double* slot = &e->log_buf[static_cast<size_t>(e->log_head) * (e->xs + e->us)];
        std::memcpy(slot, x, sizeof(double) * e->xs);
        std::memcpy(slot + e->xs, u_out, sizeof(double) * e->us);
        e->log_head = (e->log_head + 1) % e->log_cap;
        if (e->log_len < e->log_cap) e->log_len++;
    }
    if (e->tick < p.n_steps - 1) e->tick++;
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
