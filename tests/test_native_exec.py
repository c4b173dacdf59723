"""Native execution engine (native/executor.cpp) vs a numpy re-computation."""
import numpy as np

from mhpc_minimal_env_tpu.runtime.native_exec import NativeExecutor


def test_policy_evaluation_and_log():
    rng = np.random.default_rng(0)
    n, xs, us = 10, 14, 4
    x_nom = rng.normal(size=(n, xs))
    u_nom = rng.normal(size=(n, us))
    K = rng.normal(size=(n, us, xs)) * 0.1

    ex = NativeExecutor(xs, us, log_capacity=64)
    assert ex.tick(np.zeros(xs))[0] == -1  # no plan yet
    ex.publish(x_nom, u_nom, K)
    assert ex.plan_seq == 1

    xs_meas = x_nom + 0.01 * rng.normal(size=(n, xs))
    for k in range(n):
        kk, u = ex.tick(xs_meas[k])
        assert kk == k
        expect = u_nom[k] + K[k] @ (xs_meas[k] - x_nom[k])
        expect = np.clip(expect, -33, 33)
        assert np.abs(u - expect).max() < 1e-12

    # past the horizon: policy holds the last step
    kk, _ = ex.tick(xs_meas[-1])
    assert kk == n - 1

    log = ex.read_log()
    assert log.shape == (n + 1, xs + us)
    assert np.abs(log[0, :xs] - xs_meas[0]).max() < 1e-12


def test_torque_clamp_and_republish():
    ex = NativeExecutor(2, 1, log_capacity=8)
    ex.publish(np.zeros((3, 2)), np.full((3, 1), 100.0), np.zeros((3, 1, 2)))
    _, u = ex.tick(np.zeros(2))
    assert u[0] == 33.0
    ex.publish(np.zeros((3, 2)), np.zeros((3, 1)), np.zeros((3, 1, 2)))
    assert ex.plan_seq == 2
    k, u = ex.tick(np.zeros(2))
    assert k == 0 and u[0] == 0.0  # tick reset on republish


def test_concurrent_publish_tick_stress():
    """Two-thread stress: a publisher republishing at full rate while the
    control thread ticks.  The seqlock must deliver only consistent
    (x_nom, u_nom, K) rows: every published plan p encodes
    u_nom[k] = 1000*p + k with K = 0, so any torn snapshot would produce a
    u value that is not of that form."""
    import threading

    xs, us, n = 14, 4, 32
    ex = NativeExecutor(xs, us, log_capacity=16, max_steps=n)
    ex.set_torque_limit(1e12)  # disable the clamp: u encodes (plan, step)
    n_plans = 400
    stop = threading.Event()

    def publisher():
        for p in range(n_plans):
            u_nom = np.tile(
                (1000.0 * p + np.arange(n))[:, None], (1, us))
            ex.publish(np.zeros((n, xs)), u_nom, np.zeros((n, us, xs)))
        stop.set()

    errors = []

    def controller():
        x = np.zeros(xs)
        while not stop.is_set() or True:
            k, u = ex.tick(x)
            if k >= 0:
                # u must equal 1000*p + k' for integers p < n_plans, k' < n
                val = u[0]
                p = round(val // 1000)
                kk = val - 1000 * p
                if not (0 <= p < n_plans and 0 <= kk < n
                        and abs(kk - round(kk)) < 1e-9
                        and np.all(u == u[0])):
                    errors.append(float(val))
                    break
            if stop.is_set():
                break

    t_pub = threading.Thread(target=publisher)
    t_ctl = threading.Thread(target=controller)
    t_ctl.start(); t_pub.start()
    t_pub.join(timeout=60); t_ctl.join(timeout=60)
    assert not t_pub.is_alive() and not t_ctl.is_alive()
    assert not errors, f"torn snapshots observed: {errors[:5]}"
    assert ex.plan_seq == n_plans


def test_publish_capacity_guard():
    ex = NativeExecutor(2, 1, log_capacity=4, max_steps=4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ex.publish(np.zeros((8, 2)), np.zeros((8, 1)), np.zeros((8, 1, 2)))
