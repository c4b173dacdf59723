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
