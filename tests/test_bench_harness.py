"""The bench.py measurement harness is load-bearing (the driver's
scoreboard): validate the two-length dispatch-overhead extrapolation and
the min-over-draws compile-nondeterminism guard with synthetic timings.
"""

import numpy as np

import bench


class _FakeClock:
    """Deterministic wall clock driven by a queue of durations."""

    def __init__(self):
        self.t = 0.0
        self.durations = []

    def time(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def _make_fake_loop(T_ms, B_ms, clock):
    """loop_fn whose fenced run takes B + n*T (the t(N) = T + B/N model)."""

    def make_loop(draw):
        def loop_fn(n):
            # n arrives as a jnp scalar; fall back to int()
            n_int = int(n)
            clock.advance((B_ms + n_int * T_ms) / 1000.0)
            return np.zeros(1, np.float32)

        return loop_fn, ()

    return make_loop


def test_extrapolation_recovers_T(monkeypatch):
    clock = _FakeClock()
    monkeypatch.setattr(bench.time, "time", clock.time)
    monkeypatch.setattr(bench, "fence", lambda x: 0.0)
    import jax.numpy as jnp
    monkeypatch.setattr(jnp, "asarray", lambda v, *a, **k: v)

    T, B = 70.0, 2700.0          # backbone-like: B >> T
    got = bench.min_over_draws(_make_fake_loop(T, B, clock), "fake", 16, 128)
    assert abs(got - T) < 1e-6   # exact under the model


def test_min_over_draws_survives_bad_binaries(monkeypatch):
    """A 10-80x slower compile draw (the axon service's failure mode) must
    not poison the result as long as two good draws agree."""
    clock = _FakeClock()
    monkeypatch.setattr(bench.time, "time", clock.time)
    monkeypatch.setattr(bench, "fence", lambda x: 0.0)
    import jax.numpy as jnp
    monkeypatch.setattr(jnp, "asarray", lambda v, *a, **k: v)

    per_draw_T = [70.0, 2100.0, 71.0]   # draw 1 got a bad binary

    def make_loop(draw):
        T = per_draw_T[draw]

        def loop_fn(n):
            clock.advance((2700.0 + int(n) * T) / 1000.0)
            return np.zeros(1, np.float32)

        return loop_fn, ()

    got = bench.min_over_draws(make_loop, "fake", 16, 128)
    assert abs(got - 70.0) < 1e-6


def test_clamps_to_upper_bound_when_overhead_inverts(monkeypatch):
    """If t(n1) <= t(n2) (B drifted negative between lengths), the fit is
    meaningless; the harness must fall back to the conservative t(n2)."""
    clock = _FakeClock()
    monkeypatch.setattr(bench.time, "time", clock.time)
    monkeypatch.setattr(bench, "fence", lambda x: 0.0)
    import jax.numpy as jnp
    monkeypatch.setattr(jnp, "asarray", lambda v, *a, **k: v)

    def make_loop(draw):
        def loop_fn(n):
            clock.advance(int(n) * 0.080)   # pure 80 ms/iter, zero B
            return np.zeros(1, np.float32)

        return loop_fn, ()

    got = bench.min_over_draws(make_loop, "fake", 16, 128)
    assert abs(got - 80.0) < 1e-6
