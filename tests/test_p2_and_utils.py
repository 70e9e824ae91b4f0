"""P2 online quantile estimator, dual averaging, masked quantile, and
schedule-table tests.

The P2 oracle is a direct NumPy transliteration of the published Jain
& Chlamtac (1985) algorithm (same algorithm as the reference's
``WALNUTSpy/P2quantile.py:16-92``), written independently here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.utils.p2 import p2_init, p2_push, p2_quantile
from walnuts_tpu.utils.dual_average import da_init, da_observe, da_par
from walnuts_tpu.sampler.driver import masked_quantile
from walnuts_tpu.sampler.plans import build_schedule, subtree_checks


class P2Oracle:
    """Sequential scalar P^2 estimator (Jain & Chlamtac 1985)."""

    def __init__(self, p):
        self.p = p
        self.n_obs = 0
        self.q = np.zeros(5)
        self.n = np.arange(1, 6, dtype=float)
        self.buf = []

    def push(self, x):
        self.n_obs += 1
        if self.n_obs <= 5:
            self.buf.append(x)
            if self.n_obs == 5:
                self.q = np.sort(np.array(self.buf))
            return
        q, n, p = self.q, self.n, self.p
        if x < q[0]:
            q[0] = x
            k = 0
        elif x >= q[4]:
            q[4] = x
            k = 3
        else:
            k = 0
            for i in range(4):
                if q[i] <= x < q[i + 1]:
                    k = i
                    break
        for i in range(k + 1, 5):
            n[i] += 1
        npp = np.array([
            1.0,
            0.5 * (self.n_obs - 1) * p + 1.0,
            (self.n_obs - 1) * p + 1.0,
            (self.n_obs - 1) * (1.0 + p) / 2.0 + 1.0,
            float(self.n_obs),
        ])
        for i in range(1, 4):
            d = npp[i] - n[i]
            if (d >= 1.0 and n[i + 1] - n[i] > 1.0) or (
                d <= -1.0 and n[i - 1] - n[i] < -1.0
            ):
                d = np.sign(d)
                q_para = q[i] + (d / (n[i + 1] - n[i - 1])) * (
                    (n[i] - n[i - 1] + d) * (q[i + 1] - q[i]) / (n[i + 1] - n[i])
                    + (n[i + 1] - n[i] - d) * (q[i] - q[i - 1]) / (n[i] - n[i - 1])
                )
                if q[i - 1] < q_para < q[i + 1]:
                    q[i] = q_para
                else:
                    j = i + int(d)
                    q[i] = q[i] + d * (q[j] - q[i]) / (n[j] - n[i])
                n[i] += d

    def quantile(self):
        return self.q[2]


@pytest.mark.parametrize("prob", [0.2, 0.5, 0.9])
def test_p2_matches_sequential_oracle(prob):
    rng = np.random.default_rng(7)
    xs = rng.normal(size=300)
    st = p2_init(prob, (1,), jnp.float64)
    oracle = P2Oracle(prob)
    push = jax.jit(p2_push)
    for x in xs:
        st = push(st, jnp.asarray([x], jnp.float64))
        oracle.push(x)
    np.testing.assert_allclose(
        float(p2_quantile(st)[0]), oracle.quantile(), rtol=1e-10
    )


def test_p2_converges_to_true_quantile():
    rng = np.random.default_rng(3)
    xs = rng.normal(size=20000)
    st = p2_init(0.8, (), jnp.float64)
    push = jax.jit(p2_push)
    for chunk in np.split(xs, 100):
        for x in chunk:
            st = push(st, jnp.asarray(x, jnp.float64))
    est = float(p2_quantile(st))
    true = np.quantile(rng.normal(size=200000), 0.8)
    assert abs(est - true) < 0.05


def test_p2_mask_freezes_state():
    st = p2_init(0.5, (2,), jnp.float64)
    st2 = p2_push(st, jnp.asarray([1.0, 2.0]),
                  mask=jnp.asarray([True, False]))
    assert int(st2.npush[0]) == 1
    assert int(st2.npush[1]) == 0


def test_masked_quantile_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 50))
    for n in [1, 2, 11, 50]:
        got = np.asarray(
            masked_quantile(jnp.asarray(x), jnp.asarray(n), 0.9)
        )
        want = np.quantile(x[:, :n], 0.9, axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dual_average_drives_toward_target():
    """Feeding observations from a monotone response should converge the
    parameter to where response == target (reference semantics:
    ``isokinetic/dualAverage.py:6-34``)."""
    st = da_init(1.0, 0.5, (), jnp.float64)

    # response decreases in the parameter (like accept-rate vs step
    # size): draw = 1/(1+par); target 0.5 -> par* = 1
    @jax.jit
    def step(s):
        return da_observe(s, 1.0 / (1.0 + da_par(s)))

    for _ in range(300):
        st = step(st)
    final = float(da_par(st))
    assert abs(1.0 / (1.0 + final) - 0.5) < 0.05


# ---------------------------------------------------------------------------
def test_subtree_checks_structure():
    # 4-leaf plan: pairs then merged span, ordered like a recursive build
    assert subtree_checks(4) == [(1, 2), (3, 4), (1, 4)]
    assert subtree_checks(8) == [
        (1, 2), (3, 4), (1, 4), (5, 6), (7, 8), (5, 8), (1, 8)
    ]


@pytest.mark.parametrize("m", [1, 2, 3, 5, 8, 10])
def test_schedule_invariants(m):
    s = build_schedule(m)
    assert s.n_steps == 2 ** (m - 1)
    # depth-0 step first, depths non-decreasing
    assert s.depth[0] == 0
    assert np.all(np.diff(s.depth) >= 0)
    # each depth d >= 1 contributes 2^(d-1) pair steps
    for d in range(1, m):
        assert np.sum(s.depth == d) == 2 ** (d - 1)
    # exactly one last_of_depth per depth
    assert np.sum(s.last_of_depth) == m
    # every pair integrates adjacent relative ids
    pair = s.depth > 0
    assert np.all(s.rel2[pair] == s.rel1[pair] + 1)
    # slots stay within capacity
    assert s.slot1.max() < s.capacity
    assert s.slot2.max() < s.capacity
    assert s.post_slot_lo.max() < s.capacity
    # capacity stays logarithmic in orbit size (the stateStore trick,
    # reference WALNUTSpy/WALNUTS.py:48-88 capacity 2(M+1)+1)
    assert s.capacity <= 2 * (m + 1) + 1
