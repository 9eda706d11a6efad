"""Linalg unit tests, mirroring GPy/GPy/testing/linalg_test.py (jitchol jitter semantics,
trace_dot) plus pad-masking and cholupdate correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_optimization_tpu.ops import linalg


def _random_pd(rng, n, eps=1e-3):
    A = rng.standard_normal((n, n))
    return A @ A.T + eps * np.eye(n)


def test_jitchol_pd_no_jitter(rng):
    A = _random_pd(rng, 32)
    L, jitter, ok = linalg.jitchol(jnp.asarray(A))
    assert bool(ok)
    assert float(jitter) == 0.0
    np.testing.assert_allclose(np.asarray(L @ L.T), A, rtol=1e-8, atol=1e-8)


def test_jitchol_adds_expected_jitter(rng):
    # Rank-deficient: needs jitter. GPy adds mean(diag)*1e-6 * 10^k (linalg_test.py:5-20).
    U = rng.standard_normal((40, 10))
    A = U @ U.T  # PSD, rank 10
    L, jitter, ok = linalg.jitchol(jnp.asarray(A))
    assert bool(ok)
    j = float(jitter)
    base = float(np.mean(np.diag(A))) * 1e-6
    assert j > 0
    # jitter must be one of base * 10^k for k in 0..4
    ratios = j / (base * 10.0 ** np.arange(5))
    assert np.any(np.abs(ratios - 1.0) < 1e-10)
    np.testing.assert_allclose(np.asarray(L @ L.T), A + j * np.eye(40), rtol=1e-7, atol=1e-7)


def test_jitchol_fails_gracefully():
    A = -jnp.eye(8)
    _, _, ok = linalg.jitchol(A)
    assert not bool(ok)


def test_jitchol_under_jit_and_vmap(rng):
    As = jnp.asarray(np.stack([_random_pd(rng, 16) for _ in range(4)]))
    f = jax.jit(jax.vmap(lambda A: linalg.jitchol(A)[0]))
    Ls = f(As)
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(Ls, jnp.swapaxes(Ls, -1, -2))), np.asarray(As), rtol=1e-8, atol=1e-8
    )


def test_solves_and_pdinv(rng):
    A = _random_pd(rng, 24)
    B = rng.standard_normal((24, 3))
    L, _, _ = linalg.jitchol(jnp.asarray(A))
    x = linalg.cho_solve(L, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(A @ x), B, rtol=1e-7, atol=1e-7)

    Ai, L2, Li, logdet = linalg.pdinv(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(Ai), np.linalg.inv(A), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(logdet), np.linalg.slogdet(A)[1], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Li @ np.asarray(L2)), np.eye(24), atol=1e-7)

    Ai2 = linalg.dpotri(L)
    np.testing.assert_allclose(np.asarray(Ai2), np.linalg.inv(A), rtol=1e-6, atol=1e-6)


def test_tdot_trace_dot_symmetrify(rng):
    X = rng.standard_normal((10, 5))
    np.testing.assert_allclose(np.asarray(linalg.tdot(jnp.asarray(X))), X @ X.T, rtol=1e-10)
    A = rng.standard_normal((7, 7))
    B = rng.standard_normal((7, 7))
    np.testing.assert_allclose(
        float(linalg.trace_dot(jnp.asarray(A), jnp.asarray(B))), np.trace(A @ B), rtol=1e-10
    )
    S = linalg.symmetrify(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(S), np.asarray(S).T)
    np.testing.assert_allclose(np.tril(np.asarray(S)), np.tril(A))


def test_backsub_both_sides(rng):
    A = _random_pd(rng, 12)
    X = rng.standard_normal((12, 12))
    L = np.linalg.cholesky(A)
    out = linalg.backsub_both_sides(jnp.asarray(L), jnp.asarray(X), "left")
    expected = np.linalg.solve(L.T, np.linalg.solve(L.T, X.T).T)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-8, atol=1e-8)
    out_r = linalg.backsub_both_sides(jnp.asarray(L), jnp.asarray(X), "right")
    expected_r = np.linalg.solve(L, np.linalg.solve(L, X.T).T)
    np.testing.assert_allclose(np.asarray(out_r), expected_r, rtol=1e-8, atol=1e-8)


def test_cholupdate(rng):
    A = _random_pd(rng, 15)
    x = rng.standard_normal(15)
    L = np.linalg.cholesky(A)
    L_up = linalg.cholupdate(jnp.asarray(L), jnp.asarray(x))
    expected = np.linalg.cholesky(A + np.outer(x, x))
    np.testing.assert_allclose(np.asarray(L_up), expected, rtol=1e-8, atol=1e-8)


def test_masked_gram_padding(rng):
    n_real, n_pad = 10, 16
    A = _random_pd(rng, n_real)
    K = np.zeros((n_pad, n_pad))
    K[:n_real, :n_real] = A
    mask = jnp.asarray(np.arange(n_pad) < n_real, dtype=jnp.float64)
    Km = linalg.masked_gram(jnp.asarray(K), mask)
    L, jitter, ok = linalg.jitchol(Km)
    assert bool(ok) and float(jitter) == 0.0
    # logdet of padded == logdet of real block
    np.testing.assert_allclose(
        float(linalg.logdet_from_chol(L)), np.linalg.slogdet(A)[1], rtol=1e-8
    )


@pytest.mark.parametrize("n", [7, 64, 300, 515])
def test_tri_inv_lower_matches_solve(rng, n):
    # D&C blocked inverse == dense triangular solve vs identity, incl. padding
    # paths (n not a multiple of the block) and a small block to force merges
    A = _random_pd(rng, n)
    L = jnp.asarray(np.linalg.cholesky(A))
    Li = linalg.tri_inv_lower(L, block=64)
    expected = np.linalg.inv(np.asarray(L))
    np.testing.assert_allclose(np.asarray(Li), expected, rtol=1e-7, atol=1e-8)
    # strictly lower-triangular result
    assert np.allclose(np.triu(np.asarray(Li), 1), 0.0)


def test_tri_inv_lower_batched(rng):
    Ls = jnp.asarray(np.stack([np.linalg.cholesky(_random_pd(rng, 100))
                               for _ in range(3)]))
    Li = jax.vmap(lambda L: linalg.tri_inv_lower(L, block=32))(Ls)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(Li[b]),
                                   np.linalg.inv(np.asarray(Ls[b])),
                                   rtol=1e-7, atol=1e-8)


def test_jitchol_batched_per_lane_ladder(rng):
    """Batched (stacked) jitchol: per-lane jitter ladders — a non-PD lane
    escalates its own jitter without perturbing PD lanes (round-2 review: the
    old broadcast applied a (B,) jitter as a per-column pattern, or crashed)."""
    good = _random_pd(rng, 8)
    bad = np.eye(8)
    bad[0, 0] = -1.0  # genuinely non-PD; ladder must rescue it
    A = jnp.asarray(np.stack([good, bad]))
    L, jitter, ok = linalg.jitchol(A)
    assert L.shape == (2, 8, 8) and jitter.shape == (2,) and ok.shape == (2,)
    # PD lane: untouched, zero jitter, exact factor
    assert float(jitter[0]) == 0.0 and bool(ok[0])
    np.testing.assert_allclose(np.asarray(L[0]), np.linalg.cholesky(good),
                               rtol=1e-10)
    # non-PD lane: positive jitter was applied and the factor is finite
    assert float(jitter[1]) > 0.0
    assert np.all(np.isfinite(np.asarray(L[1]))) == bool(ok[1])


@pytest.mark.parametrize("n", [64, 600, 1100])
def test_blocked_cholesky_matches_numpy(rng, n):
    """blocked_cholesky (the batched panel factorization jitchol routes through
    for large N) vs numpy's LAPACK, batched and unbatched, ragged final panel."""
    import numpy.linalg as npl

    B = 3
    A0 = rng.standard_normal((B, n, 8))
    A = A0 @ np.swapaxes(A0, 1, 2) + n * np.eye(n)
    L = linalg.blocked_cholesky(jnp.asarray(A), nb=256)
    Lnp = npl.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), Lnp, rtol=2e-8, atol=2e-8 * n)
    # unbatched path
    L1 = linalg.blocked_cholesky(jnp.asarray(A[0]), nb=256)
    np.testing.assert_allclose(np.asarray(L1), Lnp[0], rtol=2e-8, atol=2e-8 * n)
    # non-PD input must produce NaNs (the jitter ladder's failure signal)
    bad = jnp.asarray(A[0] - 2 * n * np.eye(n))
    assert not bool(jnp.all(jnp.isfinite(linalg.blocked_cholesky(bad, nb=256))))


@pytest.mark.parametrize("n", [50, 700, 1200])
def test_tri_tdot_matches_dense(rng, n):
    """tri_tdot (lauum-blocked Li^T Li) vs the dense matmul, batched and
    unbatched; output must be exactly symmetric."""
    L = np.tril(rng.standard_normal((2, n, n))) + n * np.eye(n)
    Li = np.stack([np.linalg.inv(L[i]) for i in range(2)])
    W = linalg.tri_tdot(jnp.asarray(Li), nb=512)
    ref = np.swapaxes(Li, 1, 2) @ Li
    np.testing.assert_allclose(np.asarray(W), ref, rtol=1e-9, atol=1e-12)
    assert np.array_equal(np.asarray(W), np.swapaxes(np.asarray(W), 1, 2))
    W1 = linalg.tri_tdot(jnp.asarray(Li[0]), nb=512)
    np.testing.assert_allclose(np.asarray(W1), ref[0], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("n", [64, 600, 1100])
def test_blocked_solve_lower_matches_xla(rng, n):
    """blocked_solve_lower (the panel forward substitution the exact-GP LML
    forward routes its 1-rhs solve through) vs XLA's triangular_solve, batched
    and unbatched, ragged final panel, 1 and several RHS columns."""
    B = 3
    L = np.tril(rng.standard_normal((B, n, n))) + n * np.eye(n)
    for k in (1, 3):
        rhs = rng.standard_normal((B, n, k))
        x = linalg.blocked_solve_lower(jnp.asarray(L), jnp.asarray(rhs), nb=256)
        ref = linalg.solve_lower(jnp.asarray(L), jnp.asarray(rhs))
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)
    # unbatched
    x1 = linalg.blocked_solve_lower(jnp.asarray(L[0]),
                                    jnp.asarray(rhs[0]), nb=256)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(ref[0]),
                               rtol=1e-10, atol=1e-12)
    # wide RHS falls back to the dense solve (same answer either way)
    wide = rng.standard_normal((B, n, 300))
    xw = linalg.blocked_solve_lower(jnp.asarray(L), jnp.asarray(wide), nb=256)
    np.testing.assert_allclose(
        np.asarray(xw), np.asarray(linalg.solve_lower(jnp.asarray(L),
                                                      jnp.asarray(wide))),
        rtol=1e-10, atol=1e-12)


def test_tri_inv_lower_stacked_small_n(rng):
    """Regression: the n <= block fallback must broadcast the identity RHS for
    STACKED (non-vmapped) batched factors — it previously fed an unbatched eye
    into triangular_solve, a batching-dim mismatch."""
    Ls = jnp.asarray(np.stack([np.linalg.cholesky(_random_pd(rng, 48))
                               for _ in range(2)]))
    Li = linalg.tri_inv_lower(Ls, block=64)  # small-n path, leading batch dim
    for b in range(2):
        np.testing.assert_allclose(np.asarray(Li[b]),
                                   np.linalg.inv(np.asarray(Ls[b])),
                                   rtol=1e-7, atol=1e-8)


def test_jitchol_binary_ladder_matches_sequential(rng):
    """The minimal-rung BINARY search must accept the same rung/jitter as
    GPy's sequential walk (util/linalg.py:56-74): rank-deficient matrices of
    varying severity, each checked against a numpy sequential-ladder twin."""
    for rank, n in ((5, 40), (20, 40), (39, 40)):
        U = rng.standard_normal((n, rank))
        A = U @ U.T
        L, jitter, ok = linalg.jitchol(jnp.asarray(A))
        assert bool(ok)
        # numpy twin: first rung whose factorization succeeds
        base = float(np.mean(np.diag(A))) * 1e-6
        expected = 0.0
        for k in range(6):
            j = 0.0 if k == 0 else base * 10.0 ** (k - 1)
            try:
                np.linalg.cholesky(A + j * np.eye(n))
                expected = j
                break
            except np.linalg.LinAlgError:
                continue
        # f32/f64 Cholesky failure thresholds differ slightly; allow one rung
        j_ours = float(jitter)
        assert j_ours == 0.0 or expected == 0.0 or \
            0.1 - 1e-9 <= j_ours / expected <= 10.0 + 1e-9


def test_jitchol_hint_invariance(rng):
    """jitchol_full(k_start=h) must return the SAME minimal rung and factor for
    any hint h — a hint is a warm start, never a semantic change."""
    U = rng.standard_normal((40, 10))
    A = jnp.asarray(U @ U.T)  # needs a mid-ladder rung
    ref_L, ref_j, ref_ok, ref_rung = linalg.jitchol_full(A)
    assert bool(ref_ok) and int(ref_rung) > 0
    for h in (0.0, 1.0, 2.5, 5.0):
        L, j, ok, rung = linalg.jitchol_full(A, k_start=h)
        assert bool(ok)
        assert int(rung) == int(ref_rung)
        assert float(j) == float(ref_j)
        np.testing.assert_allclose(np.asarray(L), np.asarray(ref_L), rtol=1e-12)
    # PD matrix: every hint still reports rung 0 / zero jitter
    P = jnp.asarray(_random_pd(rng, 24))
    for h in (0.0, 5.0):
        L, j, ok, rung = linalg.jitchol_full(P, k_start=h)
        assert bool(ok) and int(rung) == 0 and float(j) == 0.0


def test_jitchol_rung_reporting(rng):
    A = jnp.asarray(_random_pd(rng, 16))
    _, _, ok, rung = linalg.jitchol_full(A)
    assert bool(ok) and int(rung) == 0
    _, _, ok, rung = linalg.jitchol_full(-jnp.eye(8))
    assert not bool(ok)
    assert int(rung) == 6  # maxtries + 1 marks all-fail


def test_jitchol_hint_under_vmap(rng):
    """Hinted jitchol inside a vmapped program (the fit path): per-lane ladders
    with a shared hint still produce per-lane minimal rungs."""
    good = _random_pd(rng, 12)
    U = rng.standard_normal((12, 3))
    deficient = U @ U.T
    As = jnp.asarray(np.stack([good, deficient]))
    h = jnp.asarray(3.0, jnp.float32)
    L, j, ok, rung = jax.jit(
        jax.vmap(lambda a: linalg.jitchol_full(a, k_start=h))
    )(As)
    assert bool(ok[0]) and bool(ok[1])
    assert int(rung[0]) == 0 and float(j[0]) == 0.0
    ref = linalg.jitchol_full(As[1])
    assert int(rung[1]) == int(ref[3]) and float(j[1]) == float(ref[1])


def test_jitchol_greedy_from_zero_matches_verified(rng):
    """greedy=True with k_start=0 is exactly GPy's sequential ladder — same
    rung, jitter, and factor as the verified minimal-rung search (ADVICE r4)."""
    for rank, n in ((10, 40), (5, 40), (39, 40)):
        U = rng.standard_normal((n, rank))
        A = jnp.asarray(U @ U.T)
        ref_L, ref_j, ref_ok, ref_rung = linalg.jitchol_full(A)
        L, j, ok, rung = linalg.jitchol_full(A, k_start=0.0, greedy=True)
        assert bool(ok) == bool(ref_ok)
        assert int(rung) == int(ref_rung)
        assert float(j) == float(ref_j)
        np.testing.assert_allclose(np.asarray(L), np.asarray(ref_L), rtol=1e-12)
    # PD matrix: greedy from zero is one factorization at rung 0
    P = jnp.asarray(_random_pd(rng, 24))
    L, j, ok, rung = linalg.jitchol_full(P, k_start=0.0, greedy=True)
    assert bool(ok) and int(rung) == 0 and float(j) == 0.0


def test_jitchol_greedy_overshoot_accepts_hint_rung(rng):
    """greedy accepts the FIRST success walking UP from the hint — an
    overshooting hint is accepted as-is (no downward minimality check), and
    the factor still reconstructs A + jitter*I exactly."""
    U = rng.standard_normal((40, 10))
    A = jnp.asarray(U @ U.T)
    _, _, _, ref_rung = linalg.jitchol_full(A)  # true minimal rung
    h = float(int(ref_rung) + 2)  # overshoot by 2 rungs
    L, j, ok, rung = linalg.jitchol_full(A, k_start=h, greedy=True)
    assert bool(ok)
    assert int(rung) == int(h)  # hint rung accepted, NOT descended
    base = float(jnp.mean(jnp.diagonal(A))) * 1e-6
    np.testing.assert_allclose(float(j), base * 10.0 ** (h - 1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(L @ L.T), np.asarray(A) + float(j) * np.eye(40),
        rtol=1e-6, atol=1e-8)
    # PD matrix with an overshooting hint: the hint rung (nonzero jitter)
    # factors immediately and is accepted
    P = jnp.asarray(_random_pd(rng, 24))
    L, j, ok, rung = linalg.jitchol_full(P, k_start=3.0, greedy=True)
    assert bool(ok) and int(rung) == 3 and float(j) > 0.0
    np.testing.assert_allclose(
        np.asarray(L @ L.T), np.asarray(P) + float(j) * np.eye(24),
        rtol=1e-6, atol=1e-8)


def test_jitchol_greedy_batched_lanes_straddle_hint(rng):
    """Batched greedy with lanes whose acceptance rungs straddle the hint:
    the below-hint lane accepts the hint rung, the above-hint lane climbs,
    and every lane's factor reconstructs A + jitter*I."""
    good = _random_pd(rng, 16)                      # rung 0 — below any hint
    U = rng.standard_normal((16, 2))
    hard = U @ U.T                                   # needs a deep rung
    As = jnp.asarray(np.stack([good, hard]))
    ref_rung_hard = int(linalg.jitchol_full(As[1])[3])
    h = max(1, ref_rung_hard - 1)                    # straddles: 0 < h < hard
    L, j, ok, rung = linalg.jitchol_full(As, k_start=float(h), greedy=True)
    assert bool(ok[0]) and bool(ok[1])
    assert int(rung[0]) == h                         # good lane: hint accepted
    assert int(rung[1]) >= ref_rung_hard             # hard lane: climbed
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(L[b] @ L[b].T),
            np.asarray(As[b]) + float(j[b]) * np.eye(16),
            rtol=1e-6, atol=1e-8)


def test_jitchol_greedy_all_fail():
    """greedy ladder on an unfactorable matrix reports ok=False like the
    verified walk."""
    _, _, ok, rung = linalg.jitchol_full(-jnp.eye(8), k_start=2.0, greedy=True)
    assert not bool(ok)
    assert int(rung) == 6
