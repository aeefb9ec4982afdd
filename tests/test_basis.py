"""Unit tests for the Hilbert-GP basis (bipk_tpu.ops.basis)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.ops import basis as basis_ops


def test_boundary_vanishing_1d():
    hb = basis_ops.make_hilbert_basis(10, np.array([-2.0, 2.0]), 0.5, 1.0)
    np.testing.assert_allclose(hb.eigen_fn(jnp.array([-2.0])), 0.0, atol=1e-8)
    np.testing.assert_allclose(hb.eigen_fn(jnp.array([2.0])), 0.0, atol=1e-8)


def test_orthonormality_1d():
    """Eigenfunctions are orthonormal on the domain w.r.t. Lebesgue measure."""
    hb = basis_ops.make_hilbert_basis(6, np.array([-3.0, 3.0]), 1.0, 1.0)
    xs = jnp.linspace(-3.0, 3.0, 4001)[:, None]
    phis = jax.vmap(hb.eigen_fn)(xs)  # (4001, 6)
    gram = np.trapezoid(
        np.asarray(phis)[:, :, None] * np.asarray(phis)[:, None, :],
        np.asarray(xs[:, 0]),
        axis=0,
    )
    np.testing.assert_allclose(gram, np.eye(6), atol=1e-3)


def test_eigenvalue_selection_matches_bruteforce_2d():
    """Lazy lattice selection == brute-force smallest eigenvalue sums."""
    domain = np.array([[-1.0, 2.0], [-4.0, 4.0]])
    num = 15
    hb = basis_ops.make_hilbert_basis(num, domain, 0.3, 1.0)

    sizes = domain[:, 1] - domain[:, 0]
    weights = (np.pi / sizes) ** 2
    idx = np.arange(1, num + 2)
    combos = np.array(list(itertools.product(idx, idx)), dtype=float)
    costs = (combos**2 @ weights).round(12)
    eig_selected = np.sort(
        np.sum(hb.sqrt_eigenvalues**2, axis=1).round(12)
    )
    eig_brute = np.sort(costs)[:num]
    np.testing.assert_allclose(eig_selected, eig_brute, rtol=1e-10)


def test_even_index_selection():
    """idx_start=2, idx_step=2 (vehicle example) only picks even indices."""
    domain = np.array([-0.5, 0.5])
    hb = basis_ops.make_hilbert_basis(
        8, domain, 0.05, 1.0, idx_start=2, idx_step=2
    )
    # sqrt(lambda) = pi j / size with size = 1 -> j = sqrt_eig / pi
    j = hb.sqrt_eigenvalues[:, 0] / np.pi
    np.testing.assert_allclose(j, np.round(j), atol=1e-12)
    assert np.all(np.round(j).astype(int) % 2 == 0)


def test_spectral_density_analytic():
    """SE spectral density matches the closed form in n dims."""
    freq = np.array([[0.3, 1.2, 0.0]])
    ls = np.array([0.5, 1.0, 2.0])
    got = basis_ops.se_spectral_density(freq, 2.0, ls)
    expected = (
        2.0
        * (2 * np.pi) ** 1.5
        * np.prod(ls)
        * np.exp(-0.5 * np.sum(ls**2 * freq[0] ** 2))
    )
    np.testing.assert_allclose(np.asarray(got)[0], expected, rtol=1e-6)


def test_gp_regression_recovers_smooth_function():
    """Basis + MNIW prior recover a smooth function from noisy samples."""
    from bipk_tpu.ops import mniw

    hb = basis_ops.make_hilbert_basis(32, np.array([-5.0, 5.0]), 0.8, 10.0)
    prior = mniw.natural_from_standard(
        np.zeros((1, 32)),
        np.diag(np.asarray(hb.spectral_density)),
        np.eye(1) * 0.1,
        3.0,
    )
    key = jax.random.key(0)
    xs = jax.random.uniform(key, (400,), minval=-3.0, maxval=3.0)
    f = lambda x: jnp.sin(2.0 * x) + 0.5 * x
    ys = f(xs) + 0.05 * jax.random.normal(jax.random.key(1), (400,))

    phis = jax.vmap(lambda x: hb.eigen_fn(jnp.atleast_1d(x)))(xs)
    stats = jax.vmap(mniw.suff_stat)(ys[:, None], phis)
    post = jax.tree_util.tree_map(
        lambda p, s: p + jnp.sum(s, 0), prior, stats
    )
    A = mniw.posterior_mean(post)

    grid = jnp.linspace(-3.0, 3.0, 101)
    phig = jax.vmap(lambda x: hb.eigen_fn(jnp.atleast_1d(x)))(grid)
    fhat = phig @ A[0]
    rmse = float(jnp.sqrt(jnp.mean((fhat - f(grid)) ** 2)))
    assert rmse < 0.1, rmse


def test_eigen_fn_bl_matches_vmapped():
    """Batch-last eigenfunction == vmapped per-particle evaluation (the
    sweeps' hot path uses the bl form to avoid compute-then-transpose)."""
    for dims, n_fcn in ((1, 12), (2, 9)):
        hb = basis_ops.make_hilbert_basis(
            n_fcn,
            np.array([[-5.0, 5.0]] * dims).squeeze()
            if dims == 1
            else np.array([[-5.0, 5.0], [-4.0, 4.0]]),
            1.2,
            1.0,
        )
        x = jax.random.uniform(
            jax.random.key(dims), (dims, 257), jnp.float32, -4.0, 4.0
        )
        want = jax.vmap(hb.eigen_fn, in_axes=-1, out_axes=-1)(x)
        got = hb.eigen_fn_bl(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
        )
        # 1-D convenience: accepts (N,) too
        if dims == 1:
            got1 = hb.eigen_fn_bl(x[0])
            np.testing.assert_allclose(np.asarray(got1), np.asarray(want))
