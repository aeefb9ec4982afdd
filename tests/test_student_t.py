"""The rejection-free polar Student-t sampler (ops.gaussian.student_t)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from bipk_tpu.ops.gaussian import student_t


@pytest.mark.parametrize("df", [1.5, 3.0, 10.0, 100.0])
def test_matches_t_distribution_ks(df):
    key = jax.random.key(int(df * 10))
    draws = np.asarray(student_t(key, df, (40000,), jnp.float64))
    assert np.all(np.isfinite(draws))
    # Kolmogorov-Smirnov against the exact CDF; n = 40k gives a ~1%
    # critical distance at alpha = 1e-3
    d, p = stats.kstest(draws, "t", args=(df,))
    assert p > 1e-3, (df, d, p)


def test_per_element_df_array():
    """Array-valued df (per-particle degrees of freedom in the filter)."""
    key = jax.random.key(7)
    df = jnp.concatenate(
        [jnp.full((20000,), 3.0), jnp.full((20000,), 50.0)]
    )
    draws = np.asarray(student_t(key, df, (40000,), jnp.float64))
    d3 = draws[:20000]
    d50 = draws[20000:]
    _, p3 = stats.kstest(d3, "t", args=(3.0,))
    _, p50 = stats.kstest(d50, "t", args=(50.0,))
    assert p3 > 1e-3 and p50 > 1e-3, (p3, p50)
