"""Native C++ host-prep module vs the NumPy reference path."""
import numpy as np
import pytest

from atlasqtl_tpu import native
from atlasqtl_tpu.io.prepare import (standardize_and_flag,
                                     standardize_columns, prepare_data)

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="no C++ toolchain")


@needs_native
def test_native_standardize_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 64))
    x[:, 10] = 3.0                      # constant
    x[:, 20] = x[:, 5]                  # duplicate
    x[:, 21] = x[:, 5]                  # another duplicate of the same col

    xn, cst_n, dup_n, twin_n = standardize_and_flag(x.copy(),
                                                    use_native=True)
    xp, cst_p, dup_p, twin_p = standardize_and_flag(x.copy(),
                                                    use_native=False)
    np.testing.assert_array_equal(cst_n, cst_p)
    np.testing.assert_array_equal(dup_n, dup_p)
    np.testing.assert_array_equal(twin_n, twin_p)
    keep = ~cst_n
    np.testing.assert_allclose(xn[:, keep], xp[:, keep], rtol=1e-12)
    assert cst_n[10] and dup_n[20] and dup_n[21]
    assert twin_n[20] == 5 and twin_n[21] == 5


@needs_native
def test_native_missing_stats():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(100, 20))
    y[rng.uniform(size=y.shape) < 0.3] = np.nan
    mask, col_obs, col_mean, total = native.missing_stats(y)
    np.testing.assert_array_equal(mask, (~np.isnan(y)).astype(np.uint8))
    np.testing.assert_array_equal(col_obs, (~np.isnan(y)).sum(axis=0))
    np.testing.assert_allclose(col_mean, np.nanmean(y, axis=0), rtol=1e-12)
    assert total == int((~np.isnan(y)).sum())


@needs_native
def test_prepare_data_native_equals_numpy_path():
    rng = np.random.default_rng(2)
    x = rng.binomial(2, 0.3, size=(150, 80)).astype(float)
    x[:, 7] = 1.0
    x[:, 30] = x[:, 3]
    y = rng.normal(size=(150, 12))

    import atlasqtl_tpu.io.prepare as prep
    # force both paths through the public prepare_data by toggling size gate
    d_np = prepare_data(y, x.copy(), 0.1, 100)
    # native path: monkeypatch the gate
    orig = prep.standardize_and_flag
    try:
        prep.standardize_and_flag = lambda xx, use_native=None: orig(
            xx, use_native=True)
        d_nat = prepare_data(y, x.copy(), 0.1, 100)
    finally:
        prep.standardize_and_flag = orig
    np.testing.assert_allclose(d_nat.x, d_np.x, rtol=1e-12)
    assert d_nat.rmvd_cst_x == d_np.rmvd_cst_x
    assert d_nat.rmvd_coll_x == d_np.rmvd_coll_x
    np.testing.assert_array_equal(d_nat.bool_rmvd_x, d_np.bool_rmvd_x)
