"""ECoG electrode-grid spatial correlation analysis (VERDICT r2 item 4).

Oracle: a hand-built correlation field where corr(a, b) depends only on the
Euclidean grid distance between electrodes a and b — then every direction
curve equals the distance-1 value and the distance curves recover the decay
exactly.  Reference semantics: NMGP_ECoG_full.py:456-546.
"""

import numpy as np

from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
    surrogate_ecog_channel_indexes,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.posterior_analysis import (
    ECOG_GRID_CHANNEL_IDS,
    direction_correlation_curves,
    distance_correlation_curves,
)


def _distance_decay_corrs(channel_indexes, G=7, decay=0.25):
    """(G, D, D) correlation stack: corr = exp(-decay * grid_distance) * f(t)
    for electrodes on the 5x5 grid, 0 elsewhere; f(t) = 1 + t/10."""
    D = len(channel_indexes)
    pos = {}  # output index -> (i, j) grid coordinate
    cd = {int(c): k for k, c in enumerate(channel_indexes)}
    for i in range(5):
        for j in range(5):
            pos[cd[int(ECOG_GRID_CHANNEL_IDS[i, j])]] = (i, j)
    base = np.zeros((D, D))
    for a, (ia, ja) in pos.items():
        for b, (ib, jb) in pos.items():
            d = np.hypot(ia - ib, ja - jb)
            base[a, b] = np.exp(-decay * d)
    t = np.arange(G) / 10.0
    return base[None, :, :] * (1.0 + t)[:, None, None], base


def test_surrogate_channel_indexes_cover_grid():
    ids = surrogate_ecog_channel_indexes(78)
    assert len(ids) == 78 and len(set(ids.tolist())) == 78
    assert set(np.unique(ECOG_GRID_CHANNEL_IDS).tolist()) <= set(ids.tolist())


def test_direction_curves_match_distance_one():
    channel_indexes = surrogate_ecog_channel_indexes(78)
    corrs, _ = _distance_decay_corrs(channel_indexes)
    curves = direction_correlation_curves(
        corrs, ECOG_GRID_CHANNEL_IDS, channel_indexes
    )
    assert set(curves) == {"left", "top", "right", "bottom"}
    expected = np.exp(-0.25) * (1.0 + np.arange(7) / 10.0)
    for name, c in curves.items():
        assert c.shape == (7,)
        np.testing.assert_allclose(c, expected, rtol=1e-12, err_msg=name)
    # pair counts: 5x5 grid has 20 ordered neighbor pairs per direction
    # (implicitly checked by the exact mean above: all pairs share the value)


def test_distance_curves_recover_decay():
    channel_indexes = surrogate_ecog_channel_indexes(78)
    corrs, _ = _distance_decay_corrs(channel_indexes)
    curves = distance_correlation_curves(
        corrs, ECOG_GRID_CHANNEL_IDS, channel_indexes, dists=(1, 2, 3)
    )
    f = 1.0 + np.arange(7) / 10.0
    for d in (1, 2, 3):
        np.testing.assert_allclose(curves[d], np.exp(-0.25 * d) * f, rtol=1e-12)
    # monotone decay with distance at every time point
    assert np.all(curves[1] > curves[2])
    assert np.all(curves[2] > curves[3])


def test_direction_asymmetry_is_respected():
    """left/right (row-offset) vs top/bottom (column-offset) must read the
    correct matrix entries: build an anisotropic field where row-neighbors
    correlate 0.6 and column-neighbors 0.2."""
    channel_indexes = surrogate_ecog_channel_indexes(78)
    D = len(channel_indexes)
    cd = {int(c): k for k, c in enumerate(channel_indexes)}
    corr = np.zeros((1, D, D))
    for i in range(5):
        for j in range(5):
            a = cd[int(ECOG_GRID_CHANNEL_IDS[i, j])]
            if i + 1 < 5:
                b = cd[int(ECOG_GRID_CHANNEL_IDS[i + 1, j])]
                corr[0, a, b] = corr[0, b, a] = 0.6
            if j + 1 < 5:
                b = cd[int(ECOG_GRID_CHANNEL_IDS[i, j + 1])]
                corr[0, a, b] = corr[0, b, a] = 0.2
    curves = direction_correlation_curves(corr, ECOG_GRID_CHANNEL_IDS, channel_indexes)
    np.testing.assert_allclose(curves["left"], [0.6])
    np.testing.assert_allclose(curves["right"], [0.6])
    np.testing.assert_allclose(curves["top"], [0.2])
    np.testing.assert_allclose(curves["bottom"], [0.2])
