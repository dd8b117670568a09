"""Compacted copy-stream binning (RasterSettings.copy_budget_factor)
vs the legacy padded stream.

The compact path emits copies at the exclusive-cumsum positions of each
gaussian's real tile coverage; with a stable sort the (gaussian, slot)
order matches the padded stream, so when nothing exceeds the budget the
tile lists must be IDENTICAL (render/splat.py:_bin_gaussians)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.splat import (
    RasterSettings, _bin_gaussians, project_gaussians, rasterize,
)

from test_splat import GEOM, SETTINGS, make_scene


def _bin_with(args, settings):
    proj = project_gaussians(args[0], args[3], args[4], args[5],
                             **GEOM, settings=settings)
    return _bin_gaussians(proj, settings)


@pytest.mark.parametrize("m,seed", [(40, 0), (96, 1), (200, 2)])
@pytest.mark.slow
def test_tile_lists_identical_within_budget(m, seed):
    args = make_scene(m=m, seed=seed)
    legacy = _bin_with(args, SETTINGS)
    compact = _bin_with(
        args, dataclasses.replace(SETTINGS, copy_budget_factor=16))
    np.testing.assert_array_equal(np.asarray(legacy[0]),
                                  np.asarray(compact[0]))
    np.testing.assert_array_equal(np.asarray(legacy[1]),
                                  np.asarray(compact[1]))
    np.testing.assert_array_equal(np.asarray(legacy[2]),
                                  np.asarray(compact[2]))  # dropped/tile
    assert int(legacy[3]) == int(compact[3])       # overflow
    assert int(legacy[4]) == int(compact[4])       # total copies


def test_invalid_gaussians_excluded():
    args = list(make_scene(m=64, seed=3))
    valid = np.ones(64, bool)
    valid[::3] = False
    args[5] = jnp.asarray(valid)
    legacy = _bin_with(args, SETTINGS)
    compact = _bin_with(
        args, dataclasses.replace(SETTINGS, copy_budget_factor=16))
    np.testing.assert_array_equal(np.asarray(legacy[0]),
                                  np.asarray(compact[0]))
    np.testing.assert_array_equal(np.asarray(legacy[1]),
                                  np.asarray(compact[1]))


def test_budget_overflow_diagnosed_and_prefix_kept():
    """With factor 1 a crowded scene exceeds the budget: the overflow
    counter must report exactly the dropped copies, and the surviving
    lists must be the legacy lists with the dropped stream-tail
    gaussians removed (depth order preserved)."""
    args = make_scene(m=120, seed=4)
    # per-tile cap large enough to never bind: isolates budget drops
    big = dataclasses.replace(SETTINGS, gaussian_cap=512)
    s1 = dataclasses.replace(big, copy_budget_factor=1)
    lists1, counts1, _, ovf1, _ = _bin_with(args, s1)
    ll, lc, _, lovf, ltotal = _bin_with(args, big)
    assert int(lovf) == 0, "cap must not bind in this scene"
    # the scene must actually overflow the 1x budget for the test to bite
    assert int(ltotal) > 120
    assert int(ovf1) == int(ltotal) - 120
    # every budgeted slot is a live copy: exactly B survive
    assert int(np.asarray(counts1).sum()) == 120
    # depth order preserved: each compact tile list is a subsequence of
    # the legacy tile list (budget drops remove copies, never reorder)
    for t in range(lists1.shape[0]):
        compact_t = np.asarray(lists1[t])[:int(counts1[t])].tolist()
        legacy_t = np.asarray(ll[t])[:int(lc[t])].tolist()
        it = iter(legacy_t)
        assert all(g in it for g in compact_t), \
            f"tile {t}: {compact_t} not a subsequence of {legacy_t}"


def test_render_equal_within_budget():
    args = make_scene(m=150, seed=5)
    out_legacy = rasterize(*args, **GEOM, settings=SETTINGS)
    s = dataclasses.replace(SETTINGS, copy_budget_factor=16)
    out_compact = rasterize(*args, **GEOM, settings=s)
    assert int(out_compact.overflow) == int(out_legacy.overflow)
    np.testing.assert_array_equal(np.asarray(out_legacy.image),
                                  np.asarray(out_compact.image))


def test_factor_at_tmax_falls_back_to_legacy():
    """factor >= tiles_per_gaussian degenerates to the padded stream;
    _bin_gaussians must route to the legacy branch (identical output by
    construction, no budget accounting)."""
    args = make_scene(m=40, seed=6)
    s = dataclasses.replace(SETTINGS,
                            copy_budget_factor=SETTINGS.tiles_per_gaussian)
    legacy = _bin_with(args, SETTINGS)
    fallback = _bin_with(args, s)
    np.testing.assert_array_equal(np.asarray(legacy[0]),
                                  np.asarray(fallback[0]))
    assert int(legacy[3]) == int(fallback[3])
