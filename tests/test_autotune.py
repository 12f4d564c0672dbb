"""Dense-kernel tile autotuner tests (mechanics on CPU interpret mode)."""

import json

import numpy as np

from cgx.bench.autotune import (
    DEFAULT_CANDIDATES,
    autotune_dense_tiles,
    tuned_tiles,
)


def test_autotune_picks_persists_and_reloads(tmp_path):
    cache = tmp_path / "autotune.json"
    n = 256
    tiles = autotune_dense_tiles(
        n, np.float32,
        candidates=((128, 128), (128, 256)),
        repeats=2,
        cache_path=str(cache),
    )
    assert tiles in (((128, 128)), (128, 256))
    data = json.loads(cache.read_text())
    assert len(data) == 1
    (rec,) = data.values()
    assert rec["block_rows"] == tiles[0] and rec["block_cols"] == tiles[1]
    assert rec["candidates_tried"] == 2
    # lookup path returns the cached winner without measuring
    assert tuned_tiles(n, np.float32, cache_path=str(cache)) == tiles
    # cache hit path on re-tune
    again = autotune_dense_tiles(
        n, np.float32, candidates=((512, 512),), cache_path=str(cache)
    )
    assert again == tiles  # candidates ignored: cache hit
    forced = autotune_dense_tiles(
        n, np.float32, candidates=((128, 256),), repeats=1, force=True,
        cache_path=str(cache),
    )
    assert forced == (128, 256)


def test_tuned_tiles_defaults_when_untuned(tmp_path):
    assert tuned_tiles(10_000, np.float32,
                       cache_path=str(tmp_path / "none.json")) == (256, 512)


def test_autotune_clamps_oversized_tiles(tmp_path):
    # tiles larger than the problem clamp to n (and thus stay feasible)
    tiles = autotune_dense_tiles(
        256, np.float32,
        candidates=((100_000, 100_000),),
        repeats=1,
        cache_path=str(tmp_path / "c.json"),
    )
    assert tiles == (256, 256)


def test_default_candidates_sane():
    from cgx.config import VMEM_BUDGET_BYTES

    for br, bc in DEFAULT_CANDIDATES:
        assert br % 8 == 0 and bc % 128 == 0
        assert 2 * br * bc * 4 <= VMEM_BUDGET_BYTES
