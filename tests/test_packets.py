"""DecisionData packet-parity tests for shadow.build_packets.

The reference's 6-step reorder pipeline (decision_data.h:171-271) carves
the cell-sorted ray stream into packets of <= MAX_RAYS_PER_BLOCK rays
that never span a cell boundary (a new cell always starts a packet,
misc_kernel.cu:316-325 marks rank % 64 == 1).  These tests pin that
contract against a naive per-cell computation: packets are cell-pure,
<= 64 rays, their count is sum(ceil(n_c / 64)) over live cells, and
together they tile the sorted stream of in-grid rays exactly.
"""

import numpy as np
import jax.numpy as jnp

from ugrt.config import RenderConfig
from ugrt.trace import shadow as tshadow


def _check(cells_np, cfg):
    sorted_ray, work = tshadow.build_packets(jnp.asarray(cells_np), cfg)
    sorted_ray = np.asarray(sorted_ray)
    pos = np.asarray(work.packet_pos)
    cnt = np.asarray(work.packet_count)
    cell = np.asarray(work.packet_cell)
    assert not bool(work.overflow)

    sent = cfg.cell_sentinel
    live = cell < sent
    n = cells_np.shape[0]

    # Expected packet count: ceil(n_c / 64) per live cell
    # (decision_data.h:268 prints this as h_numCudaBlocks).
    vals, counts = np.unique(cells_np[cells_np < sent], return_counts=True)
    expected = int(np.sum(-(-counts // cfg.max_rays_per_packet)))
    assert int(live.sum()) == expected

    # Packets: <= 64 rays, cell-pure, within bounds, non-overlapping and
    # covering the live prefix of the sorted stream exactly.
    sorted_cells = cells_np[sorted_ray]
    covered = np.zeros(n, dtype=bool)
    for p in np.nonzero(live)[0]:
        s, c = int(pos[p]), int(cnt[p])
        assert 1 <= c <= cfg.max_rays_per_packet
        assert s + c <= n
        seg = sorted_cells[s:s + c]
        assert (seg == cell[p]).all(), "packet spans a cell boundary"
        assert not covered[s:s + c].any(), "packets overlap"
        covered[s:s + c] = True
    # Exactly the in-grid rays are covered (sentinel rays sort last and
    # are never packetized — SURVEY §3.5 divergence note).
    assert covered.sum() == (cells_np < sent).sum()
    assert (sorted_cells[covered] < sent).all()


def test_packets_random():
    cfg = RenderConfig(screen_width=64, screen_height=64,
                       grid_x=8, grid_y=8)
    rng = np.random.default_rng(7)
    n = 64 * 64
    # Concentrated distribution: a few hot cells (multi-packet), many
    # single-ray cells, ~5% out-of-grid sentinels.
    cells = rng.integers(0, cfg.cell_sentinel, n).astype(np.int32)
    hot = rng.integers(0, cfg.cell_sentinel, 4)
    idx = rng.random(n) < 0.6
    cells[idx] = rng.choice(hot, idx.sum())
    cells[rng.random(n) < 0.05] = cfg.cell_sentinel
    _check(cells, cfg)


def test_packets_all_one_cell():
    cfg = RenderConfig(screen_width=32, screen_height=32,
                       grid_x=4, grid_y=4)
    cells = np.full(32 * 32, 5, dtype=np.int32)
    _check(cells, cfg)
    # 1024 rays in one cell -> exactly 16 full 64-ray packets.
    _, work = tshadow.build_packets(jnp.asarray(cells), cfg)
    live = np.asarray(work.packet_cell) < cfg.cell_sentinel
    assert int(live.sum()) == 16
    assert (np.asarray(work.packet_count)[live] == 64).all()


def test_packets_all_sentinel():
    cfg = RenderConfig(screen_width=32, screen_height=32,
                       grid_x=4, grid_y=4)
    cells = np.full(32 * 32, cfg.cell_sentinel, dtype=np.int32)
    _, work = tshadow.build_packets(jnp.asarray(cells), cfg)
    assert (np.asarray(work.packet_count) == 0).all()
    assert not bool(work.overflow)
