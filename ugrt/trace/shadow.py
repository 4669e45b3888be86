"""Shadow pass: light-grid ray packetization + occlusion trace.

The reference reorders shadow rays by their light-grid cell with a 6-step
CUDPP pipeline — radix sort, segment-head flags, segmented scan,
packet-start marking, compaction (DecisionData, /root/reference/
decision_data.h:171-271 and misc_kernel.cu:255-333) — then traces one CUDA
block per ray packet streaming the cell's triangle list through shared
memory (mod_light_rckernel, light_kernel.cu:52-270).

The TPU-native formulation is the same algorithm as one fused XLA graph:

  cells    — per-ray light-cell id (ugrt.grid.binning.ray_light_cells)
  sort     — lax.sort (cell, ray) pairs, stable (== 15-bit CUDPP radix,
             decision_data.h:177: keys max out at the 16384 sentinel)
  ranks    — head flags + cummax-based segmented rank (replaces
             blockScan + cudppSegmentedScan)
  packets  — rank % 64 == 1 starts (preStreamCompaction semantics,
             misc_kernel.cu:316-325); compaction by sorting marked
             positions (replaces tag_thread + cudppCompact)
  work     — (packet, tri-batch) items, searchsorted-expanded, each a
             dense 64-ray x B-triangle Möller–Trumbore block
  combine  — scatter-max of per-ray occlusion back through the sort
             permutation

Divergence (defined semantics, SURVEY.md §3.5): rays whose shadow
direction leaves the light grid get the sentinel cell and the reference
then indexes its span array OUT OF BOUNDS for those packets
(light_kernel.cu:111 with cell 16384 into a 16384-entry array) — undefined
behavior.  Here sentinel packets are skipped: such rays are never
shadowed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ugrt.config import RenderConfig
from ugrt.core.vecmath import dot, normalize
from ugrt.grid import binning
from ugrt.grid.build import DeviceGrid
from ugrt.trace.primary import moller_trumbore_t

_BIG = jnp.float32(3.0e38)


class ShadowWork(NamedTuple):
    packet_pos: jax.Array    # [Pcap] position in sorted ray order (N pad)
    packet_count: jax.Array  # [Pcap] rays in packet (<= 64, 0 pad)
    packet_cell: jax.Array   # [Pcap] light cell (sentinel pad)
    overflow: jax.Array      # [] bool


def packet_capacity(cfg: RenderConfig, num_rays: int) -> int:
    """Packets <= light cells + N/64: every cell adds at most one partial
    packet on top of the full 64-ray ones."""
    return cfg.cell_sentinel + num_rays // cfg.max_rays_per_packet + 1


def build_packets(cells, cfg: RenderConfig):
    """Sort rays by light cell and carve 64-ray cell-pure packets.

    cells: [N] int32 light-cell ids (cfg.cell_sentinel = out of grid).
    Returns (sorted_ray [N] int32 original ray index, ShadowWork).
    """
    n = cells.shape[0]
    ray_ids = jnp.arange(n, dtype=jnp.int32)
    sorted_cells, sorted_ray = jax.lax.sort((cells, ray_ids), num_keys=1)

    pos = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.bool_),
         sorted_cells[1:] != sorted_cells[:-1]])
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
    rank = pos - seg_start + 1  # 1-based in-segment rank (segmented scan)

    start = (rank % cfg.max_rays_per_packet) == 1
    if cfg.max_rays_per_packet == 1:
        start = jnp.ones_like(start)

    pcap = packet_capacity(cfg, n)
    # Compact start positions: sort marked positions ascending, pad with n.
    marked = jnp.where(start, pos, n)
    sorted_marked = jnp.sort(marked)
    packet_pos = sorted_marked[:pcap]
    num_packets = jnp.sum(start.astype(jnp.int32))
    overflow = num_packets > pcap

    # Packet extent = distance to the next start (a new segment always
    # starts a packet, so this never crosses a cell boundary).
    next_pos = jnp.concatenate(
        [sorted_marked[1:pcap + 1],
         jnp.full((max(0, pcap + 1 - sorted_marked.shape[0]),), n,
                  dtype=sorted_marked.dtype)])[:pcap]
    packet_count = jnp.clip(next_pos - packet_pos, 0,
                            cfg.max_rays_per_packet)

    cell_at = sorted_cells[jnp.clip(packet_pos, 0, n - 1)]
    valid = packet_pos < n
    packet_cell = jnp.where(valid & (cell_at < cfg.cell_sentinel),
                            cell_at, cfg.cell_sentinel)
    packet_count = jnp.where(packet_cell < cfg.cell_sentinel,
                             packet_count, 0)

    work = ShadowWork(packet_pos.astype(jnp.int32),
                      packet_count.astype(jnp.int32),
                      packet_cell.astype(jnp.int32), overflow)
    return sorted_ray, work


def trace_shadow(vertices, faces, light_camcoords, light_grid: DeviceGrid,
                 primary, primary_eye, cfg: RenderConfig, *,
                 chunk_size: int = 256,
                 work_factor: int = 2,
                 backend: str = "xla", interpret: bool = False):
    """Per-pixel shadow flags [H, W] int32 (mod_light_rckernel semantics).

    Every pixel participates — including primary misses, whose 'hit point'
    eye + (-1)*dir is faithfully garbage, exactly as the reference
    reorders all IMAGE_SIZE rays (misc_kernel.cu:294-295).
    """
    H, W = primary["t"].shape
    n = H * W
    L = light_camcoords[0:3]

    t = primary["t"].reshape(n)
    dirs = primary["ray_dir"].reshape(n, 3)
    pts = primary_eye[None] + t[:, None] * dirs              # [N, 3]

    cells = binning.ray_light_cells(
        pts, light_camcoords, cfg.grid_x, cfg.grid_y,
        cfg.angular_extent, cfg.angular_extent,
        cfg.quirks.y_forward_dot_typo, xp=jnp).reshape(n)

    sorted_ray, pk = build_packets(cells, cfg)
    sorted_pts = pts[sorted_ray]                             # [N, 3]
    dist_pt = jnp.sqrt(dot(sorted_pts - L[None], sorted_pts - L[None]))
    sh_dirs = normalize(sorted_pts - L[None], xp=jnp)

    B = cfg.tri_batch
    NS = cfg.num_slabs
    R = cfg.max_rays_per_packet
    pcap = pk.packet_pos.shape[0]

    if backend == "pallas":
        # Packet ray blocks [Pcap, 8, 128]: rows 0:3 shadow dir, row 3 =
        # light-to-point distance; lanes = rays (padded to 128 for DMA).
        from ugrt.trace import pallas_tracer

        layout = pallas_tracer.pack_tri_data(vertices, faces, light_grid,
                                             L, cfg)
        ray_lane0 = jnp.arange(R, dtype=jnp.int32)
        ridx = jnp.clip(pk.packet_pos[:, None] + ray_lane0[None, :], 0,
                        n - 1)
        d_pk = jnp.swapaxes(sh_dirs[ridx], 1, 2)      # [Pcap, 3, R]
        dist_pk = dist_pt[ridx][:, None, :]           # [Pcap, 1, R]
        live_pk = (ray_lane0[None, :]
                   < pk.packet_count[:, None]).astype(
                       jnp.float32)[:, None, :]       # [Pcap, 1, R]
        rays_pk = jnp.pad(
            jnp.concatenate([d_pk, dist_pk, live_pk], axis=1),
            ((0, 0), (0, 3), (0, 128 - R)))           # [Pcap, 8, 128]

    shadowed_sorted = jnp.zeros((n,), dtype=jnp.int32)

    for slab in range(NS):
        # Work expansion: (packet, batch) over this slab's cell lists.
        cnt = jnp.where(
            pk.packet_cell < cfg.cell_sentinel,
            light_grid.cell_count[
                jnp.clip(pk.packet_cell * NS + slab, 0,
                         cfg.num_cells - 1)], 0)
        off = light_grid.cell_offset[
            jnp.clip(pk.packet_cell * NS + slab, 0, cfg.num_cells - 1)]

        nb = (cnt + (B - 1)) // B
        incl = jnp.cumsum(nb)
        # Each packet needs >= 1 batch; extra batches are bounded by the
        # packet's cell depth.  work_factor x pcap covers cells up to
        # work_factor batches deep on average (overflow flag otherwise).
        wcap = (work_factor * pcap
                + light_grid.sorted_faces.shape[0] // B)

        w = jnp.arange(wcap, dtype=jnp.int32)
        pkt = jnp.searchsorted(incl, w, side="right").astype(jnp.int32)
        wvalid = w < incl[-1]
        pkt_c = jnp.clip(pkt, 0, pcap - 1)
        b = w - (incl - nb)[pkt_c]
        w_off = off[pkt_c] + b * B
        w_cnt = jnp.clip(cnt[pkt_c] - b * B, 0, B)
        w_cnt = jnp.where(wvalid, w_cnt, 0)
        overflow = incl[-1] > wcap

        lane = jnp.arange(B, dtype=jnp.int32)
        ray_lane = jnp.arange(R, dtype=jnp.int32)

        def chunk_body(args):
            c_off, c_cnt, c_pos, c_prays = args
            idx = jnp.clip(c_off[:, None] + lane[None, :], 0,
                           light_grid.sorted_faces.shape[0] - 1)
            fidx = jnp.clip(light_grid.sorted_faces[idx], 0,
                            faces.shape[0] - 1)
            v = vertices[faces[fidx]]                        # [C, B, 3, 3]
            v0 = v[:, :, 0]
            e1 = v[:, :, 1] - v0
            e2 = v[:, :, 2] - v0
            tvec = L[None, None, :] - v0

            ridx = jnp.clip(c_pos[:, None] + ray_lane[None, :], 0, n - 1)
            d = sh_dirs[ridx]                                # [C, R, 3]
            dp = dist_pt[ridx]                               # [C, R]

            tmt = moller_trumbore_t(tvec, e1, e2, d, cfg, abs_t=False)
            # intersectTri accept: nonzero and t < 999999.9
            # (light_kernel.cu:43-47); negative t passes.
            hit = (tmt != 0) & (tmt < jnp.float32(999999.9))
            if not cfg.quirks.shadow_accept_negative_t:
                hit = hit & (tmt > 0)

            occ = L[None, None, None, :] + tmt[..., None] * d[:, :, None, :]
            delta = occ - L[None, None, None, :]
            dist_occ = jnp.sqrt(dot(delta, delta))
            small = dist_occ + jnp.float32(cfg.shadow_epsilon) < dp[..., None]

            live_tri = (lane[None, None, :] < c_cnt[:, None, None])
            live_ray = (ray_lane[None, :] < c_prays[:, None])
            sh = jnp.any(hit & small & live_tri, axis=-1) & live_ray
            return sh                                        # [C, R] bool

        def chunk_fn(args):
            # Work items are packed valid-first, so whole chunks beyond
            # the live count are dead — skip their compute entirely.
            # Dead-branch outputs derive from traced inputs (shard_map
            # varying-axes provenance).
            def dead(a):
                return ((a[3][:, None] + ray_lane[None, :]) < 0)

            return jax.lax.cond(jnp.any(args[1] > 0), chunk_body, dead,
                                args)

        if backend == "pallas":
            sh_i = pallas_tracer.shadow_sweep_pallas(
                layout.tri_rows, rays_pk, w_off.astype(jnp.int32),
                w_cnt.astype(jnp.int32), pkt_c.astype(jnp.int32),
                cfg=cfg, interpret=interpret)
            sh = sh_i[:, :R] > 0                                # [Wcap, R]
        else:
            n_chunks = -(-wcap // chunk_size)
            pad = n_chunks * chunk_size - wcap

            def pad0(x):
                return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

            xs = (pad0(w_off).reshape(n_chunks, chunk_size),
                  pad0(w_cnt).reshape(n_chunks, chunk_size),
                  pad0(pk.packet_pos[pkt_c]).reshape(n_chunks, chunk_size),
                  pad0(pk.packet_count[pkt_c] * wvalid).reshape(
                      n_chunks, chunk_size))
            sh = jax.lax.map(chunk_fn, xs).reshape(-1, R)[:wcap]

        # Scatter-max into sorted ray order.
        positions = jnp.clip(pk.packet_pos[pkt_c][:, None]
                             + ray_lane[None, :], 0, n - 1)
        shadowed_sorted = shadowed_sorted.at[positions.reshape(-1)].max(
            sh.astype(jnp.int32).reshape(-1))

    # Undo the sort permutation.
    shadowed = jnp.zeros((n,), dtype=jnp.int32).at[sorted_ray].max(
        shadowed_sorted)
    return shadowed.reshape(H, W), overflow
