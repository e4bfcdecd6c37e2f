"""Multi-chip distribution: mesh setup + sharded build/query steps.

The TPU-native replacement for the reference's process-level sharding
(SURVEY §2.9): the k-mer space partition that the reference implements as
Σ^s separate passes + chunk files (cli/build.cpp:103-155) becomes a
device-mesh axis with an ``all_to_all`` exchange (MoE-style bucket
routing), and per-label annotation parallelism (annotate.cpp:469) becomes
column sharding with an ``all_gather`` of per-shard label counts.

All steps are written with ``shard_map`` over an explicit Mesh so the
same code runs on a real TPU slice over ICI or on the virtual CPU mesh
used in tests and the driver's multichip dry-run.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..common import packed
from ..kmer import packing
from ..kmer.alphabets import DNA
from ..kmer.extractor import extract_packed_kmers


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _owner_of(lanes: jax.Array, K: int, B: int, n_dev: int) -> jax.Array:
    """Shard owner of each k-mer: high bits of the node key, so shards are
    contiguous colex ranges (suffix sharding, SURVEY P4)."""
    top = packing.top_char(lanes, K, B)          # 1..4 for DNA
    second = packed.get_field(lanes, K - 2, B)
    bucket = (top - 1) * 4 + (second - 1)        # 0..15
    per = max(1, 16 // n_dev)
    return jnp.clip(bucket // per, 0, n_dev - 1).astype(jnp.int32)


def build_distributed_count_step(mesh: Mesh, K: int, B: int = 4,
                                 codes_per_device: int = 1 << 14,
                                 axis: str = "x"):
    """Returns a jitted step: (n_dev, codes_per_device) uint8 codes ->
    total distinct k-mers, computed by per-device extraction, all_to_all
    bucket routing, per-shard sort-unique, and a psum reduction.

    This is the inner step of the multi-chip graph build: the same
    exchange pattern scales to the full pipeline (counts ride along the
    routed k-mers; dummy generation queries route the same way).
    """
    n_dev = mesh.devices.size
    L = packing.lanes_for(K, B)
    cap = codes_per_device - K + 1
    per_dest = cap  # worst case: all k-mers to one destination

    def step(codes):
        # codes: (codes_per_device,) local slice
        lanes, count = extract_packed_kmers(codes, K, B)
        owner = _owner_of(lanes, K, B, n_dev)
        valid = packed.valid_mask(cap, count)
        # build per-destination send buffers (n_dev, L, per_dest)
        send = jnp.zeros((n_dev, L, per_dest), packed.LANE_DTYPE) \
            + packed.PAD_LANE
        for d in range(n_dev):
            m = valid & (owner == d)
            comp, _, _ = packed.compact(lanes, m, per_dest)
            send = send.at[d].set(comp)
        # exchange: dimension 0 is the destination axis
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        # recv: (n_dev, L, per_dest) — flatten sources
        mine = recv.transpose(1, 0, 2).reshape(L, n_dev * per_dest)
        mine_s, _ = packed.sort(mine)
        not_pad = ~jnp.all(mine_s == packed.PAD_LANE, axis=0)
        uniq = packed.neighbor_ne(mine_s) & not_pad
        local_unique = jnp.sum(uniq.astype(jnp.int32))
        total = jax.lax.psum(local_unique, axis)
        return total, local_unique[None]

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(), P(axis)),
        )

    @jax.jit
    def run(codes_all):
        # codes_all: (n_dev * codes_per_device,)
        return sharded(codes_all)

    return run


def build_distributed_collect_step(mesh: Mesh, K: int, B: int = 4,
                                   codes_per_device: int = 1 << 14,
                                   canonical: bool = False,
                                   complement=(0, 4, 3, 2, 1),
                                   axis: str = "x"):
    """Full distributed k-mer collection: returns per-shard sorted unique
    k-mers + counts, sharded over the mesh axis by colex bucket so that
    shard outputs concatenate into the globally sorted set.

    This is the multi-chip build front half (SURVEY §2.9 P4): dp extract
    -> all_to_all bucket routing -> per-shard sort-unique. The back half
    (dummy generation + emit) runs on the concatenated set.
    """
    n_dev = mesh.devices.size
    L = packing.lanes_for(K, B)
    cap = codes_per_device - K + 1
    per_dest = cap

    def step(codes):
        lanes, count = extract_packed_kmers(codes, K, B)
        if canonical:
            rc = packing.reverse_complement(lanes, K, B, complement)
            valid = packed.valid_mask(cap, count)
            take_rc = packed.lt(rc, lanes) & valid
            lanes = jnp.where(take_rc[None, :], rc, lanes)
        owner = _owner_of(lanes, K, B, n_dev)
        valid = packed.valid_mask(cap, count)
        send = jnp.zeros((n_dev, L, per_dest), packed.LANE_DTYPE) \
            + packed.PAD_LANE
        for d in range(n_dev):
            m = valid & (owner == d)
            comp, _, _ = packed.compact(lanes, m, per_dest)
            send = send.at[d].set(comp)
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        mine = recv.transpose(1, 0, 2).reshape(L, n_dev * per_dest)
        counts = jnp.ones((mine.shape[1],), jnp.int32)
        # count PADs as invalid
        not_pad = ~jnp.all(mine == packed.PAD_LANE, axis=0)
        n_mine = jnp.sum(not_pad.astype(jnp.int32))
        mine = jnp.where(not_pad[None, :], mine,
                         packed.full_pad(mine.shape[1], L))
        mine_s, (counts_s,) = packed.sort(mine, counts)
        first = packed.neighbor_ne(mine_s)
        umask = first & packed.valid_mask(mine.shape[1], n_mine)
        seg = jnp.cumsum(umask.astype(jnp.int32)) - 1
        ucounts = jax.ops.segment_sum(
            jnp.where(packed.valid_mask(mine.shape[1], n_mine), counts_s, 0),
            seg, num_segments=mine.shape[1])
        ulanes, ucount, _ = packed.compact(mine_s, umask, mine.shape[1])
        return ulanes, ucounts.astype(jnp.int32), ucount[None]

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(None, axis), P(axis), P(axis)),
        )
    return jax.jit(sharded)


def build_boss_distributed(seqs, k: int, mesh: Mesh,
                           alphabet=None, mode: str = "basic",
                           bits_per_count: int = 0):
    """End-to-end multi-device build: distributed collection over the mesh
    (extract + all_to_all + per-shard sort-unique), then host-side shard
    concatenation in bucket order and the standard finish stage.

    Shards are contiguous colex ranges (see _owner_of), so concatenating
    shard outputs in device order yields the globally sorted set."""
    from ..kmer.alphabets import DNA, INVALID_CODE
    from ..graph.boss_construct import _bucket, build_boss_from_kmers
    alphabet = alphabet or DNA
    B = alphabet.bits_per_char
    n_dev = mesh.devices.size
    canonical = mode in ("canonical", "primary")
    tbl = alphabet.encode_table()
    # pack input into equal per-device code slabs
    total = sum(len(s) + 1 for s in seqs)
    per_dev = _bucket(-(-total // n_dev) + 64, lo=1 << 12)
    codes = np.full((n_dev, per_dev), INVALID_CODE, np.uint8)
    d, off = 0, 0
    for s in seqs:
        cs = tbl[np.frombuffer(bytes(s), np.uint8)]
        if off + len(cs) + 1 > per_dev:
            d += 1
            off = 0
            assert d < n_dev, "input exceeds per-device slabs"
        codes[d, off:off + len(cs)] = cs
        off += len(cs) + 1
    step = build_distributed_collect_step(
        mesh, k, B, codes_per_device=per_dev, canonical=canonical,
        complement=alphabet.complement)
    ulanes, ucounts, ucnts = step(jnp.asarray(codes.reshape(-1)))
    # each shard's output block is n_dev*cap wide; valid entries form the
    # prefix; blocks concatenate in colex-bucket (= device) order
    cap = per_dev - k + 1
    shard_w = n_dev * cap
    n_per = np.asarray(ucnts).reshape(-1)
    parts, cparts = [], []
    for d in range(n_dev):
        n = int(n_per[d])
        parts.append(ulanes[:, d * shard_w:d * shard_w + n])
        cparts.append(ucounts[d * shard_w:d * shard_w + n])
    real = jnp.concatenate(parts, axis=1)
    counts = jnp.concatenate(cparts)
    return build_boss_from_kmers(
        real, counts, int(real.shape[1]), k, alphabet,
        mode="canonical" if mode == "canonical" else "basic",
        bits_per_count=bits_per_count)


def build_distributed_query_step(mesh: Mesh, num_rows: int, num_cols: int,
                                 nnz_cap: int, query_cap: int,
                                 axis: str = "x"):
    """Column-sharded annotation query step (SURVEY P8): the annotation
    matrix is sharded by label column across the mesh; each device
    computes counts for its label shard with a segment-sum and results
    are all_gather'ed."""
    n_dev = mesh.devices.size
    cols_per = -(-num_cols // n_dev)

    def step(rows_sh, cols_sh, query_rows, query_weights):
        # rows_sh/cols_sh: (nnz_cap,) local shard of COO pairs (padded with
        # row = num_rows which never matches queries)
        hits = jnp.zeros((query_rows.shape[0],), jnp.int32)
        # membership: for each local pair, weight if its row is queried
        pos = jnp.searchsorted(query_rows, rows_sh)
        posc = jnp.clip(pos, 0, query_rows.shape[0] - 1)
        match = query_rows[posc] == rows_sh
        w = jnp.where(match, query_weights[posc], 0)
        local_counts = jax.ops.segment_sum(
            w, jnp.clip(cols_sh, 0, cols_per - 1),
            num_segments=cols_per)
        return local_counts  # concatenated over shards by out_specs

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        )

    @jax.jit
    def run(rows_sh, cols_sh, query_rows, query_weights):
        counts = sharded(rows_sh, cols_sh, query_rows, query_weights)
        return counts[:num_cols]

    return run


def shard_annotation_coo(rows: np.ndarray, cols: np.ndarray, num_rows: int,
                         num_cols: int, n_dev: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: repartition COO pairs by column shard and pad so shard d
    owns slice d of equal size; local column ids are shard-relative."""
    cols_per = -(-num_cols // n_dev)
    owner = cols // cols_per
    per = max(int(np.bincount(owner, minlength=n_dev).max()), 1)
    out_rows = np.full((n_dev, per), num_rows, np.int32)    # pad: no match
    out_cols = np.full((n_dev, per), 0, np.int32)
    for d in range(n_dev):
        sel = owner == d
        n = int(sel.sum())
        out_rows[d, :n] = rows[sel]
        out_cols[d, :n] = cols[sel] - d * cols_per
    return out_rows.reshape(-1), out_cols.reshape(-1)
