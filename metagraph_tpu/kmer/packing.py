"""BOSS-ordered packed k-mer batches.

Re-implements the semantics of the reference ``KMerBOSS`` packing
(metagraph/src/kmer/kmer_boss.hpp:29) on lane-major uint32 tensors
(see common/packed.py). For an edge k-mer ``e_1 .. e_K`` (source node
``e_1..e_{K-1}``, edge label ``e_K``) the character fields are laid out:

    field 0      = e_K   (edge label, least significant)
    field j      = e_j   for j in 1..K-1  (e_{K-1} most significant)

so that plain integer comparison sorts edges in BOSS order: colex by
source node, then by edge label. All derived keys used by construction:

    node_key(x)   = x >> B                       source node e_1..e_{K-1}
    target_key(x) = ((x >> 2B) << B) | label(x)  (e_2..e_{K-1}, e_K): the
                    target node of the edge — equality of target keys is
                    exactly the reference's ``compare_suffix(.,.,1) &&
                    same edge label`` test used for BOSS minus-flags and
                    dummy-source redundancy
                    (boss_chunk.cpp:95-100, boss_chunk_construct.cpp:150-160).

Everything is vectorized over the batch dimension; there is no per-k-mer
control flow anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import packed


def lanes_for(K: int, bits_per_char: int) -> int:
    return packed.num_lanes(K, bits_per_char)


def char_mask(B: int) -> np.uint32:
    return np.uint32((1 << B) - 1)


def label(x: jax.Array, B: int) -> jax.Array:
    """Edge label e_K (the BOSS W character before minus-flagging)."""
    return packed.get_field(x, 0, B)


def first_char(x: jax.Array, B: int) -> jax.Array:
    """e_1 — zero iff the edge is a dummy source edge."""
    return packed.get_field(x, 1, B)


def top_char(x: jax.Array, K: int, B: int) -> jax.Array:
    """e_{K-1}: last char of the source node; drives the BOSS F offsets."""
    return packed.get_field(x, K - 1, B)


def node_key(x: jax.Array, B: int) -> jax.Array:
    """Source-node key; order-preserving projection of the BOSS order."""
    return packed.shift_right(x, B)


def target_key(x: jax.Array, B: int) -> jax.Array:
    """(e_2..e_{K-1}, e_K) key identifying the edge's target node + label."""
    hi = packed.shift_left(packed.shift_right(x, 2 * B), B)
    lo_val = label(x, B)
    out = hi.at[-1].set(hi[-1] | lo_val)
    return out


def to_next(x: jax.Array, K: int, B: int, new_label) -> jax.Array:
    """Successor edge kmer: (e_2..e_K, new_label).

    Mirrors KMerBOSS::to_next (kmer_boss.hpp:88-97): the old edge label
    becomes the most significant node char, everything shifts down one
    field, ``new_label`` lands in field 0.
    """
    lab = label(x, B)
    # old field j+1 -> new field j for j=1..K-2; new field 0 left clear
    out = packed.shift_left(packed.shift_right(x, 2 * B), B)
    out = packed.set_field(out, K - 1, lab, B)
    if isinstance(new_label, (int, np.integer)):
        if new_label:
            out = packed.set_field(out, 0, jnp.full((x.shape[1],), new_label, jnp.uint32), B)
    else:
        out = packed.set_field(out, 0, new_label.astype(jnp.uint32), B)
    return out


def to_prev(x: jax.Array, K: int, B: int, new_first) -> jax.Array:
    """Predecessor edge kmer: (new_first, e_1..e_{K-2}) with label e_{K-1}.

    Mirrors KMerBOSS::to_prev (kmer_boss.hpp:98-105).
    """
    L = x.shape[0]
    n = x.shape[1]
    top = top_char(x, K, B)
    # fields 1..K-2 of x (e_1..e_{K-2}) move up to fields 2..K-1
    mid_mask = packed.mask_low_bits(L, (K - 1) * B)  # keep fields 0..K-2
    mid = jnp.stack([x[j] & mid_mask[j, 0] for j in range(L)])
    # clear field 0 before shifting so the old label doesn't leak into field 1
    mid = packed.set_field(mid, 0, jnp.zeros((n,), jnp.uint32), B)
    out = packed.shift_left(mid, B)
    out = packed.set_field(out, 0, top, B)
    if isinstance(new_first, (int, np.integer)):
        if new_first:
            out = packed.set_field(out, 1, jnp.full((n,), new_first, jnp.uint32), B)
    else:
        out = packed.set_field(out, 1, new_first.astype(jnp.uint32), B)
    return out


def pack_from_chars(chars: jax.Array, K: int, B: int) -> jax.Array:
    """Pack (N, K) char codes e_1..e_K into BOSS field layout -> (L, N)."""
    n = chars.shape[0]
    fields = jnp.concatenate(
        [chars[:, K - 1:K].T.astype(jnp.uint32),      # field 0 = e_K
         chars[:, :K - 1].T.astype(jnp.uint32)],      # field j = e_j
        axis=0)
    return packed.from_fields(fields, B)


def unpack_to_chars(x: jax.Array, K: int, B: int) -> jax.Array:
    """Inverse of pack_from_chars -> (N, K) uint8 codes e_1..e_K."""
    fields = packed.to_fields(x, K, B)  # (K, N)
    e_last = fields[0:1]
    e_body = fields[1:K]
    return jnp.concatenate([e_body, e_last], axis=0).T.astype(jnp.uint8)


def reverse_complement(x: jax.Array, K: int, B: int, complement: Tuple[int, ...]) -> jax.Array:
    """Per-edge reverse complement (reference: kmer_transform.hpp:16).

    rc(e)_j = comp(e_{K+1-j}). Implemented as field-wise permute + table
    lookup; K vector ops, no data-dependent control flow.
    """
    comp = jnp.asarray(np.array(complement, np.uint32))
    fields = packed.to_fields(x, K, B)  # field 0=e_K, field j=e_j
    # chars in order e_1..e_K:
    e = [fields[j] for j in range(1, K)] + [fields[0]]
    rc = [comp[e[K - 1 - j]] for j in range(K)]  # rc_1..rc_K
    new_fields = jnp.stack([rc[K - 1]] + rc[:K - 1])
    return packed.from_fields(new_fields, B, lanes=x.shape[0])


def contains_sentinel(x: jax.Array, K: int, B: int) -> jax.Array:
    """(N,) bool: any character field equals 0 — i.e. a dummy edge."""
    res = jnp.zeros((x.shape[1],), bool)
    for s in range(K):
        res = res | (packed.get_field(x, s, B) == 0)
    return res


def pack_windows(codes, K: int, B: int):
    """Pack every K-window of a code array into BOSS-layout lanes
    (field 0 = e_K, field j = e_j), accumulating per slot from
    contiguous slices — never materializing the (K, N) field stack
    (3.4 GB at 34M windows for K=20). The single shared implementation
    behind build extraction and both query-side window maps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..common import packed
    num_windows = codes.shape[0] - K + 1

    def field_slice(slot):
        off = K - 1 if slot == 0 else slot - 1
        return jax.lax.slice(codes, (off,), (off + num_windows,)) \
            .astype(packed.LANE_DTYPE)

    per_lane = packed.LANE_BITS // B
    L = packed.num_lanes(K, B)
    rows = [None] * L
    for lane_from_lsb in range(L):
        lane = L - 1 - lane_from_lsb
        acc = jnp.zeros((num_windows,), packed.LANE_DTYPE)
        for i in range(per_lane):
            slot = lane_from_lsb * per_lane + i
            if slot >= K:
                break
            acc = acc | (field_slice(slot) << np.uint32(i * B))
        rows[lane] = acc
    return jnp.stack(rows)
